package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** Latest-wins must equal the window formulation while PLANNING as a
  * combinable aggregate; SCD2 must collapse runs, chain intervals,
  * and spend exactly one key shuffle.
  */
class CdcSpec extends SparkSuiteBase {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val log = Seq(
    // user 1: three states, the last two at the SAME ts (event_id ties)
    (1L, ts("2024-01-01 10:00:00"), "a", 1L, 10.0),
    (1L, ts("2024-01-01 11:00:00"), "b", 2L, 20.0),
    (1L, ts("2024-01-01 11:00:00"), "c", 3L, 30.0),
    // user 2: consecutive duplicates collapse in scd2
    (2L, ts("2024-01-01 09:00:00"), "a", 4L, 1.0),
    (2L, ts("2024-01-01 09:30:00"), "a", 5L, 2.0),
    (2L, ts("2024-01-01 10:30:00"), "b", 6L, 3.0),
    (2L, ts("2024-01-01 11:30:00"), "a", 7L, 4.0),
    // user 3: single event
    (3L, ts("2024-01-01 08:00:00"), "z", 8L, 9.0)
  ).toDF("user_id", "ts", "event_type", "event_id", "value")

  test("latestWins: greatest (ts, event_id) payload per key") {
    val out = Cdc.latestWins(log, Seq("user_id"), Seq("ts", "event_id"),
        Seq("event_type", "value"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(3), r.getDouble(4))).toMap
    assert(out === Map(1L -> ("c", 30.0), 2L -> ("a", 4.0),
      3L -> ("z", 9.0)))
  }

  test("latestWins equals the row_number window formulation") {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val windowed = log.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("user_id", "ts", "event_id", "event_type", "value")
    val agg = Cdc.latestWins(log, Seq("user_id"), Seq("ts", "event_id"),
      Seq("event_type", "value"))
    assert(agg.collect().toSet === windowed.collect().toSet)
  }

  test("latestWins plans as an aggregate: no Window, map-side combine") {
    val plan = Cdc.latestWins(log, Seq("user_id"), Seq("ts", "event_id"),
      Seq("event_type", "value")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "latest-wins must not shuffle the full log through a window")
    assert(plan.contains("partial_max") || plan.contains("partial max"),
      s"expected a partial aggregate (map-side combine), got:\n$plan")
  }

  test("scd2: run collapse, interval chain, versions, current row") {
    val out = Cdc.scd2(log, Seq("user_id"), Seq("event_type"), "ts",
        Seq("event_id"))
      .select(col("user_id"), col("ver"), col("event_type"),
        unix_millis(col("valid_from")).as("f"),
        unix_millis(col("valid_to")).as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toSet
    def ms(s: String) = ts(s).getTime
    assert(out === Set(
      (1L, 1, "a", ms("2024-01-01 10:00:00"), ms("2024-01-01 11:00:00")),
      (1L, 2, "b", ms("2024-01-01 11:00:00"), ms("2024-01-01 11:00:00")),
      (1L, 3, "c", ms("2024-01-01 11:00:00"), -1L),
      // user 2: the 09:30 duplicate "a" collapsed into version 1
      (2L, 1, "a", ms("2024-01-01 09:00:00"), ms("2024-01-01 10:30:00")),
      (2L, 2, "b", ms("2024-01-01 10:30:00"), ms("2024-01-01 11:30:00")),
      // the RETURN to "a" is a new version, not a merge
      (2L, 3, "a", ms("2024-01-01 11:30:00"), -1L),
      (3L, 1, "z", ms("2024-01-01 08:00:00"), -1L)))
  }

  test("scd2: null-safe attribute compare") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option.empty[String], 1L),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[String], 2L), // same run
      (1L, ts("2024-01-01 12:00:00"), Option("a"), 3L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Cdc.scd2(df, Seq("user_id"), Seq("event_type"), "ts",
      Seq("event_id"))
    assert(out.count() === 2, "null == null must collapse")
  }

  test("point-in-time lookup honors boundaries, pre-history, zero-width intervals") {
    val dim = Cdc.scd2(log, Seq("user_id"), Seq("event_type"), "ts",
      Seq("event_id"))
    // facts: before any history, exactly AT a version start, between
    // versions, and at user 1's zero-width 11:00 boundary (versions
    // b and c both start at 11:00; ver 3 = "c" must win)
    val facts = Seq(
      (100L, 1L, ts("2024-01-01 09:00:00")), // pre-history -> null
      (101L, 1L, ts("2024-01-01 10:00:00")), // at v1 start -> a
      (102L, 1L, ts("2024-01-01 10:30:00")), // inside v1 -> a
      (103L, 1L, ts("2024-01-01 11:00:00")), // zero-width tie -> c (v3)
      (104L, 2L, ts("2024-01-01 11:00:00"))  // inside user2 v2 -> b
    ).toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.floorJoin(facts, dim, Seq("user_id"), "ts",
        "valid_from", Seq("ver", "event_type"))
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(3)).map(_.asInstanceOf[Int]),
          Option(r.getString(4)))).toMap
    assert(got(100L) === ((None, None)))
    assert(got(101L) === ((Some(1), Some("a"))))
    assert(got(102L) === ((Some(1), Some("a"))))
    assert(got(103L) === ((Some(3), Some("c"))))
    assert(got(104L) === ((Some(2), Some("b"))))
  }

  test("goldenRecord: per-field latest non-null, sparse updates don't clobber") {
    val recs = Seq(
      // user 1: newest record has email but NULL phone — phone must
      // survive from the older record; oldest has both
      (1L, ts("2024-01-01 10:00:00"), 1L, Some("a@x"), Some("111")),
      (1L, ts("2024-01-01 11:00:00"), 2L, Option.empty[String], Some("222")),
      (1L, ts("2024-01-01 12:00:00"), 3L, Some("c@x"), Option.empty[String]),
      // user 2: field never present
      (2L, ts("2024-01-01 09:00:00"), 4L, Some("z@x"), Option.empty[String])
    ).toDF("user_id", "ts", "event_id", "email", "phone")
    val out = Cdc.goldenRecord(recs, Seq("user_id"),
        Seq("ts", "event_id"), Seq("email", "phone"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.getString(2)), Option(r.getString(3))))
      .toMap
    assert(out(1L) === ((3L, Some("c@x"), Some("222"))))
    assert(out(2L) === ((1L, Some("z@x"), None)))
  }

  test("goldenRecord plans as one combinable aggregate, no windows") {
    val plan = Cdc.goldenRecord(log, Seq("user_id"), Seq("ts", "event_id"),
      Seq("event_type", "value")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(plan.contains("partial_max") || plan.contains("Partial"),
      s"expected map-side combine:\n$plan")
  }

  test("scd2 spends exactly one exchange (both windows co-partitioned)") {
    val plan = Cdc.scd2(log, Seq("user_id"), Seq("event_type"), "ts",
      Seq("event_id")).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }

  test("snapshot diff: added/removed/changed classified null-safely per column") {
    val a = Seq(
      (1L, Some("a"), Some(1.0)),  // unchanged
      (2L, Some("b"), Some(2.0)),  // status changes
      (3L, None: Option[String], Some(3.0)), // NULL -> value: changed
      (4L, Some("d"), None: Option[Double]), // NULL==NULL price: unchanged
      (5L, Some("e"), Some(5.0)))  // removed
      .toDF("k", "status", "price")
    val b = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("B"), Some(2.0)),
      (3L, Some("c"), Some(3.0)),
      (4L, Some("d"), None: Option[Double]),
      (6L, Some("f"), Some(6.0)))  // added
      .toDF("k", "status", "price")
    val got = Cdc.snapshotDiff(a, b, Seq("k"), Seq("status", "price"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "added" -> 1L, "removed" -> 1L, "changed" -> 2L, "unchanged" -> 2L,
      "changed:status" -> 2L, "changed:price" -> 0L))
    // identical snapshots: everything unchanged, zero drift
    val same = Cdc.snapshotDiff(a, a, Seq("k"), Seq("status", "price"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(same("unchanged") === 5L && same("added") === 0L
      && same("removed") === 0L && same("changed") === 0L)
  }
}
