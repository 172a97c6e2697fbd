package graft.operators

import scala.util.Random

import graft.SparkSuiteBase

/** R-16 property tests (the reference's untested gap, SURVEY §5.1):
  * floorJoin equals a naive per-row floor scan, and no-floor yields
  * null (the reference NPEs there, SparseMap.java:57). Randomized with
  * a fixed seed (scalatestplus isn't on the offline classpath, so no
  * ScalaCheckPropertyChecks; same coverage).
  */
case class Build(k: Int, ts: Long, payload: Long)
case class Probe(k: Int, ts: Long, id: Long)

class AsOfJoinSpec extends SparkSuiteBase {

  test("floorJoin matches naive floor semantics; no floor => null") {
    import spark.implicits._
    val rnd = new Random(42)
    (1 to 25).foreach { _ =>
      val builds = List.fill(rnd.nextInt(30))(
        Build(rnd.nextInt(4), rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
      val probes = List.fill(1 + rnd.nextInt(29))(
        Probe(rnd.nextInt(4), rnd.nextInt(50).toLong, 0))
        .zipWithIndex.map { case (p, i) => p.copy(id = i.toLong) }

      val bDf = builds.toDF()
      val pDf = probes.toDF()
      val got = AsOfJoin.floorJoin(pDf, bDf,
          keys = Seq("k"), probeTs = "ts", buildTs = "ts",
          payload = Seq("payload"))
        .select("id", "payload")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      val expected = probes.map { p =>
        val cands = builds.filter(b => b.k == p.k && b.ts <= p.ts)
        // tie rule: the greatest (ts, payload) — floorJoin resolves
        // equal-ts build rows to the greatest payload struct
        p.id -> cands.sortBy(b => (b.ts, b.payload)).lastOption.map(_.payload)
      }.toMap
      assert(got == expected, s"builds=$builds probes=$probes")
    }
  }

  test("empty build side yields all-null payloads") {
    import spark.implicits._
    val pDf = List(Probe(1, 5, 0), Probe(2, 6, 1)).toDF()
    val bDf = spark.emptyDataset[Build].toDF()
    val got = AsOfJoin.floorJoin(pDf, bDf,
        keys = Seq("k"), probeTs = "ts", buildTs = "ts", payload = Seq("payload"))
      .collect()
    assert(got.length == 2 && got.forall(_.isNullAt(got.head.fieldIndex("payload"))))
  }

  test("ceilJoin matches naive forward semantics; no ceiling => null") {
    import spark.implicits._
    val rnd = new Random(7)
    (1 to 25).foreach { _ =>
      val builds = List.fill(rnd.nextInt(30))(
        Build(rnd.nextInt(4), rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
      val probes = List.fill(1 + rnd.nextInt(29))(
        Probe(rnd.nextInt(4), rnd.nextInt(50).toLong, 0))
        .zipWithIndex.map { case (p, i) => p.copy(id = i.toLong) }
      val got = AsOfJoin.ceilJoin(probes.toDF(), builds.toDF(),
          keys = Seq("k"), probeTs = "ts", buildTs = "ts",
          payload = Seq("payload"))
        .select("id", "payload").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      val expected = probes.map { p =>
        val cands = builds.filter(b => b.k == p.k && b.ts >= p.ts)
        // nearest ceiling ts; equal-ts ties to the greatest payload
        // (same convention as the floor)
        p.id -> cands.sortBy(b => (b.ts, -b.payload)).headOption.map(_.payload)
      }.toMap
      assert(got == expected, s"builds=$builds probes=$probes")
    }
  }

  test("nearestJoin matches naive nearest semantics with floor-wins ties and tolerance") {
    import spark.implicits._
    val rnd = new Random(11)
    val tol = 7L
    (1 to 25).foreach { _ =>
      val builds = List.fill(rnd.nextInt(30))(
        Build(rnd.nextInt(4), rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
      val probes = List.fill(1 + rnd.nextInt(29))(
        Probe(rnd.nextInt(4), rnd.nextInt(50).toLong, 0))
        .zipWithIndex.map { case (p, i) => p.copy(id = i.toLong) }
      val got = AsOfJoin.nearestJoin(probes.toDF(), builds.toDF(),
          keys = Seq("k"), probeTs = "ts", buildTs = "ts",
          payload = Seq("payload"),
          distance = (a, b) => org.apache.spark.sql.functions.abs(a - b),
          tolerance = Some((a, b) =>
            org.apache.spark.sql.functions.abs(a - b) <= tol))
        .select("id", "payload").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      val expected = probes.map { p =>
        val cands = builds.filter(b => b.k == p.k && math.abs(b.ts - p.ts) <= tol)
        // rank all candidates by (distance, floor-side-first, then the
        // per-side payload convention: floor greatest, ceiling least)
        p.id -> cands.sortBy { b =>
          val floorSide = b.ts <= p.ts
          (math.abs(b.ts - p.ts), if (floorSide) 0 else 1,
            if (floorSide) -b.payload else b.payload)
        }.headOption.map(_.payload)
      }.toMap
      assert(got == expected, s"builds=$builds probes=$probes")
    }
  }

  test("null timestamps match nothing, on either side, in all three directions") {
    import spark.implicits._
    // null probe ts: `b.ts <= NULL` / `>= NULL` are never true; null
    // build ts is on neither side of any probe. Without the guards a
    // null probe under the ceiling's desc-nulls-last sort would see
    // EVERY build row and fabricate a match.
    val probes = Seq((1, Option(5L), 0L), (1, Option.empty[Long], 1L))
      .toDF("k", "ts", "id")
    val builds = Seq((1, Option(3L), 30L), (1, Option(9L), 90L),
      (1, Option.empty[Long], 666L)).toDF("k", "ts", "payload")
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.select("id", "payload").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
    val f = hits(AsOfJoin.floorJoin(probes, builds, Seq("k"), "ts", "ts", Seq("payload")))
    assert(f == Map(0L -> Some(30L), 1L -> None), s"floor: $f")
    val c = hits(AsOfJoin.ceilJoin(probes, builds, Seq("k"), "ts", "ts", Seq("payload")))
    assert(c == Map(0L -> Some(90L), 1L -> None), s"ceil: $c")
    val n = hits(AsOfJoin.nearestJoin(probes, builds, Seq("k"), "ts", "ts",
      Seq("payload"), distance = (a, b) => org.apache.spark.sql.functions.abs(a - b)))
    assert(n == Map(0L -> Some(30L), 1L -> None), s"nearest: $n")
  }

  test("all three directions plan one key shuffle, no join operator") {
    import spark.implicits._
    val pDf = List(Probe(1, 5, 0), Probe(2, 6, 1)).toDF()
    val bDf = List(Build(1, 4, 10), Build(2, 9, 20)).toDF()
    def shuffles(df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
      val n = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(n == 1, s"expected exactly one key shuffle, got $n:\n$plan")
    }
    shuffles(AsOfJoin.floorJoin(pDf, bDf, Seq("k"), "ts", "ts", Seq("payload")))
    shuffles(AsOfJoin.ceilJoin(pDf, bDf, Seq("k"), "ts", "ts", Seq("payload")))
    shuffles(AsOfJoin.nearestJoin(pDf, bDf, Seq("k"), "ts", "ts", Seq("payload"),
      distance = (a, b) => org.apache.spark.sql.functions.abs(a - b)))
  }
}
