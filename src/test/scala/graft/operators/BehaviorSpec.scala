package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** Funnel chains must honor greedy earliest-next matching with
  * per-step windows; cohorts must bucket by exact integer weeks;
  * triangle stats must count planted structures exactly.
  */
class BehaviorSpec extends SparkSuiteBase {

  import spark.implicits._

  private def ev(u: Long, t: String, typ: String, id: Long) =
    (id, Timestamp.valueOf(t), u, typ)

  test("funnel levels: full chain, window-broken chain, missing stage") {
    val events = Seq(
      // user 1: full view->click->purchase inside the windows
      ev(1, "2024-01-01 10:00:00", "view", 1),
      ev(1, "2024-01-01 12:00:00", "click", 2),
      ev(1, "2024-01-02 09:00:00", "purchase", 3),
      // user 2: click arrives 25h after the view — level stays 1
      ev(2, "2024-01-01 10:00:00", "view", 10),
      ev(2, "2024-01-02 11:30:00", "click", 11),
      // user 3: view+click but no purchase — level 2
      ev(3, "2024-01-01 10:00:00", "view", 20),
      ev(3, "2024-01-01 11:00:00", "click", 21),
      // user 4: purchase BEFORE any view — the order matters, level 1
      ev(4, "2024-01-01 08:00:00", "purchase", 30),
      ev(4, "2024-01-01 10:00:00", "view", 31),
      // user 5: no view at all — absent from the histogram
      ev(5, "2024-01-01 10:00:00", "click", 40)
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Behavior.eventFunnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowMs = 86400000L)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 2L, 2 -> 1L, 3 -> 1L), s"got $out")
  }

  test("funnel is greedy: the EARLIEST next-stage event anchors the next window") {
    // click A at +1h (greedy match), purchase at +26h from view but
    // +25h from click A — outside click A's 24h window even though a
    // later click B (+3h) would have reached it. Greedy semantics:
    // level 2.
    val events = Seq(
      ev(1, "2024-01-01 00:00:00", "view", 1),
      ev(1, "2024-01-01 01:00:00", "click", 2),
      ev(1, "2024-01-01 03:00:00", "click", 3),
      ev(1, "2024-01-02 02:00:00", "purchase", 4)
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Behavior.eventFunnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowMs = 86400000L)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(2 -> 1L), s"greedy anchor must cap at level 2: $out")
  }

  test("cohort retention buckets by exact integer weeks from first sight") {
    val events = Seq(
      ev(1, "2024-01-01 10:00:00", "view", 1), // cohort day 19723
      ev(1, "2024-01-05 10:00:00", "view", 2), // offset 0 (day 4)
      ev(1, "2024-01-09 10:00:00", "view", 3), // offset 1 (day 8)
      ev(2, "2024-01-03 10:00:00", "view", 10), // own cohort
      ev(2, "2024-01-24 10:00:00", "view", 11) // offset 3 (day 21)
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Behavior.cohortRetention(events, "user_id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val c1 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 86400000L
    val c2 = Timestamp.valueOf("2024-01-03 10:00:00").getTime / 86400000L
    assert(out == Map((c1, 0L) -> 1L, (c1, 1L) -> 1L,
      (c2, 0L) -> 1L, (c2, 3L) -> 1L), s"got $out")
  }

  test("triangle stats count a planted clique and wedge exactly") {
    // K4 on {1,2,3,4} has 4 triangles and 12 wedges (4 nodes of
    // degree 3: 4 * C(3,2)); a pendant node 5 on node 1 adds wedges
    // (deg(1)=4 -> C(4,2)=6) but no triangle
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val pairs = (k4 :+ ((1L, 5L))).toDF("id_a", "id_b")
    val r = GraphOps.triangleStats(pairs, "id_a", "id_b").collect()(0)
    assert(r.getLong(0) == 4, s"triangles: ${r.getLong(0)}")
    // degrees: 1->4, 2->3, 3->3, 4->3, 5->1 => 6+3+3+3+0 = 15 wedges
    assert(r.getLong(1) == 15, s"wedges: ${r.getLong(1)}")
    assert(r.getDouble(2) == math.floor(3.0 * 4 / 15 * 1e6 + 0.5) / 1e6)
    // orientation/dedup hardening: reversed + duplicate + self edges
    // change nothing
    val messy = pairs
      .unionAll(Seq((2L, 1L), (1L, 2L), (3L, 3L)).toDF("id_a", "id_b"))
    val r2 = GraphOps.triangleStats(messy, "id_a", "id_b").collect()(0)
    assert(r2.getLong(0) == 4 && r2.getLong(1) == 15)
  }

  test("sessionize: gap splits, counter, bounds, single-event session") {
    val events = Seq(
      // user 1: 3 events tight, then a 2h gap, then 2 events
      ev(1, "2024-01-01 10:00:00", "a", 1),
      ev(1, "2024-01-01 10:10:00", "b", 2),
      ev(1, "2024-01-01 10:20:00", "c", 3),
      ev(1, "2024-01-01 12:30:00", "d", 4),
      ev(1, "2024-01-01 12:40:00", "e", 5),
      // user 2: one lone event
      ev(2, "2024-01-01 09:00:00", "z", 6)
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Behavior.sessionize(events, "user_id", "ts", "event_id",
        gapMs = 3600000L) // 1h gap
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
      .toSet
    assert(got === Set(
      (1L, 1L, 3L, 1200000L), // 10:00-10:20 = 20 min
      (1L, 2L, 2L, 600000L),  // 12:30-12:40 = 10 min
      (2L, 1L, 1L, 0L)))
  }

  test("sessionize: an exact-gap boundary does NOT split (strict >)") {
    val events = Seq(
      ev(1, "2024-01-01 10:00:00", "a", 1),
      ev(1, "2024-01-01 11:00:00", "b", 2) // exactly 1h later
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Behavior.sessionize(events, "user_id", "ts", "event_id",
      gapMs = 3600000L).collect()
    assert(got.length === 1 && got(0).getLong(2) === 2L)
  }

  test("sessionize spends exactly one exchange") {
    val events = Seq(ev(1, "2024-01-01 10:00:00", "a", 1))
      .toDF("event_id", "ts", "user_id", "event_type")
    val plan = Behavior.sessionize(events, "user_id", "ts", "event_id",
      3600000L).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"lag, running sum, and session agg must share one shuffle:\n$plan")
  }

  test("sliding distinct: planted span, window membership, HLL merge law") {
    def at(day: Long, u: Long, id: Long) =
      (id, new Timestamp(day * 86400000L + 3600000L), u, "x")
    val events = Seq(
      at(0, 1, 1), at(0, 2, 2), at(3, 2, 3), at(3, 3, 4), at(10, 9, 5)
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Behavior.slidingDistinct(events, "user_id", "ts", 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 3L,
      5L -> 3L, 6L -> 3L, 7L -> 2L, 8L -> 2L, 9L -> 2L, 10L -> 1L)
    assert(got === expect)
    // HLL constant-state path: per-day register tables max-merged over
    // a window == the register table of the union set (the merge law
    // that makes the sketch the scale substitute)
    import spark.implicits._
    val day0 = Seq("u1", "u2").toDF("k")
    val day3 = Seq("u2", "u3").toDF("k")
    val m = 256
    val merged = Sketches.hllRegisters(day0, "k", m)
      .unionAll(Sketches.hllRegisters(day3, "k", m))
      .groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val direct = Sketches.hllRegisters(day0.unionAll(day3), "k", m)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(merged === direct)
  }

  test("markov transitions: planted chain counts and row-normalized probabilities") {
    val events = Seq(
      // user 1: a -> b -> a -> c ; user 2: a -> b
      ev(1, "2024-01-01 10:00:00", "a", 1),
      ev(1, "2024-01-01 10:01:00", "b", 2),
      ev(1, "2024-01-01 10:02:00", "a", 3),
      ev(1, "2024-01-01 10:03:00", "c", 4),
      ev(2, "2024-01-01 09:00:00", "a", 5),
      ev(2, "2024-01-01 09:30:00", "b", 6)
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Behavior.markovTransitions(events, "user_id", "ts",
        "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // from a: a->b twice, a->c once; from b: b->a once (user 2's b is
    // terminal — no cross-user transition)
    assert(got === Map(
      ("a", "b") -> ((2L, r6(2.0 / 3.0))),
      ("a", "c") -> ((1L, r6(1.0 / 3.0))),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("basket rules: support/confidence/lift hand-checked; baskets are distinct types") {
    def ev(id: Long, u: Long, sec: Long, t: String) =
      (u, new Timestamp(1700000000000L + sec * 1000L), id, t)
    // 4 sessions (2 users x 31-min gap):
    //   u1 s1: {a, b}   u1 s2: {a, b}   u2 s1: {a, a, c}   u2 s2: {b}
    // n_a=3, n_b=3, n_ab=2; a->b: conf 2/3, lift 2*4/(3*3)
    val events = Seq(
      ev(1, 1L, 0, "a"), ev(2, 1L, 10, "b"),
      ev(3, 1L, 10 + 1900, "a"), ev(4, 1L, 20 + 1900, "b"),
      ev(5, 2L, 0, "a"), ev(6, 2L, 5, "a"), ev(7, 2L, 10, "c"),
      ev(8, 2L, 10 + 1900, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.basketRules(events, "user_id", "ts", "event_id",
        "event_type", gapMs = 1800000L, minSessions = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    def p6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got(("a", "b")) === ((2L, 0.5, p6(2.0 / 3.0), p6(8.0 / 9.0))))
    assert(got(("b", "a")) === ((2L, 0.5, p6(2.0 / 3.0), p6(8.0 / 9.0))))
    // duplicate 'a' events in u2 s1 count ONCE (basket = distinct set)
    assert(got(("a", "c"))._1 === 1L)
    // lift > 1 requires beating independence: a,c co-occur in 1 of 4
    // sessions, independence predicts 3/4 * 1/4 -> lift = 4/3
    assert(got(("a", "c"))._4 === p6(4.0 / 3.0))
    // the minSessions floor prunes
    val pruned = Behavior.basketRules(events, "user_id", "ts", "event_id",
      "event_type", 1800000L, minSessions = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned === Set(("a", "b"), ("b", "a")))
  }

  test("session paths: gaps break paths; counts and ranks hand-checked") {
    def ev(id: Long, u: Long, sec: Long, t: String) =
      (u, new Timestamp(1700000000000L + sec * 1000L), id, t)
    // user 1: a b c [31-min gap] a b c  -> a>b>c twice, b c a NEVER
    //   (the gap kills the cross-session trigrams b>c>a and c>a>b)
    // user 2: a b c d -> a>b>c, b>c>d
    val events = Seq(
      ev(1, 1L, 0, "a"), ev(2, 1L, 10, "b"), ev(3, 1L, 20, "c"),
      ev(4, 1L, 20 + 1900, "a"), ev(5, 1L, 20 + 1910, "b"),
      ev(6, 1L, 20 + 1920, "c"),
      ev(7, 2L, 0, "a"), ev(8, 2L, 5, "b"), ev(9, 2L, 10, "c"),
      ev(10, 2L, 15, "d"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.sessionPaths(events, "user_id", "ts", "event_id",
        "event_type", gapMs = 1800000L, n = 3, topK = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1, "a>b>c", 3L), (2, "b>c>d", 1L)),
      s"got ${got.toSeq}")
    // one key exchange carries sessions AND leads (plus the final
    // vocabulary-sized rank): never a per-(key, sess) re-shuffle
    val p = Behavior.sessionPaths(events, "user_id", "ts", "event_id",
        "event_type", 1800000L, 3, 10)
      .queryExecution.executedPlan.toString
    val keyExchanges = "hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(keyExchanges <= 1, s"expected one key exchange:\n$p")
  }

  test("abTest: hand-computed pooled z on unit-grain conversion") {
    import spark.implicits._
    // variant 0: 4 users, 2 convert; variant 1: 4 users, 3 convert.
    // One converting user has 3 rows (only one converting) — unit
    // grain must count it once.
    val rows = Seq(
      (1L, 0L, true), (1L, 0L, false), (1L, 0L, false),
      (2L, 0L, true), (3L, 0L, false), (4L, 0L, false),
      (5L, 1L, true), (6L, 1L, true), (7L, 1L, true), (8L, 1L, false))
      .toDF("u", "v", "c")
    val r = Behavior.abTest(rows, "u", "v", "c").head()
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("conv_a") == 2L)
    assert(r.getAs[Long]("n_b") == 4L && r.getAs[Long]("conv_b") == 3L)
    assert(r.getAs[Double]("rate_a6") == 0.5)
    assert(r.getAs[Double]("rate_b6") == 0.75)
    assert(r.getAs[Double]("lift6") == 0.25)
    // p̂ = 5/8; se² = .625·.375·.5; z = .25/sqrt(se²) = 0.730296...
    assert(r.getAs[Double]("z6") == 0.730297)
    assert(r.getAs[Double]("chi2_6") == 0.533333)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("abTest: degenerate variance reads NULL, bad splits refuse") {
    import spark.implicits._
    // everyone converts → pooled variance 0 → z/χ²/significant NULL
    val all = Seq((1L, 0L, true), (2L, 1L, true)).toDF("u", "v", "c")
    val r = Behavior.abTest(all, "u", "v", "c").head()
    assert(r.isNullAt(r.fieldIndex("z6")))
    assert(r.isNullAt(r.fieldIndex("significant")))
    // a unit under both variants is a broken assignment
    val mixed = Seq((1L, 0L, true), (1L, 1L, false), (2L, 1L, false))
      .toDF("u", "v", "c")
    val e1 = intercept[IllegalArgumentException] {
      Behavior.abTest(mixed, "u", "v", "c")
    }
    assert(e1.getMessage.contains("BOTH variants"))
    // three variants is not an A/B test
    val three = Seq((1L, 0L, true), (2L, 1L, false), (3L, 2L, false))
      .toDF("u", "v", "c")
    val e2 = intercept[IllegalArgumentException] {
      Behavior.abTest(three, "u", "v", "c")
    }
    assert(e2.getMessage.contains("exactly 2 variants"))
  }

  test("lastTouchAttribution: latest in-window touch wins, ties take max campaign") {
    import spark.implicits._
    val conv = Seq(
      (1L, 150L, 2500000L), // after the tied touches → campaign 7
      (1L, 50L, 3000000L),  // before any touch → unattributed
      (2L, 1000L, 500000L), // touch at 0 expired (window 500)
      (2L, 400L, 1000000L), // touch at 0 inside window
      (3L, 500L, 700000L))  // touch exactly window old: 0 >= 500-500
      .toDF("u", "cts", "rev")
    val touch = Seq(
      (1L, 100L, 3L), (1L, 100L, 7L), // same-ms tie → greatest campaign
      (2L, 0L, 1L), (3L, 0L, 4L))
      .toDF("u", "tts", "campaign")
    val got = Behavior.lastTouchAttribution(conv, touch, "u",
        "cts", "tts", "rev", "campaign", windowMs = 500L)
      .orderBy(col("campaign"))
      .collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      (-1L, 2L, 3.5), // no-touch + expired purchases, summed exactly
      (1L, 1L, 1.0), (4L, 1L, 0.7), (7L, 1L, 2.5)), s"got ${got.toSeq}")
  }

  test("kaplanMeier: hand-computed curve with censoring") {
    import spark.implicits._
    val day = 86400000L
    // u1,u2 die day 2; u3 starts day 5, no death → censored day 5
    // (horizon 10); u4 dies day 7; u5 censored day 10.
    // S(2) = 3/5, S(7) = 3/5 · 1/2 = 0.3; at-risk 5 → 3 → 2 → 1
    val starts = Seq((1L, 0L), (2L, 0L), (3L, 5 * day), (4L, 0L),
      (5L, 0L)).toDF("u", "s0")
    val deaths = Seq((1L, 2 * day), (2L, 2 * day), (4L, 7 * day))
      .toDF("u", "e0")
    val got = Behavior.kaplanMeier(starts, deaths, "u", "s0", "e0",
        horizonMs = 10 * day)
      .orderBy(col("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq === Seq(
      (2L, 5L, 2L, 0L, 0.6),
      (7L, 2L, 1L, 0L, 0.3)), s"got ${got.toSeq}")
  }

  test("kaplanMeier: extinction day reads exact 0, pre-start deaths ignored") {
    import spark.implicits._
    val day = 86400000L
    // a death BEFORE the subject's start must not count (u2's stray
    // early event); both subjects then die on day 1 → d = n → S = 0
    val starts = Seq((1L, 0L), (2L, 0L)).toDF("u", "s0")
    val deaths = Seq((1L, 1 * day), (2L, -3 * day), (2L, 1 * day))
      .toDF("u", "e0")
    val got = Behavior.kaplanMeier(starts, deaths, "u", "s0", "e0",
        horizonMs = 5 * day)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(4)))
    assert(got.toSeq === Seq((1L, 2L, 2L, 0.0)), s"got ${got.toSeq}")
  }

  test("rfmScores: quartile grid hand-checked, monetary tie by key") {
    import spark.implicits._
    val day = 86400000L
    val p = (Seq.fill(4)((1L, 1 * day, 1000000L)) ++
      Seq((2L, 9 * day, 10000000L)) ++
      Seq.fill(2)((3L, 5 * day, 2000000L)) ++
      Seq.fill(3)((4L, 8 * day, 500000L)))
      .toDF("u", "t", "rev")
    val got = Behavior.rfmScores(p, "u", "t", "rev", horizonMs = 10 * day)
      .orderBy(col("u")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // u1/u3 tie at monetary 4.0 — broken by key, u1 takes the lower
    // quartile slot
    assert(got.toSeq === Seq(
      (1L, 9L, 4L, 4.0, 1L, 4L, 2L, 142L),
      (2L, 1L, 1L, 10.0, 4L, 1L, 4L, 414L),
      (3L, 5L, 2L, 4.0, 2L, 2L, 3L, 223L),
      (4L, 2L, 3L, 1.5, 3L, 3L, 1L, 331L)), s"got ${got.toSeq}")
  }

  test("ltvCurve: cumulative per-cohort revenue, zero-revenue activity counts") {
    import spark.implicits._
    val day = 86400000L
    val ev = Seq(
      (1L, 0 * day, 0L),        // u1 enters cohort day 0
      (1L, 3 * day, 2000000L),  // u1 buys 2.0 in week 0
      (1L, 10 * day, 1000000L), // u1 buys 1.0 in week 1
      (2L, 0 * day, 0L),        // u2 same cohort, never buys
      (2L, 8 * day, 0L),        //   ...but is active in week 1
      (3L, 7 * day, 5000000L))  // u3: own cohort (day 7), buys 5.0
      .toDF("u", "tms", "rev")
    val got = Behavior.ltvCurve(ev, "u", "tms", "rev")
      .orderBy(col("cohort_epoch_day"), col("week_offset")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq === Seq(
      (0L, 0L, 2L, 2L, 2.0, 2.0, 1.0),
      (0L, 1L, 2L, 2L, 1.0, 3.0, 1.5),
      (7L, 0L, 1L, 1L, 5.0, 5.0, 5.0)), s"got ${got.toSeq}")
  }

  test("mergeIntervals: overlap, touch, gap, containment, per-key") {
    import spark.implicits._
    val rows = Seq(
      // user 1: [0,10) ∪ [5,15) overlap, [15,20) touches → one island;
      // [30,40) gapped → second island
      (1L, 0L, 10L), (1L, 5L, 15L), (1L, 15L, 20L), (1L, 30L, 40L),
      // user 2: containment [0,100) ⊇ [10,20) → one island of 2
      (2L, 0L, 100L), (2L, 10L, 20L))
      .toDF("u", "s", "e")
    val got = Behavior.mergeIntervals(rows, "u", "s", "e")
      .orderBy("u", "start_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 20L, 3L), (1L, 30L, 40L, 1L), (2L, 0L, 100L, 2L)),
      s"got ${got.toSeq}")
  }

  test("mergeIntervals: duplicate intervals and determinism") {
    import spark.implicits._
    val rows = Seq((1L, 0L, 5L), (1L, 0L, 5L), (1L, 5L, 9L))
      .toDF("u", "s", "e")
    val a = Behavior.mergeIntervals(rows, "u", "s", "e").collect()
    assert(a.length == 1 && a(0).getLong(3) == 3L)
    val b = Behavior.mergeIntervals(rows.repartition(7), "u", "s", "e")
      .collect()
    assert(a.toSeq == b.toSeq)
  }
}
