package graft.operators

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the hypothesis-testing layer: the
  * Welch chain against a worked example, the normal-tail polynomial
  * against known Φ values, BH's step-up ordering (including the
  * suffix-min that makes adjusted p monotone), the screen's
  * complement moments, and the degenerate guards (one-row arm,
  * constant arms, all-null p).
  */
class HypothesisSpec extends SparkSuiteBase {

  test("normP2: matches known normal tail probabilities to 1e-6") {
    import spark.implicits._
    val df = Seq(0.0, 1.0, 1.96, 2.575829).toDF("z")
    val got = df.select(col("z"),
        (floor(Hypothesis.normP2(col("z")) * lit(1e6) + lit(0.5)) /
          lit(1e6)).as("p"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // 2(1-Φ): z=0 → 1, z=1 → 0.3173105, z=1.96 → 0.0499958,
    // z=2.575829 → 0.0100000 (6dp-snapped below)
    assert(math.abs(got(0.0) - 1.0) <= 1e-6)
    assert(got(1.0) == 0.317311)
    assert(got(1.96) == 0.049996)
    assert(got(2.575829) == 0.01)
  }

  test("welchTTest: hand case, equal-variance symmetric arms") {
    import spark.implicits._
    // arm0: 1, 2, 3 (micro: 1e6..3e6); arm1: 4, 5, 6
    // m_a=2 m_b=5 v=1 se2=2/3 t=3/sqrt(2/3)=3.674235 df=4
    val df = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (1L, 5L),
      (1L, 6L)).map { case (a, v) => ("g", a, v * 1000000L) }
      .toDF("grp", "arm", "xm")
    val r = Hypothesis.welchTTest(df, Seq("grp"), "arm", "xm").head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("mean_a6") == 2.0)
    assert(r.getAs[Double]("mean_b6") == 5.0)
    assert(r.getAs[Double]("diff6") == 3.0)
    assert(math.abs(r.getAs[Double]("t6") - 3.674234) <= 1e-5)
    assert(r.getAs[Double]("df6") == 4.0)
    assert(r.getAs[Boolean]("significant"))
  }

  test("welchTTest: degenerate arms read NULL t with counts intact") {
    import spark.implicits._
    // one-row arm B; and a group with both arms constant (se2 = 0)
    val df = Seq(("tiny", 0L, 1000000L), ("tiny", 0L, 2000000L),
      ("tiny", 1L, 5000000L),
      ("flat", 0L, 7000000L), ("flat", 0L, 7000000L),
      ("flat", 1L, 7000000L), ("flat", 1L, 7000000L))
      .toDF("grp", "arm", "xm")
    val out = Hypothesis.welchTTest(df, Seq("grp"), "arm", "xm")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("tiny").isNullAt(out("tiny").fieldIndex("t6")))
    assert(out("tiny").getAs[Long]("n_b") == 1L)
    assert(out("flat").isNullAt(out("flat").fieldIndex("t6")),
      "constant arms (se2=0) must read NULL")
  }

  test("welchScreen: complement moments equal a direct two-arm test") {
    import spark.implicits._
    val rows = Seq(("g", "a", 1L), ("g", "a", 2L), ("g", "a", 4L),
      ("g", "b", 5L), ("g", "b", 6L), ("g", "b", 9L),
      ("g", "c", 3L), ("g", "c", 8L))
      .map { case (g, s, v) => (g, s, v * 1000000L) }
    val df = rows.toDF("grp", "slice", "xm")
    val screen = Hypothesis.welchScreen(df, Seq("grp"), "slice", "xm")
      .filter(col("slice") === "a").head()
    // direct: arm0 = slice a, arm1 = everything else
    val direct = Hypothesis.welchTTest(
      df.withColumn("arm", when(col("slice") === "a", 0L).otherwise(1L)),
      Seq("grp"), "arm", "xm").head()
    assert(screen.getAs[Long]("n_a") == direct.getAs[Long]("n_a"))
    assert(screen.getAs[Long]("n_b") == direct.getAs[Long]("n_b"))
    assert(screen.getAs[Double]("t6") == direct.getAs[Double]("t6"))
    assert(screen.getAs[Double]("df6") == direct.getAs[Double]("df6"))
    assert(screen.getAs[Double]("p6") == direct.getAs[Double]("p6"))
  }

  test("bhFdr: textbook step-up, adjusted p monotone, nulls pass") {
    import spark.implicits._
    // classic: p = .01, .04, .03, .005 with m=4:
    // sorted .005 .01 .03 .04 → raw .02 .02 .04 .04 → suffix-min
    // adj = .02 .02 .04 .04
    val df = Seq(("h1", 0.01), ("h2", 0.04), ("h3", 0.03),
      ("h4", 0.005), ("h5", Double.NaN))
      .toDF("h", "p")
      .withColumn("p", when(col("h") === "h5",
        lit(null).cast("double")).otherwise(col("p")))
    val out = Hypothesis.bhFdr(df, Seq("h"), "p", alpha = 0.05)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("h4").getAs[Int]("rank") == 1)
    assert(out("h4").getAs[Double]("adj_p6") == 0.02)
    assert(out("h1").getAs[Double]("adj_p6") == 0.02)
    assert(out("h3").getAs[Double]("adj_p6") == 0.04)
    assert(out("h2").getAs[Double]("adj_p6") == 0.04)
    assert(Seq("h1", "h2", "h3", "h4")
      .forall(h => out(h).getAs[Boolean]("rejected")))
    assert(out("h5").isNullAt(out("h5").fieldIndex("adj_p6")))
    assert(out("h5").isNullAt(out("h5").fieldIndex("rank")))
    // adjusted p must be monotone in rank
    val byRank = Seq("h4", "h1", "h3", "h2")
      .map(h => out(h).getAs[Double]("adj_p6"))
    assert(byRank == byRank.sorted)
  }

  test("cuped: exact linear covariate, theta 2, full correction") {
    import spark.implicits._
    // y = 2x + arm: raw diff 1, covariate means equal across arms so
    // the adjusted diff is unchanged; VR = 1 - 1.5/17.5
    val units = Seq((0L, 1L, 2L), (0L, 2L, 4L), (0L, 3L, 6L),
      (1L, 1L, 3L), (1L, 2L, 5L), (1L, 3L, 7L))
      .map { case (a, x, y) => (a, x * 1000000L, y * 1000000L) }
      .toDF("arm", "x", "y")
    val r = Hypothesis.cuped(units, "arm", "x", "y").head()
    assert(r.getAs[Double]("theta6") == 2.0)
    assert(r.getAs[Double]("diff_raw6") == 1.0)
    assert(r.getAs[Double]("diff_adj6") == 1.0)
    assert(r.getAs[Double]("var_reduction6") == 0.914286)
  }

  test("cuped: covariate imbalance is corrected out") {
    import spark.implicits._
    // identical y~x relation (y = x) but arm1 units have larger x:
    // raw diff 2 is pure covariate imbalance; adjusted diff = 0
    val units = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L),
      (1L, 3L, 3L), (1L, 4L, 4L), (1L, 5L, 5L))
      .map { case (a, x, y) => (a, x * 1000000L, y * 1000000L) }
      .toDF("arm", "x", "y")
    val r = Hypothesis.cuped(units, "arm", "x", "y").head()
    assert(r.getAs[Double]("diff_raw6") == 2.0)
    assert(r.getAs[Double]("diff_adj6") == 0.0)
    assert(r.getAs[Double]("var_reduction6") == 1.0)
  }

  test("cuped: constant covariate reads NULL adjusted columns") {
    import spark.implicits._
    val units = Seq((0L, 5L, 1L), (0L, 5L, 2L), (1L, 5L, 3L),
      (1L, 5L, 4L))
      .map { case (a, x, y) => (a, x * 1000000L, y * 1000000L) }
      .toDF("arm", "x", "y")
    val r = Hypothesis.cuped(units, "arm", "x", "y").head()
    assert(r.isNullAt(r.fieldIndex("theta6")))
    assert(r.isNullAt(r.fieldIndex("diff_adj6")))
    assert(r.getAs[Double]("diff_raw6") == 2.0, "raw diff survives")
  }

  test("experimentHealth: SRM chi2/p and the 0.001 alarm") {
    import spark.implicits._
    // 60/40 split: chi2 = 4, p = 0.0455 — suspicious but NOT an alarm
    val mild = (1L to 100L).map(u =>
      (if (u <= 60) 0L else 1L, 1000000L)).toDF("arm", "y")
    val rm = Hypothesis.experimentHealth(mild, "arm", "y").head()
    assert(rm.getAs[Double]("srm_chi2_6") == 4.0)
    assert(rm.getAs[Double]("srm_p6") == 0.0455)
    assert(!rm.getAs[Boolean]("srm_flag"))
    // 200/100: chi2 = 33.33 → p rounds to 0 → alarm
    val broken = (1L to 300L).map(u =>
      (if (u <= 200) 0L else 1L, 1000000L)).toDF("arm", "y")
    val rb = Hypothesis.experimentHealth(broken, "arm", "y").head()
    assert(rb.getAs[Double]("srm_chi2_6") == 33.333333)
    assert(rb.getAs[Boolean]("srm_flag"))
  }

  test("experimentHealth: MDE from exact moments") {
    import spark.implicits._
    // y = 1..4 micro, 2v2: var 5/3, mde = 2.801585·sd
    val units = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L))
      .map { case (a, y) => (a, y * 1000000L) }.toDF("arm", "y")
    val r = Hypothesis.experimentHealth(units, "arm", "y").head()
    assert(r.getAs[Double]("sd6") == 1.290994)
    assert(r.getAs[Double]("mde_abs6") == 3.616831)
    assert(r.getAs[Double]("mde_rel6") == 1.446732)
    // constant outcome: v = 0 → MDE NULL, SRM still reported
    val const = Seq((0L, 5L), (0L, 5L), (1L, 5L), (1L, 5L))
      .map { case (a, y) => (a, y * 1000000L) }.toDF("arm", "y")
    val rc = Hypothesis.experimentHealth(const, "arm", "y").head()
    assert(rc.isNullAt(rc.fieldIndex("mde_abs6")))
    assert(rc.getAs[Double]("srm_chi2_6") == 0.0)
  }

  test("diffInDiff: hand 2x2, parallel-trends null, tiny-cell NULL") {
    import spark.implicits._
    // a: pre [1,2] post [2,3]; b: pre [1,3] post [4,6]
    // did = (5-2) - (2.5-1.5) = 2; se² = .25+.25+1+1 = 2.5
    val units = Seq((0L, 1L, 1L), (0L, 1L, 2L), (0L, 0L, 2L),
      (0L, 0L, 3L), (1L, 1L, 1L), (1L, 1L, 3L), (1L, 0L, 4L),
      (1L, 0L, 6L))
      .map { case (a, p, y) => (a, p, y * 1000000L) }
      .toDF("arm", "pre", "y")
    val r = Hypothesis.diffInDiff(units, "arm", "pre", "y").head()
    assert(r.getAs[Double]("mean_a_pre6") == 1.5)
    assert(r.getAs[Double]("mean_b_post6") == 5.0)
    assert(r.getAs[Double]("did6") == 2.0)
    assert(r.getAs[Double]("t6") == 1.264911)
    assert(r.getAs[Double]("p6") == 0.205903)
    assert(!r.getAs[Boolean]("significant"))
    // pure parallel trends: both arms shift +1 → did = 0
    val par = Seq((0L, 1L, 1L), (0L, 1L, 3L), (0L, 0L, 2L), (0L, 0L, 4L),
      (1L, 1L, 5L), (1L, 1L, 7L), (1L, 0L, 6L), (1L, 0L, 8L))
      .map { case (a, p, y) => (a, p, y * 1000000L) }
      .toDF("arm", "pre", "y")
    assert(Hypothesis.diffInDiff(par, "arm", "pre", "y").head()
      .getAs[Double]("did6") == 0.0)
    // a 1-row cell → NULL effect, means still present
    val tiny = Seq((0L, 1L, 1000000L), (0L, 0L, 2000000L),
      (0L, 0L, 3000000L), (1L, 1L, 1000000L), (1L, 1L, 2000000L),
      (1L, 0L, 4000000L), (1L, 0L, 5000000L)).toDF("arm", "pre", "y")
    val rt = Hypothesis.diffInDiff(tiny, "arm", "pre", "y").head()
    assert(rt.isNullAt(rt.fieldIndex("did6")))
    assert(rt.getAs[Double]("mean_a_pre6") == 1.0)
  }

  test("cmhTest: pooled strata hand case + OR") {
    import spark.implicits._
    // two strata, same within-stratum effect, different base rates:
    // s1 arm1 8/10 vs arm0 6/10; s2 arm1 4/10 vs arm0 2/10
    // dev = 1 each, V = 1.105263 each → χ² = 1.809524, OR = 8/3
    def stratum(k: Long, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((k, 1L, true)) ++ Seq.fill(b)((k, 1L, false)) ++
      Seq.fill(c)((k, 0L, true)) ++ Seq.fill(d)((k, 0L, false))
    val units = (stratum(1L, 8, 2, 6, 4) ++ stratum(2L, 4, 6, 2, 8))
      .toDF("wk", "arm", "conv")
    val r = Hypothesis.cmhTest(units, "wk", "arm", "conv").head()
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Long]("n_units") == 40L)
    assert(r.getAs[Double]("chi2_6") == 1.809524)
    assert(r.getAs[Double]("p6") == 0.178565)
    assert(!r.getAs[Boolean]("significant"))
    assert(r.getAs[Double]("or_mh6") == 2.666667)
  }

  test("cmhTest: Simpson structure — pooled 2x2 misleads, CMH not") {
    import spark.implicits._
    // within each stratum arm1 conversion rate EQUALS arm0's, but
    // arm1 is concentrated in the high-rate stratum: the naive
    // pooled table shows a big lift; CMH reads no association
    def stratum(k: Long, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((k, 1L, true)) ++ Seq.fill(b)((k, 1L, false)) ++
      Seq.fill(c)((k, 0L, true)) ++ Seq.fill(d)((k, 0L, false))
    val units = (stratum(1L, 16, 4, 4, 1) ++ stratum(2L, 1, 4, 4, 16))
      .toDF("wk", "arm", "conv")
    val r = Hypothesis.cmhTest(units, "wk", "arm", "conv").head()
    // per-stratum rates equal (0.8 and 0.2) → dev = 0 → χ² = 0
    assert(r.getAs[Double]("chi2_6") == 0.0)
    assert(r.getAs[Double]("or_mh6") == 1.0)
    // the naive pooled table would read 17/25 vs 8/25 — a huge lift
  }

  test("cmhTest: single-unit strata are excluded, not a crash") {
    import spark.implicits._
    val units = (Seq((9L, 1L, true)) ++ // n = 1 stratum: no V
      Seq.fill(5)((1L, 1L, true)) ++ Seq.fill(5)((1L, 1L, false)) ++
      Seq.fill(5)((1L, 0L, true)) ++ Seq.fill(5)((1L, 0L, false)))
      .toDF("wk", "arm", "conv")
    val r = Hypothesis.cmhTest(units, "wk", "arm", "conv").head()
    assert(r.getAs[Long]("n_strata") == 1L)
    assert(r.getAs[Double]("chi2_6") == 0.0, "balanced stratum: dev 0")
  }

  test("bhFdr: m excludes NULL p rows") {
    import spark.implicits._
    val df = Seq(("a", Some(0.04)), ("b", None), ("c", None))
      .toDF("h", "p")
    val row = Hypothesis.bhFdr(df, Seq("h"), "p")
      .filter(col("h") === "a").head()
    // m=1 → adj = 0.04·1/1, rejected at 0.05
    assert(row.getAs[Double]("adj_p6") == 0.04)
    assert(row.getAs[Boolean]("rejected"))
  }

  test("chisqUniformGof: uniform accepts, point-mass rejects, zero-fill") {
    import spark.implicits._
    // "flat": exactly 10 per cell over 7 cells → chisq 0, p ~ 1;
    // "spike": all 70 rows on cell 0 — the other 6 cells zero-fill
    val rows = (0L until 7L).flatMap(c =>
      Seq.fill(10)(("flat", c))) ++ Seq.fill(70)(("spike", 0L))
    val got = Hypothesis.chisqUniformGof(rows.toDF("k", "c"), "k", "c",
        nCells = 7)
      .orderBy("k").collect()
    val flat = got(0)
    assert(flat.getAs[Long]("n") == 70L &&
      flat.getAs[Double]("chisq6") == 0.0)
    assert(flat.getAs[Double]("p6") > 0.99 &&
      !flat.getAs[Boolean]("significant"))
    val spike = got(1)
    // chisq = sum over cells: (7*70-70)^2/(7*70) + 6*(0-70)... via
    // the integer identity: ((420)^2 + 6*70^2)/490 = 420
    assert(spike.getAs[Double]("chisq6") == 420.0)
    assert(spike.getAs[Double]("p6") < 0.001 &&
      spike.getAs[Boolean]("significant"))
  }
}
