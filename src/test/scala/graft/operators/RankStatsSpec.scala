package graft.operators

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the rank-statistics family: the AUC
  * tie correction, Spearman average-rank ties, the Gini sorted-rank
  * identity, and the Zipf OLS on an exact power law — plus the
  * degenerate inputs (one-class AUC, constant column, K > vocab).
  */
class RankStatsSpec extends SparkSuiteBase {

  test("rocAuc: tie-corrected hand case") {
    import spark.implicits._
    // ranks asc: 1, {2,3}→2.5 tied, 4; R1 = 2.5 + 4 → AUC = 0.875
    val df = Seq((1.0, false), (2.0, false), (2.0, true), (3.0, true))
      .toDF("s", "y")
    val r = RankStats.rocAuc(df, "s", "y").head()
    assert(r.getAs[Long]("n_pos") == 2L)
    assert(r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("u2") == 7L) // 2*U1 = 2*3.5
    assert(r.getAs[Double]("auc6") == 0.875)
  }

  test("rocAuc: perfect separation and one-class null") {
    import spark.implicits._
    val perfect = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("s", "y")
    assert(RankStats.rocAuc(perfect, "s", "y").head()
      .getAs[Double]("auc6") == 1.0)
    val oneClass = Seq((1.0, true), (2.0, true)).toDF("s", "y")
    val r = RankStats.rocAuc(oneClass, "s", "y").head()
    assert(r.getAs[Long]("n_neg") == 0L)
    assert(r.isNullAt(r.fieldIndex("auc6")), "one-class AUC must be NULL")
  }

  test("prCurve: hand thresholds, tie at one score, exact AP micro sum") {
    import spark.implicits._
    // desc thresholds: s=3 → tp=1 pp=1; s=2 → tp=2 pp=3; s=1 → tp=2 pp=4
    // AP = 1/2·1 + 1/2·(2/3) + 0 = 0.5 + 0.333333(floored micro) = 0.833333
    val df = Seq((3.0, true), (2.0, false), (2.0, true), (1.0, false))
      .toDF("s", "y")
    val rows = RankStats.prCurve(df, "s", "y")
      .orderBy(desc("score")).collect()
    assert(rows.length == 3)
    val at3 = rows(0)
    assert(at3.getAs[Double]("score") == 3.0 &&
      at3.getAs[Long]("tp") == 1L && at3.getAs[Long]("fp") == 0L &&
      at3.getAs[Double]("prec6") == 1.0 && at3.getAs[Double]("rec6") == 0.5)
    val at2 = rows(1)
    assert(at2.getAs[Long]("tp") == 2L && at2.getAs[Long]("fp") == 1L &&
      at2.getAs[Double]("prec6") == 0.666667 &&
      at2.getAs[Double]("rec6") == 1.0)
    val at1 = rows(2)
    assert(at1.getAs[Long]("tp") == 2L && at1.getAs[Long]("fp") == 2L &&
      at1.getAs[Double]("prec6") == 0.5)
    // ap6 constant across rows, exactly the micro sum
    assert(rows.map(_.getAs[Double]("ap6")).distinct.toSeq == Seq(0.833333))
  }

  test("prCurve: perfect scorer AP=1, no-positive input NULLs, grid") {
    import spark.implicits._
    val perfect = Seq((4.0, true), (3.0, true), (2.0, false), (1.0, false))
      .toDF("s", "y")
    val pr = RankStats.prCurve(perfect, "s", "y").collect()
    assert(pr.map(_.getAs[Double]("ap6")).distinct.toSeq == Seq(1.0))
    // every rounded value sits on the 1e-6 grid
    pr.flatMap(r => Seq(r.getAs[Double]("prec6"), r.getAs[Double]("rec6")))
      .foreach(v => assert(v == math.floor(v * 1e6 + 0.5) / 1e6))
    val negOnly = Seq((1.0, false), (2.0, false)).toDF("s", "y")
    val r = RankStats.prCurve(negOnly, "s", "y").orderBy("score").head()
    assert(r.getAs[Long]("tp") == 0L)
    assert(r.isNullAt(r.fieldIndex("rec6")), "no-positive recall is NULL")
    assert(r.isNullAt(r.fieldIndex("ap6")), "no-positive AP is NULL")
  }

  test("paretoAbc: textbook shares, exact boundary stays in class") {
    import spark.implicits._
    // values 50/30/15/5 → inclusive shares .5 (A), .8 (A — boundary
    // is integer-exact, no float can push it to B), .95 (B), 1.0 (C)
    val items = Seq((1L, 50000000L), (2L, 30000000L), (3L, 15000000L),
      (4L, 5000000L)).toDF("id", "m")
    val got = RankStats.paretoAbc(items, "id", "m")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getAs[Double]("cum_share6"),
        r.getAs[String]("abc_class")))
    assert(got.toSeq == Seq((1L, 0.5, "A"), (2L, 0.8, "A"),
      (3L, 0.95, "B"), (4L, 1.0, "C")), s"got ${got.toSeq}")
  }

  test("paretoAbc: ties rank by id, zero total reads NULLs") {
    import spark.implicits._
    val tied = Seq((7L, 40000000L), (3L, 40000000L), (9L, 20000000L))
      .toDF("id", "m")
    val got = RankStats.paretoAbc(tied, "id", "m")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getAs[Double]("cum_share6")))
      .toSeq
    // id 3 ranks before id 7 under (value DESC, id ASC)
    assert(got == Seq((3L, 0.4), (7L, 0.8), (9L, 1.0)), s"got $got")
    val zeros = Seq((1L, 0L), (2L, 0L)).toDF("id", "m")
    val z = RankStats.paretoAbc(zeros, "id", "m").collect()
    assert(z.forall(_.isNullAt(2)) && z.forall(_.isNullAt(3)))
  }

  test("liftTable: perfect scorer concentrates, bins equal-count, gains reach 1") {
    import spark.implicits._
    // 20 rows, scores 20..1, positives = the top 5 scores → with 5
    // bins: bin 0 holds 4 positives of 4 (rate 1), bin 1 holds 1 of
    // 4; base rate 0.25 → lift 4.0 / 1.0; capture reaches 1 by bin 1
    val rows = (1L to 20L).map(i => (i, 21L - i, i <= 5))
      .toDF("id", "score", "y")
    val got = RankStats.liftTable(rows, "id", "score", "y", bins = 5)
      .orderBy("bin").collect()
    assert(got.map(_.getAs[Long]("n")).toSeq == Seq.fill(5)(4L))
    assert(got(0).getAs[Long]("n_pos") == 4L &&
      got(0).getAs[Double]("pos_rate6") == 1.0 &&
      got(0).getAs[Double]("lift6") == 4.0 &&
      got(0).getAs[Double]("capture6") == 0.8)
    assert(got(1).getAs[Long]("n_pos") == 1L &&
      got(1).getAs[Double]("capture6") == 1.0 &&
      got(1).getAs[Double]("lift6") == 1.0)
    assert(got.drop(2).forall(_.getAs[Double]("lift6") == 0.0))
    assert(got.last.getAs[Double]("capture6") == 1.0)
    // no positives → NULL capture/lift, rates still defined
    val none = (1L to 10L).map(i => (i, i, false)).toDF("id", "score", "y")
    val z = RankStats.liftTable(none, "id", "score", "y", bins = 5)
      .orderBy("bin").head()
    assert(z.getAs[Double]("pos_rate6") == 0.0 &&
      z.isNullAt(z.fieldIndex("capture6")) &&
      z.isNullAt(z.fieldIndex("lift6")))
  }

  test("kneePoint: picks the max-above-chord rank; flat curve rank 1") {
    import spark.implicits._
    // cum = 50, 80, 95, 100 over n=4: scores 100, 120, 80, 0 → knee
    // at rank 2 (share 0.8, distance 0.8 − 0.5 = 0.3)
    val items = Seq((1L, 50000000L), (2L, 30000000L), (3L, 15000000L),
      (4L, 5000000L)).toDF("id", "m")
    val r = RankStats.kneePoint(items, "id", "m").head()
    assert(r.getAs[Long]("knee_rank") == 2L &&
      r.getAs[Long]("knee_id") == 2L)
    assert(r.getAs[Double]("cum_share6") == 0.8 &&
      r.getAs[Double]("dist6") == 0.3)
    // uniform curve: every score is exactly 0 → ties break to rank 1
    val flat = Seq((9L, 1000000L), (3L, 1000000L), (5L, 1000000L))
      .toDF("id", "m")
    val f = RankStats.kneePoint(flat, "id", "m").head()
    assert(f.getAs[Long]("knee_rank") == 1L &&
      f.getAs[Long]("knee_id") == 3L, s"got $f")
    // zero-total and empty inputs yield no row
    assert(RankStats.kneePoint(Seq((1L, 0L)).toDF("id", "m"),
      "id", "m").count() == 0L)
  }

  test("groupedWeightedQuantiles: mass-weighted picks, whale pulls the median") {
    import spark.implicits._
    // group g: values 1..4 weight 1 each, plus value 5 with weight 96
    // → W=100; p25/p50/p75 all land inside the whale (value 5);
    // group h: uniform weights → plain quantiles (2, 3 at p50 of 1..4?)
    val rows = Seq(
      ("g", 1L, 101L, 1L), ("g", 2L, 102L, 1L), ("g", 3L, 103L, 1L),
      ("g", 4L, 104L, 1L), ("g", 5L, 105L, 96L),
      ("h", 1L, 201L, 1L), ("h", 2L, 202L, 1L), ("h", 3L, 203L, 1L),
      ("h", 4L, 204L, 1L))
      .toDF("k", "v", "id", "w")
    val got = RankStats.groupedWeightedQuantiles(rows, "k", "v", "id",
        "w", Seq(25, 50, 75))
      .orderBy("k", "pct").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // g: cum = 1,2,3,4,100; thresholds 25/50/75 → all inside value 5
    // h: W=4; thresholds ceil(1)=1→v1, 2→v2, 3→v3
    assert(got.toSeq == Seq(
      ("g", 25, 5L), ("g", 50, 5L), ("g", 75, 5L),
      ("h", 25, 1L), ("h", 50, 2L), ("h", 75, 3L)), s"got ${got.toSeq}")
  }

  test("groupedWeightedQuantiles: boundary hits exactly, reshuffle-stable") {
    import spark.implicits._
    // W = 4, p50 threshold = 2 exactly: value 1 (cum 2) satisfies
    // 2·100 >= 50·4 — the boundary row is IN
    val rows = Seq(("k", 1L, 1L, 2L), ("k", 9L, 2L, 2L))
      .toDF("k", "v", "id", "w")
    val v50 = RankStats.groupedWeightedQuantiles(rows, "k", "v", "id",
      "w", Seq(50)).head().getLong(2)
    assert(v50 == 1L)
    val a = RankStats.groupedWeightedQuantiles(rows.repartition(3),
      "k", "v", "id", "w", Seq(50)).head().getLong(2)
    assert(a == v50)
  }

  test("spearmanMatrix: monotone, reversed, tied, constant") {
    import spark.implicits._
    val df = Seq(
      (1.0, 10.0, 30.0, 7.0),
      (2.0, 20.0, 20.0, 7.0),
      (2.0, 30.0, 10.0, 7.0),
      (3.0, 40.0, 5.0, 7.0))
      .toDF("a", "b", "c", "k")
    val out = RankStats.spearmanMatrix(df, Seq("a", "b", "c", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // a=[1,2,2,3] rank2=[2,5,5,8]; b strictly asc rank2=[2,4,6,8]:
    // rho = 72/sqrt(72*80) = 0.948683...
    assert(out(("a", "b")) == Some(0.948683))
    assert(out(("b", "c")) == Some(-1.0), "strict reversal is -1")
    assert(out(("a", "k")) == None, "constant column reads NULL")
    assert(out(("a", "c")) == Some(-0.948683))
  }

  test("giniConcentration: uniform is 0, one-holder is (n-1)/n") {
    import spark.implicits._
    val flat = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("id", "x")
    val rf = RankStats.giniConcentration(flat, "id", "x").head()
    assert(rf.getAs[Double]("gini6") == 0.0)
    assert(rf.getAs[Long]("total") == 20L)
    // n=4: top decile is floor(4/10)=0 rows
    assert(rf.getAs[Double]("top_decile_share6") == 0.0)

    val one = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 100L)).toDF("id", "x")
    assert(RankStats.giniConcentration(one, "id", "x").head()
      .getAs[Double]("gini6") == 0.75) // (n-1)/n
  }

  test("winsorizedMeans: exact order statistics, whale clamped") {
    import spark.implicits._
    // group a: 1..20 → lo = rank ceil(20·5/100)=1 → 1, hi = rank 19
    // → 19; winsorized mean = (Σ1..19 + 19)/20 = 10.45
    // group b: same but the 20 is a 1000-whale — winsorized mean
    // IDENTICAL, raw mean blown to 59.5
    val rows =
      (1L to 20L).map(v => ("a", v * 1000000L)) ++
      ((1L to 19L).map(v => ("b", v * 1000000L)) :+ ("b", 1000000000L))
    val out = RankStats.winsorizedMeans(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("lo6") == 1.0)
    assert(out("a").getAs[Double]("hi6") == 19.0)
    assert(out("a").getAs[Double]("mean6") == 10.5)
    assert(out("a").getAs[Double]("winsorized_mean6") == 10.45)
    assert(out("b").getAs[Double]("winsorized_mean6") == 10.45,
      "the whale must not move the winsorized mean")
    assert(out("b").getAs[Double]("mean6") == 59.5)
  }

  test("winsorizedMeans: duplicates and integer rank edges") {
    import spark.implicits._
    // n = 40 of one value → lo = hi = the value, winsorized == raw;
    // and a 2-value group where rank ceil(0.05·2)=1 picks the min
    val rows = Seq.fill(40)(("flat", 7000000L)) ++
      Seq(("two", 1000000L), ("two", 9000000L))
    val out = RankStats.winsorizedMeans(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("flat").getAs[Double]("winsorized_mean6") == 7.0)
    assert(out("flat").getAs[Double]("lo6") == 7.0)
    assert(out("two").getAs[Double]("lo6") == 1.0)
    // kHi = ceil(2·95/100) = 2 → hi = 9; nothing clamps
    assert(out("two").getAs[Double]("hi6") == 9.0)
    assert(out("two").getAs[Double]("winsorized_mean6") == 5.0)
  }

  test("groupedExactQuantiles: order statistics at integer ranks") {
    import spark.implicits._
    // group a: 1..100 → p25 = rank 25 → 25, p50 = 50, p90 = 90;
    // group b: four values, p50 → rank ceil(4·50/100)=2 → 2nd value
    val rows = (1L to 100L).map(v => ("a", v * 1000000L)) ++
      Seq(10L, 20L, 30L, 40L).map(v => ("b", v * 1000000L))
    val out = RankStats.groupedExactQuantiles(rows.toDF("g", "v"),
        "g", "v", Seq(25, 50, 90, 100))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(out(("a", 25)) == 25.0)
    assert(out(("a", 50)) == 50.0)
    assert(out(("a", 90)) == 90.0)
    assert(out(("a", 100)) == 100.0, "p100 is the max")
    assert(out(("b", 50)) == 20.0)
    assert(out(("b", 25)) == 10.0)
    assert(out(("b", 100)) == 40.0)
  }

  test("giniConcentration: top-decile share on 20 rows") {
    import spark.implicits._
    // 19 ones + one 100: top decile = 2 rows = {100, 1} → 101/119;
    // six = Σ1..19 + 20*100 = 2190 → G = 4380/2380 - 1.05
    val df = ((1 to 19).map(i => (i.toLong, 1L)) :+ (20L, 100L))
      .toDF("id", "x")
    val r = RankStats.giniConcentration(df, "id", "x").head()
    assert(r.getAs[Long]("n_rows") == 20L)
    assert(r.getAs[Double]("gini6") == 0.790336)
    assert(r.getAs[Double]("top_decile_share6") == 0.848739)
  }

  test("robustOutliers: lower medians, MAD scale, one exchange") {
    import spark.implicits._
    // key 1: x=[1,2,3,4,100] → med=3, dev sorted [0,1,1,2,97] →
    // mad=1, threshold 4.4478 → only 97 is out.
    // key 2 (even n): x=[1,2,3,10] → LOWER med=2, dev sorted
    // [0,1,1,8] → mad=1 → only 8 is out.
    val df = (Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0),
      (1L, 4L, 4.0), (1L, 5L, 100.0)) ++
      Seq((2L, 1L, 1.0), (2L, 2L, 2.0), (2L, 3L, 3.0), (2L, 4L, 10.0)))
      .toDF("k", "id", "v")
    val got = RankStats.robustOutliers(df, "k", "v", "id")
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, 5L, 3.0, 1.0, 1L), (2L, 4L, 2.0, 1.0, 1L)), s"got ${got.toSeq}")
    // zero-MAD key: constant values → every deviation 0, none out
    val const = Seq((9L, 1L, 7.0), (9L, 2L, 7.0)).toDF("k", "id", "v")
    val rc = RankStats.robustOutliers(const, "k", "v", "id").head()
    assert(rc.getDouble(3) == 0.0 && rc.getLong(4) == 0L)
    // the whole operator rides ONE key exchange (both rank passes
    // re-sort inside the same partitioning)
    val plan = RankStats.robustOutliers(df, "k", "v", "id")
      .queryExecution.executedPlan.toString
    val exchanges = "hashpartitioning\\(k".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected one key exchange:\n$plan")
  }

  test("poissonBootstrapMean: deterministic, CI brackets the mean") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, i.toLong)).toDF("id", "x")
    val r = RankStats.poissonBootstrapMean(df, "id", "x", b = 64).head()
    assert(r.getAs[Long]("n") == 200L && r.getAs[Long]("b") == 64L)
    assert(r.getAs[Double]("mean6") == 100.5)
    val (lo, hi) = (r.getAs[Double]("ci_lo6"), r.getAs[Double]("ci_hi6"))
    assert(lo < 100.5 && 100.5 < hi, s"CI [$lo, $hi] must bracket 100.5")
    // a 95% CI of the mean of 1..200 (σ≈57.7) is a few units wide
    assert(hi - lo > 1.0 && hi - lo < 40.0, s"width ${hi - lo}")
    // md5-keyed weights: bit-identical across runs
    assert(RankStats.poissonBootstrapMean(df, "id", "x", b = 64).head() == r)
    intercept[IllegalArgumentException] {
      RankStats.poissonBootstrapMean(df, "id", "x", b = 2)
    }
  }

  test("sprt: first crossing decides, even against the final LLR") {
    import spark.implicits._
    // p0=0.2 vs p1=0.3: A=405465, B=-133531 micro, bounds ±2944439.
    // 8 successes cross the H1 bound (8·405465 ≥ 2944439) — then 100
    // failures drag the FINAL llr negative, but the sequential
    // decision was already made at trial 8.
    val early = ((1 to 8).map(i => (i.toLong, 1L)) ++
      (9 to 108).map(i => (i.toLong, 0L))).toDF("i", "x")
    val r = RankStats.sprt(early, Seq("i"), "x", 0.2, 0.3).head()
    assert(r.getAs[Long]("up_idx") == 8L)
    assert(r.getAs[String]("decision") == "accept_h1")
    assert(r.getAs[Double]("final_llr6") < 0, "final LLR is negative")

    // pure failures: H0 bound needs ceil(2944439/133531) = 23 trials
    val fails = (1 to 25).map(i => (i.toLong, 0L)).toDF("i", "x")
    val rf = RankStats.sprt(fails, Seq("i"), "x", 0.2, 0.3).head()
    assert(rf.getAs[Long]("dn_idx") == 23L)
    assert(rf.getAs[String]("decision") == "accept_h0")

    // not enough evidence yet → continue, both bounds NULL
    val short = (1 to 5).map(i => (i.toLong, 0L)).toDF("i", "x")
    val rs = RankStats.sprt(short, Seq("i"), "x", 0.2, 0.3).head()
    assert(rs.getAs[String]("decision") == "continue")
    assert(rs.isNullAt(rs.fieldIndex("up_idx")))
    assert(rs.getAs[Double]("final_llr6") == -0.667655)
  }

  test("zipfFit: exact power law reads slope -1") {
    import spark.implicits._
    // freq = 24/r for r=1..4 — an exact Zipf curve; the only slope
    // error is the ±0.5 micro-unit log snapping
    val text = Seq.fill(24)("aa") ++ Seq.fill(12)("bb") ++
      Seq.fill(8)("cc") ++ Seq.fill(6)("dd")
    val docs = Seq(text.mkString(" ")).toDF("text")
    val r = TextAnalysis.zipfFit(docs, "text", topK = 256).head()
    assert(r.getAs[Long]("n_terms") == 4L, "topK > vocab keeps all terms")
    assert(math.abs(r.getAs[Double]("slope6") + 1.0) < 1e-4,
      s"slope ${r.getAs[Double]("slope6")} should be -1")
    assert(r.getAs[Double]("r2_6") > 0.9999)
    // intercept ≈ ln 24
    assert(math.abs(r.getAs[Double]("intercept6") - math.log(24.0)) < 1e-4)
    // deterministic across runs
    assert(TextAnalysis.zipfFit(docs, "text", topK = 256).head() == r)
  }

  test("ksTest: hand CDF gaps, identical zero, empty-side NULL") {
    import spark.implicits._
    // a=[1,1,2,3], b=[1,2,2,4]: max gap at v=1 and v=3, both
    // |cc_a·n_b − cc_b·n_a| = 4 → D = 4/16 = 0.25
    val a = Seq(1.0, 1.0, 2.0, 3.0).toDF("v")
    val b = Seq(1.0, 2.0, 2.0, 4.0).toDF("v")
    val r = RankStats.ksTest(a, b, "v").head()
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("d_num") == 4L)
    assert(r.getAs[Double]("d6") == 0.25)
    assert(!r.getAs[Boolean]("significant"), "tiny samples can't reach crit")

    val same = RankStats.ksTest(a, a, "v").head()
    assert(same.getAs[Long]("d_num") == 0L)
    assert(same.getAs[Double]("d6") == 0.0)

    // fully separated supports: D = 1 exactly
    val lo = Seq(1.0, 2.0).toDF("v")
    val hi = Seq(10.0, 20.0).toDF("v")
    assert(RankStats.ksTest(lo, hi, "v").head().getAs[Double]("d6") == 1.0)

    val empty = RankStats.ksTest(lo, hi.filter(col("v") < 0), "v").head()
    assert(empty.getAs[Long]("n_b") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("d6")))
    assert(empty.isNullAt(empty.fieldIndex("significant")))
  }

  test("zipfFit: rank ties broken by token text, topK truncates") {
    import spark.implicits._
    val docs = Seq(Seq.fill(4)("x y z").mkString(" ")).toDF("text")
    // all three tokens tie at freq 4: ranks by token text x<y<z
    val r = TextAnalysis.zipfFit(docs, "text", topK = 2).head()
    assert(r.getAs[Long]("n_terms") == 2L)
    // equal frequencies: varF = 0 → R² NULL, slope 0
    assert(r.isNullAt(r.fieldIndex("r2_6")))
    assert(r.getAs[Double]("slope6") == 0.0)
  }
}
