package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** Audit checks must count planted violations exactly, fold all scan
  * rules into one pass, and behave on empty inputs.
  */
class AuditSpec extends SparkSuiteBase {

  import spark.implicits._

  private val child = Seq(
    (Some(1L), Some(10.0)),
    (Some(2L), Some(-1.0)),  // range violation
    (None, Some(3.0)),       // null key
    (Some(9L), None),        // orphan + null value
    (Some(1L), Some(200.0))  // range violation (> 100)
  ).toDF("fk", "v")

  private val parent = Seq(1L, 2L, 3L).toDF("pk")

  test("scan rules count planted nulls and range violations exactly") {
    val got = Audit.scanChecks(child, Seq(
        Audit.Rule("not_null:fk", col("fk").isNull),
        Audit.Rule("not_null:v", col("v").isNull),
        Audit.Rule("range:v", col("v") < 0 || col("v") > 100)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === Map(
      "not_null:fk" -> ((5L, 1L)),
      "not_null:v" -> ((5L, 1L)),
      "range:v" -> ((5L, 2L))))
  }

  test("all scan rules fold into a single pass over the table") {
    val plan = Audit.scanChecks(child, Seq(
        Audit.Rule("a", col("fk").isNull),
        Audit.Rule("b", col("v") < 0),
        Audit.Rule("c", col("v") > 100)))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans === 1, s"expected one scan for all rules, got $scans:\n$plan")
  }

  test("unique counts rows in excess of one per key") {
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val r = Audit.unique(df, Seq("k")).head()
    assert(r.getString(0) === "unique:k")
    assert(r.getLong(1) === 6L && r.getLong(2) === 3L)
  }

  test("foreignKey counts orphan DISTINCT keys, ignoring null children") {
    val r = Audit.foreignKey(child, "fk", parent, "pk", "child->parent")
      .head()
    // distinct non-null child keys {1, 2, 9}; 9 is the orphan
    assert(r.getLong(1) === 3L && r.getLong(2) === 1L)
  }

  test("clean and empty inputs read zero violations") {
    val clean = Seq((1L, 5.0)).toDF("fk", "v")
    val r = Audit.report(Seq(
      Audit.scanChecks(clean, Seq(Audit.Rule("n", col("fk").isNull))),
      Audit.unique(clean, Seq("fk")))).collect()
    assert(r.forall(_.getLong(2) === 0L))
    val empty = clean.where(lit(false))
    val e = Audit.scanChecks(empty,
      Seq(Audit.Rule("n", col("fk").isNull))).head()
    assert(e.getLong(1) === 0L && e.getLong(2) === 0L)
  }

  test("columnProfile: one scan for all columns; all-null column reads null mean") {
    val df = Seq(
      (Some(1.0), Option.empty[Double]),
      (Some(3.0), Option.empty[Double]),
      (None, Option.empty[Double])).toDF("x", "y")
    val prof = Audit.columnProfile(df, Seq("x", "y"))
    val plan = prof.queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans === 1, s"expected one scan for all columns, got $scans:\n$plan")
    val got = prof.collect().map(r => r.getString(0) -> r).toMap
    assert(got("x").getLong(1) === 3L && got("x").getLong(2) === 1L)
    assert(got("x").getDouble(3) === 1.0 && got("x").getDouble(4) === 3.0)
    assert(got("x").getDouble(5) === 2.0)
    assert(got("y").getLong(2) === 3L && got("y").isNullAt(5),
      "all-null column must read null mean")
  }

  test("benford: digit extraction exact at powers of ten; zero rows excluded") {
    val df = Seq(1.0, 10.0, 100.0, 1000.0, 999.99, 0.0, -5.0, 0.02, 7e7)
      .toDF("v")
    val got = Audit.benfordAudit(df, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 1,10,100,1000 -> digit 1; 999.99 -> 9; 0.02 -> 2; 7e7 -> 7;
    // 0 and -5 excluded
    assert(got === Map(1 -> 4L, 9 -> 1L, 2 -> 1L, 7 -> 1L))
    val row = Audit.benfordAudit(df, "v").filter(col("digit") === 1).head()
    // expected rate for digit 1 is log10(2) ~ 0.301030
    assert(row.getDouble(3) === math.floor(math.log10(2.0) * 1e6 + 0.5) / 1e6)
    assert(row.getDouble(2) === math.floor(4.0 / 7.0 * 1e6 + 0.5) / 1e6)
  }

  test("benford: a geometric series conforms, a shifted-uniform one deviates") {
    // 10^(k/1000) covers exactly one decade log-uniformly -> Benford
    // rates up to the 1/1000 discretization
    val geo = (0 until 1000).map(k => math.pow(10.0, k / 1000.0)).toDF("v")
    val gdev = Audit.benfordAudit(geo, "v")
      .collect().map(r => math.abs(r.getDouble(4))).max
    assert(gdev < 0.02, s"geometric series should conform, max dev $gdev")
    // values uniform on [500, 600): all mass on digit 5 -> huge deviation
    val uni = (0 until 1000).map(k => 500.0 + k * 0.1).toDF("v")
    val udev = Audit.benfordAudit(uni, "v")
      .collect().map(r => math.abs(r.getDouble(4))).max
    assert(udev > 0.8, s"shifted uniform must deviate, got $udev")
  }

  test("driftReport: mean shift, null-rate shift and range expansion flagged") {
    val a = Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("v")
    val b = Seq(Some(2.0), Some(4.0), Some(12.0), Some(2.0)).toDF("v")
    val r = Audit.driftReport(a, b, Seq("v")).head()
    assert(r.getLong(1) === 4L && r.getLong(2) === 4L)
    assert(r.getDouble(3) === 2.0 && r.getDouble(4) === 5.0)
    assert(r.getDouble(5) === 3.0) // mean delta
    assert(r.getDouble(6) === 0.25 && r.getDouble(7) === 0.0)
    assert(r.getBoolean(8), "max 12 > 3 must flag range_expanded")
    // no expansion when the new snapshot sits inside the old range
    val r2 = Audit.driftReport(b, b.filter(col("v") < 10.0), Seq("v")).head()
    assert(!r2.getBoolean(8))
  }

  test("categoricalAssociation: perfect, independent, constant") {
    import spark.implicits._
    // a == b: χ² = n, V = 1, MI = ln 2 (micro-rounded per diag term)
    val perfect = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val rp = Audit.categoricalAssociation(perfect, "a", "b").head()
    assert(rp.getAs[Long]("n") == 4L)
    assert(rp.getAs[Double]("chi2_6") == 4.0)
    assert(rp.getAs[Double]("cramers_v6") == 1.0)
    assert(math.abs(rp.getAs[Double]("mi6") - math.log(2.0)) < 1e-5)

    // uniform grid: no association anywhere
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val ri = Audit.categoricalAssociation(indep, "a", "b").head()
    assert(ri.getAs[Double]("chi2_6") == 0.0)
    assert(ri.getAs[Double]("mi6") == 0.0)
    assert(ri.getAs[Double]("cramers_v6") == 0.0)

    // constant b: min(r, c) = 1 → V undefined (NULL), MI 0
    val const = Seq(("x", "k"), ("y", "k")).toDF("a", "b")
    val rc = Audit.categoricalAssociation(const, "a", "b").head()
    assert(rc.isNullAt(rc.fieldIndex("cramers_v6")))
    assert(rc.getAs[Double]("mi6") == 0.0)
  }

  test("categoricalAssociation: observed-zero cells pay their e_ij") {
    import spark.implicits._
    // (y,y) never observed: χ² = 1/12 + 1/6 + 1/6 + 1/3 = 0.75 —
    // the missing cell's 1/3 term MUST be included (without the
    // zero-filled grid the sum would read 0.416667)
    val df = Seq(("x", "x"), ("x", "y"), ("y", "x")).toDF("a", "b")
    val r = Audit.categoricalAssociation(df, "a", "b").head()
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("chi2_6") == 0.75, s"got $r")
  }

  test("psiDrift: identical distribution reads ~0, shifted flags") {
    import spark.implicits._
    // twin: same histogram as baseline → PSI exactly 0 (p = q in
    // every bin, including the smoothing); shifted: all mass moved
    // two bins up
    val rows =
      Seq.tabulate(40)(i => ("base", (i % 4) * 10L)) ++
      Seq.tabulate(40)(i => ("twin", (i % 4) * 10L)) ++
      Seq.tabulate(40)(i => ("shift", (i % 4) * 10L + 60L))
    val df = rows.toDF("src", "v")
    val out = Audit.psiDrift(df, "src", "v", baseline = "base",
        binWidth = 10L, nBins = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("base"), "baseline is not reported")
    assert(out("twin").getAs[Double]("psi6") == 0.0)
    assert(!out("twin").getAs[Boolean]("drifted"))
    assert(out("shift").getAs[Double]("psi6") > 0.2)
    assert(out("shift").getAs[Boolean]("drifted"))
    assert(out("shift").getAs[Long]("n_rows") == 40L)
  }

  test("psiDrift: hand-computed two-bin PSI with smoothing") {
    import spark.implicits._
    // baseline: 3 in bin0, 1 in bin1; other: 1 in bin0, 3 in bin1
    // with +1/(4+2): q = (4/6, 2/6), p = (2/6, 4/6)
    // psi = (2/6-4/6)ln(2/4) + (4/6-2/6)ln(4/2) = (2/3)ln2 = 0.462098
    val df = (Seq.fill(3)(("b", 0L)) ++ Seq(("b", 10L)) ++
      Seq(("o", 0L)) ++ Seq.fill(3)(("o", 10L))).toDF("src", "v")
    val r = Audit.psiDrift(df, "src", "v", "b", 10L, 2).head()
    assert(r.getAs[Double]("psi6") == 0.462098)
    assert(r.getAs[Boolean]("drifted"))
  }

  test("psiDrift: values clamp into [0, nBins) bins") {
    import spark.implicits._
    // negative and overflow values land in the edge bins rather
    // than throwing or creating phantom bins
    val df = (Seq(("b", -5L), ("b", 0L), ("b", 99L), ("b", 500L)) ++
      Seq(("o", -1L), ("o", 3L), ("o", 120L), ("o", 999L)))
      .toDF("src", "v")
    val r = Audit.psiDrift(df, "src", "v", "b", 10L, 5).head()
    assert(r.getAs[Long]("n_rows") == 4L)
    // identical bin occupancy (bin0 ×2, bin0.., clamp top = bin4 ×2)
    assert(r.getAs[Double]("psi6") == 0.0)
  }

  test("kAnonymity: hand counts, k-boundary is inclusive-safe, null QI groups") {
    import spark.implicits._
    // groups: (a,1)x3, (a,2)x2, (b,1)x1, (null,1)x2 -> k=2:
    // small (<2) = only (b,1): 1 group, 1 row of 8
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 2), ("a", 2),
      ("b", 1), (null, 1), (null, 1)).toDF("seg", "nat")
    val r = Audit.kAnonymity(df, Seq("seg", "nat"), k = 2L).head()
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("n_groups") == 4L, "null QI tuple forms a group")
    assert(r.getAs[Long]("n_small_groups") == 1L)
    assert(r.getAs[Long]("n_rows_small") == 1L)
    assert(r.getAs[Double]("share_small6") == 0.125)
    assert(r.getAs[Long]("min_group_size") == 1L)
    assert(!r.getAs[Boolean]("k_anonymous"))
    // a group of exactly k is NOT small (the < k contract)
    val ok = Audit.kAnonymity(df.filter(col("seg") =!= "b"),
      Seq("seg", "nat"), k = 2L).head()
    assert(ok.getAs[Long]("n_small_groups") == 0L)
    assert(ok.getAs[Boolean]("k_anonymous"))
  }

  test("lDiversity: hand counts, null sensitive is a value, l-boundary inclusive") {
    import spark.implicits._
    // QI group g1: sensitive {x,y,z} -> div 3; g2: {x,x,x} -> div 1
    // (homogeneous, 3 rows); g3: {x, null} -> div 2 (null counts)
    val df = Seq(("g1", "x"), ("g1", "y"), ("g1", "z"),
      ("g2", "x"), ("g2", "x"), ("g2", "x"),
      ("g3", "x"), ("g3", null)).toDF("qi", "s")
    val r = Audit.lDiversity(df, Seq("qi"), "s", l = 2L).head()
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_low_groups") == 1L, "only g2 is below l=2")
    assert(r.getAs[Long]("n_rows_low") == 3L)
    assert(r.getAs[Double]("share_low6") == 0.375)
    assert(r.getAs[Long]("min_diversity") == 1L)
    assert(!r.getAs[Boolean]("l_diverse"))
    // a group with exactly l distinct values is NOT low (< l contract)
    val r3 = Audit.lDiversity(df, Seq("qi"), "s", l = 3L).head()
    assert(r3.getAs[Long]("n_low_groups") == 2L, "g2 and g3 below l=3")
    // guards: sensitive inside QI, l < 2
    intercept[IllegalArgumentException] {
      Audit.lDiversity(df, Seq("qi", "s"), "s", l = 2L)
    }
    intercept[IllegalArgumentException] {
      Audit.lDiversity(df, Seq("qi"), "s", l = 1L)
    }
  }

  test("tCloseness: hand-computed ordered EMD, boundary, identical-dist zero") {
    import spark.implicits._
    // values {1,2,3}, global p = (1/3,1/3,1/3).
    // A = (1,1,2): q = (2/3,1/3,0) -> cum (1/3, 1/3) -> EMD = 1/3
    // B = (2,3,3): q = (0,1/3,2/3) -> cum (-1/3,-1/3) -> EMD = 1/3
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L),
      ("B", 2L), ("B", 3L), ("B", 3L)).toDF("qi", "v")
    val r = Audit.tCloseness(df, Seq("qi"), "v", t = 0.2).head()
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("n_far_groups") == 2L, "both groups at EMD 1/3 > 0.2")
    assert(r.getAs[Long]("n_rows_far") == 6L)
    assert(r.getAs[Double]("max_emd6") == 0.333333)
    assert(!r.getAs[Boolean]("t_close"))
    // the same release clears a looser bound
    val loose = Audit.tCloseness(df, Seq("qi"), "v", t = 0.5).head()
    assert(loose.getAs[Long]("n_far_groups") == 0L)
    assert(loose.getAs[Boolean]("t_close"))
    // identical per-group distributions -> EMD exactly 0 at any t
    val same = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L))
      .toDF("qi", "v")
    val s0 = Audit.tCloseness(same, Seq("qi"), "v", t = 0.01).head()
    assert(s0.getAs[Double]("max_emd6") == 0.0)
    assert(s0.getAs[Boolean]("t_close"))
    // a single-value domain (m=1) reads EMD 0, not a division by zero
    val one = Seq(("A", 5L), ("B", 5L)).toDF("qi", "v")
    assert(Audit.tCloseness(one, Seq("qi"), "v", t = 0.2)
      .head().getAs[Double]("max_emd6") == 0.0)
    intercept[IllegalArgumentException] {
      Audit.tCloseness(df, Seq("qi", "v"), "v", t = 0.2)
    }
    intercept[IllegalArgumentException] {
      Audit.tCloseness(df, Seq("qi"), "v", t = 1.5)
    }
  }

  test("tCloseness: null sensitive values and null QI keys are domain values, not dropped mass") {
    import spark.implicits._
    // null joins the domain as a value ranked FIRST. Domain
    // {null,1,2}, global p = (1/3,1/3,1/3).
    // A = (null,null,1): q = (2/3,1/3,0) -> cum (1/3,1/3) -> EMD 1/3
    // B = (1,2,2):       q = (0,1/3,2/3) -> cum (-1/3,-1/3) -> EMD 1/3
    // A plain (null-unequal) join would lose A's null mass: A's q
    // would sum to 1/3 and both EMDs would be wrong.
    val df = Seq(("A", None), ("A", None), ("A", Some(1L)),
      ("B", Some(1L)), ("B", Some(2L)), ("B", Some(2L)))
      .toDF("qi", "v")
    val r = Audit.tCloseness(df, Seq("qi"), "v", t = 0.2).head()
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Double]("max_emd6") == 0.333333)
    assert(r.getAs[Long]("n_far_groups") == 2L)
    // a NULL QI key is a group of its own, and identical
    // distributions still read EMD 0 through the null-safe join
    val ng = Seq((Some("A"), 1L), (Some("A"), 2L),
      (None, 1L), (None, 2L)).toDF("qi", "v")
    val s = Audit.tCloseness(ng, Seq("qi"), "v", t = 0.01).head()
    assert(s.getAs[Long]("n_groups") == 2L)
    assert(s.getAs[Double]("max_emd6") == 0.0)
    assert(s.getAs[Boolean]("t_close"))
  }
}
