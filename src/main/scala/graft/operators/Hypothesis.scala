package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hypothesis-testing layer over experiment readouts: per-group
  * Welch's unequal-variance t-test (the continuous-outcome
  * counterpart of [[Behavior.abTest]]'s two-proportion z — revenue
  * per user, latency, tokens per document, anything with a mean),
  * and Benjamini–Hochberg FDR control over a FAMILY of such tests —
  * the correction that keeps a 35-cell screening sweep from
  * "discovering" two cells by chance at α=0.05.
  *
  * Determinism discipline: per-arm moments (n, Σx, Σx²) accumulate
  * exactly — x is a pre-snapped integer micro-unit column, Σx in
  * int64, Σx² in decimal(38,0) (x² of a 1e9-micro value overflows
  * int64 at ~10 rows) — so every cross-row sum is partition-order
  * free. The t / df / p chain is ONE row of double arithmetic with
  * identical text in both engines, 6dp-snapped. p-values use the
  * NORMAL approximation to the t reference distribution
  * (Abramowitz–Stegun 7.1.26 erf polynomial — `exp` is the only
  * transcendental), documented and adequate for the n≥30-per-arm
  * regime experiments run at; exact t CDFs need incomplete-beta
  * machinery neither engine exposes.
  *
  * Scale shape: one map-side-combinable hash aggregate to the
  * group×arm frame, then row-local math. BH ranks ride ONE window
  * over the HYPOTHESIS frame — bounded by the test-family size
  * (cells of a grouping grid, never the corpus), the same
  * vocab-sized-window carve-out as Tokenize's merge ranks.
  */
object Hypothesis {

  private def pr6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Two-sided normal tail probability 2·(1−Φ(|z|)) via the
    * Abramowitz–Stegun 7.1.26 erf polynomial (|error| < 1.5e-7,
    * far inside the 6dp snap): with x = |z|/√2 and
    * t = 1/(1 + 0.3275911·x),
    * 2(1−Φ) = (a₁t + a₂t² + a₃t³ + a₄t⁴ + a₅t⁵)·e^(−x²).
    * Row-local; the only transcendental is `exp`.
    */
  def normP2(z: Column): Column = {
    val x = abs(z) / lit(1.4142135623730951)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t + lit(-1.453152027)) * t +
      lit(1.421413741)) * t + lit(-0.284496736)) * t +
      lit(0.254829592)) * t
    poly * exp(-(x * x))
  }

  /** SQL-text twin of [[normP2]] (same literals, same nesting) for
    * oracle queries; `z` is a SQL expression string.
    */
  def normP2Sql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val t = s"(1e0 / (1e0 + 0.3275911 * $x))"
    val poly = s"((((1.061405429 * $t + -1.453152027) * $t + " +
      s"1.421413741) * $t + -0.284496736) * $t + 0.254829592) * $t"
    s"(($poly) * exp(-($x * $x)))"
  }

  /** SQL-text twin of the [[welchFromMoments]] chain for oracle
    * queries: given the six moment column names (counts, micro sums,
    * micro² sums-of-squares), returns the output expression per
    * readout column — identical operation order to the Column chain
    * so the doubles match bit-for-bit before the 6dp snap.
    */
  def welchSql(
      na: String, sa: String, qa: String,
      nb: String, sb: String, qb: String): Map[String, String] = {
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    def p6(e: String) = s"floor(($e) * 1e6 + 0.5)/1e6"
    val naD = dd(na); val nbD = dd(nb)
    val saD = s"(${dd(sa)} / 1e6)"; val sbD = s"(${dd(sb)} / 1e6)"
    val qaD = s"(${dd(qa)} / 1e12)"; val qbD = s"(${dd(qb)} / 1e12)"
    val ma = s"($saD / $naD)"; val mb = s"($sbD / $nbD)"
    val va = s"(($qaD - $saD * $saD / $naD) / ($naD - 1e0))"
    val vb = s"(($qbD - $sbD * $sbD / $nbD) / ($nbD - 1e0))"
    val wa = s"($va / $naD)"; val wb = s"($vb / $nbD)"
    val se2 = s"($wa + $wb)"
    val tt = s"(($mb - $ma) / sqrt($se2))"
    val dfW = s"($se2 * $se2 / " +
      s"($wa * $wa / ($naD - 1e0) + $wb * $wb / ($nbD - 1e0)))"
    val p = normP2Sql(tt)
    val ok = s"($na > 1 AND $nb > 1 AND $se2 > 0)"
    Map(
      "mean_a6" -> p6(ma), "mean_b6" -> p6(mb),
      "diff6" -> p6(s"($mb - $ma)"),
      "t6" -> s"CASE WHEN $ok THEN ${p6(tt)} END",
      "df6" -> s"CASE WHEN $ok THEN ${p6(dfW)} END",
      "p6" -> s"CASE WHEN $ok THEN ${p6(p)} END",
      "significant" ->
        s"CASE WHEN $ok THEN ${p6(p)} <= 0.05 END")
  }

  /** Per-group Welch's t-test of the micro-unit outcome `microCol`
    * between the two arms of `armCol` (0 = A, 1 = B).
    *
    * Per (group, arm): n, Σx (int64), Σx² (decimal(38,0)) — exact.
    * Then the Welch chain: sample variance v = (Σx² − (Σx)²/n)/(n−1),
    * se² = v_a/n_a + v_b/n_b, t = (m_b − m_a)/√se², and the
    * Welch–Satterthwaite df = se²² / ((v_a/n_a)²/(n_a−1) +
    * (v_b/n_b)²/(n_b−1)). Degenerate inputs (an arm with n ≤ 1, or
    * se² = 0 — both arms constant) yield NULL t/df/p with the counts
    * still reported, the q135-family zero-denominator convention.
    * `significant` thresholds the ROUNDED p at α=0.05 (q85's pred
    * discipline: compare snapped values, never raw doubles).
    *
    * Output: per group — (groupCols..., n_a, n_b, mean_a6, mean_b6,
    * diff6, t6, df6, p6, significant). Means/diff are in ORIGINAL
    * units (micro / 1e6).
    */
  def welchTTest(
      df: DataFrame,
      groupCols: Seq[String],
      armCol: String,
      microCol: String): DataFrame = {
    val x = col(microCol).cast("long")
    val xd = x.cast("decimal(38,0)")
    val isB = col(armCol).cast("long") === 1L
    val g = df.groupBy(groupCols.map(col): _*).agg(
      sum(when(!isB, 1L).otherwise(0L)).as("n_a"),
      sum(when(!isB, x).otherwise(0L)).as("__sa"),
      sum(when(!isB, xd * xd).otherwise(lit(0).cast("decimal(38,0)")))
        .as("__qa"),
      sum(when(isB, 1L).otherwise(0L)).as("n_b"),
      sum(when(isB, x).otherwise(0L)).as("__sb"),
      sum(when(isB, xd * xd).otherwise(lit(0).cast("decimal(38,0)")))
        .as("__qb"))
    welchFromMoments(g,
      groupCols.map(col),
      col("n_a"), col("__sa"), col("__qa"),
      col("n_b"), col("__sb"), col("__qb"))
  }

  /** The Welch chain over pre-aggregated exact moments — shared by
    * [[welchTTest]] and [[welchScreen]] (whose "arm B" is the
    * complement cell of a grouping grid). Moment columns: counts
    * int64, sums int64 micro, sum-of-squares decimal(38,0) in
    * micro². Emits the full readout row per input row.
    */
  private[operators] def welchFromMoments(
      g: DataFrame,
      keep: Seq[Column],
      nA: Column, sA: Column, qA: Column,
      nB: Column, sB: Column, qB: Column): DataFrame = {
    val naD = nA.cast("double")
    val nbD = nB.cast("double")
    // micro → original units: sums /1e6, sums-of-squares /1e12
    val saD = sA.cast("double") / lit(1e6)
    val sbD = sB.cast("double") / lit(1e6)
    val qaD = qA.cast("double") / lit(1e12)
    val qbD = qB.cast("double") / lit(1e12)
    val ma = saD / naD
    val mb = sbD / nbD
    val va = (qaD - saD * saD / naD) / (naD - lit(1.0))
    val vb = (qbD - sbD * sbD / nbD) / (nbD - lit(1.0))
    val wa = va / naD
    val wb = vb / nbD
    val se2 = wa + wb
    val tt = (mb - ma) / sqrt(se2)
    val dfW = se2 * se2 /
      (wa * wa / (naD - lit(1.0)) + wb * wb / (nbD - lit(1.0)))
    val p = normP2(tt)
    val ok = nA > 1L && nB > 1L && se2 > 0
    g.select(keep ++ Seq(
      nA.as("n_a"), nB.as("n_b"),
      pr6(ma).as("mean_a6"), pr6(mb).as("mean_b6"),
      pr6(mb - ma).as("diff6"),
      when(ok, pr6(tt)).otherwise(lit(null).cast("double")).as("t6"),
      when(ok, pr6(dfW)).otherwise(lit(null).cast("double")).as("df6"),
      when(ok, pr6(p)).otherwise(lit(null).cast("double")).as("p6"),
      when(ok, pr6(p) <= lit(0.05))
        .otherwise(lit(null).cast("boolean")).as("significant")): _*)
  }

  /** Screening sweep: one Welch test per (groupCols, sliceCol) cell
    * against its COMPLEMENT (all other slices of the same group) —
    * "is Tuesday's mean different from the rest of the week", asked
    * for every cell of the grid at once. The complement's moments are
    * group totals minus the cell's (all exact integers/decimals), so
    * the corpus is aggregated ONCE — no per-hypothesis second pass.
    * Feed the result to [[bhFdr]]: a G×S grid is G·S hypotheses and
    * uncorrected α=0.05 expects G·S/20 false flags.
    *
    * Output: (groupCols..., sliceCol, welch readout columns) where
    * arm A = the cell, arm B = its complement.
    */
  def welchScreen(
      df: DataFrame,
      groupCols: Seq[String],
      sliceCol: String,
      microCol: String): DataFrame = {
    val x = col(microCol).cast("long")
    val xd = x.cast("decimal(38,0)")
    val cell = df.groupBy((groupCols :+ sliceCol).map(col): _*).agg(
      count(lit(1)).as("__nc"), sum(x).as("__sc"),
      sum(xd * xd).as("__qc"))
    val tot = cell.groupBy(groupCols.map(col): _*).agg(
      sum(col("__nc")).as("__nt"), sum(col("__sc")).as("__st"),
      sum(col("__qc")).as("__qt"))
    val j = cell.join(broadcast(tot), groupCols)
    welchFromMoments(j,
      (groupCols :+ sliceCol).map(col),
      col("__nc"), col("__sc"), col("__qc"),
      col("__nt") - col("__nc"), col("__st") - col("__sc"),
      col("__qt") - col("__qc"))
  }

  /** CUPED variance reduction (Deng et al. 2013): adjust each unit's
    * experiment-period outcome y by its PRE-period covariate x,
    * y' = y − θ(x − x̄) with θ = cov(x, y)/var(x) pooled across arms
    * — the standard trick that cuts experiment readout variance by
    * the covariate's R² (often 30-50% for revenue metrics, i.e. the
    * same sensitivity from half the traffic).
    *
    * Everything reduces to ONE exact-moment aggregate over the
    * unit frame: the adjusted mean difference is
    * (ȳ_b − ȳ_a) − θ(x̄_b − x̄_a), and the variance reduction is
    * 1 − (S_yy − 2θS_xy + θ²S_xx)/S_yy over centered pooled moments
    * — no per-unit second pass, no re-read. Micro-unit int64 sums;
    * cross/square moments in decimal(38,0); the θ/diff/reduction
    * chain is one row of identical-text double math.
    *
    * Degenerate inputs: var(x) = 0 (constant covariate) reads NULL
    * θ/adjusted columns with the raw diff still reported.
    *
    * Output: ONE row (n, n_a, n_b, theta6, diff_raw6, diff_adj6,
    * var_reduction6).
    */
  def cuped(
      units: DataFrame,
      armCol: String,
      preMicroCol: String,
      postMicroCol: String): DataFrame = {
    val x = col(preMicroCol).cast("long")
    val y = col(postMicroCol).cast("long")
    val xd = x.cast("decimal(38,0)")
    val yd = y.cast("decimal(38,0)")
    val isB = col(armCol).cast("long") === 1L
    val m = units.agg(
      count(lit(1)).as("n"),
      sum(when(!isB, 1L).otherwise(0L)).as("n_a"),
      sum(when(isB, 1L).otherwise(0L)).as("n_b"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(xd * xd).as("__sxx"), sum(xd * yd).as("__sxy"),
      sum(yd * yd).as("__syy"),
      sum(when(!isB, x).otherwise(0L)).as("__sxa"),
      sum(when(!isB, y).otherwise(0L)).as("__sya"),
      sum(when(isB, x).otherwise(0L)).as("__sxb"),
      sum(when(isB, y).otherwise(0L)).as("__syb"))
    val nD = col("n").cast("double")
    val sx = col("__sx").cast("double") / lit(1e6)
    val sy = col("__sy").cast("double") / lit(1e6)
    val sxx = col("__sxx").cast("double") / lit(1e12)
    val sxy = col("__sxy").cast("double") / lit(1e12)
    val syy = col("__syy").cast("double") / lit(1e12)
    val cxx = sxx - sx * sx / nD
    val cxy = sxy - sx * sy / nD
    val cyy = syy - sy * sy / nD
    val theta = cxy / cxx
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val mya = col("__sya").cast("double") / lit(1e6) / naD
    val myb = col("__syb").cast("double") / lit(1e6) / nbD
    val mxa = col("__sxa").cast("double") / lit(1e6) / naD
    val mxb = col("__sxb").cast("double") / lit(1e6) / nbD
    val diffRaw = myb - mya
    val diffAdj = (myb - mya) - theta * (mxb - mxa)
    val vr = lit(1.0) - (cyy - lit(2.0) * theta * cxy + theta * theta * cxx) / cyy
    val ok = col("n_a") > 0L && col("n_b") > 0L && cxx > 0 && cyy > 0
    m.select(col("n"), col("n_a"), col("n_b"),
      when(ok, pr6(theta)).otherwise(lit(null).cast("double"))
        .as("theta6"),
      when(col("n_a") > 0L && col("n_b") > 0L, pr6(diffRaw))
        .otherwise(lit(null).cast("double")).as("diff_raw6"),
      when(ok, pr6(diffAdj)).otherwise(lit(null).cast("double"))
        .as("diff_adj6"),
      when(ok, pr6(vr)).otherwise(lit(null).cast("double"))
        .as("var_reduction6"))
  }

  /** SQL-text twin of [[cuped]]'s solve chain (moment column names →
    * output expressions, operation-ordered identically).
    */
  def cupedSql(
      n: String, na: String, nb: String, sx: String, sy: String,
      sxx: String, sxy: String, syy: String,
      sxa: String, sya: String, sxb: String, syb: String)
      : Map[String, String] = {
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    def p6(e: String) = s"floor(($e) * 1e6 + 0.5)/1e6"
    val nD = dd(n)
    val vx = s"(${dd(sx)} / 1e6)"
    val vy = s"(${dd(sy)} / 1e6)"
    val vxx = s"(${dd(sxx)} / 1e12)"
    val vxy = s"(${dd(sxy)} / 1e12)"
    val vyy = s"(${dd(syy)} / 1e12)"
    val cxx = s"($vxx - $vx * $vx / $nD)"
    val cxy = s"($vxy - $vx * $vy / $nD)"
    val cyy = s"($vyy - $vy * $vy / $nD)"
    val th = s"($cxy / $cxx)"
    val naD = dd(na); val nbD = dd(nb)
    val mya = s"(${dd(sya)} / 1e6 / $naD)"
    val myb = s"(${dd(syb)} / 1e6 / $nbD)"
    val mxa = s"(${dd(sxa)} / 1e6 / $naD)"
    val mxb = s"(${dd(sxb)} / 1e6 / $nbD)"
    val dRaw = s"($myb - $mya)"
    val dAdj = s"(($myb - $mya) - $th * ($mxb - $mxa))"
    val vr = s"(1e0 - ($cyy - 2e0 * $th * $cxy + $th * $th * $cxx) / $cyy)"
    val ok = s"($na > 0 AND $nb > 0 AND $cxx > 0 AND $cyy > 0)"
    Map(
      "theta6" -> s"CASE WHEN $ok THEN ${p6(th)} END",
      "diff_raw6" -> s"CASE WHEN $na > 0 AND $nb > 0 THEN ${p6(dRaw)} END",
      "diff_adj6" -> s"CASE WHEN $ok THEN ${p6(dAdj)} END",
      "var_reduction6" -> s"CASE WHEN $ok THEN ${p6(vr)} END")
  }

  /** Experiment health panel: the two numbers to check BEFORE
    * reading any treatment effect — sample-ratio mismatch (SRM: a
    * 1-dof χ² of the observed split against 50/50; a tiny p means
    * the assignment itself is broken and every downstream readout is
    * garbage) and the minimum detectable effect at α=0.05 / 80%
    * power (MDE = (z_{α/2}+z_β)·√(s²(1/n_a+1/n_b)) ≈ 2.801585·se —
    * what this sample size can actually see; an effect below it was
    * never going to reach significance).
    *
    * One exact-moment aggregate over the unit frame (micro int64
    * sums, Σy² decimal128); the χ²/p/MDE chain is one row. SRM p
    * reuses the 1-dof identity P(χ² > c) = 2(1−Φ(√c)) through
    * [[normP2]]. `srm_flag` thresholds ROUNDED p at the conventional
    * 0.001 (SRM alarms demand stronger evidence than 0.05 — traffic
    * splits are checked daily and false alarms burn trust).
    *
    * Output: ONE row (n, n_a, n_b, srm_chi2_6, srm_p6, srm_flag,
    * sd6, mde_abs6, mde_rel6 — relative to the pooled mean, NULL
    * when the mean is ≤ 0).
    */
  def experimentHealth(
      units: DataFrame,
      armCol: String,
      microCol: String): DataFrame = {
    val y = col(microCol).cast("long")
    val yd = y.cast("decimal(38,0)")
    val isB = col(armCol).cast("long") === 1L
    val m = units.agg(
      count(lit(1)).as("n"),
      sum(when(!isB, 1L).otherwise(0L)).as("n_a"),
      sum(when(isB, 1L).otherwise(0L)).as("n_b"),
      sum(y).as("__sy"), sum(yd * yd).as("__syy"))
    val nD = col("n").cast("double")
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val chi2 = (naD - nbD) * (naD - nbD) / (naD + nbD)
    val p = normP2(sqrt(chi2))
    val sy = col("__sy").cast("double") / lit(1e6)
    val syy = col("__syy").cast("double") / lit(1e12)
    val v = (syy - sy * sy / nD) / (nD - lit(1.0))
    val sd = sqrt(v)
    val mean = sy / nD
    val mde = lit(2.801585) * sqrt(v * (lit(1.0) / naD + lit(1.0) / nbD))
    val okSrm = col("n") > 0L
    val okMde = col("n_a") > 0L && col("n_b") > 0L && col("n") > 1L && v > 0
    m.select(col("n"), col("n_a"), col("n_b"),
      when(okSrm, pr6(chi2)).otherwise(lit(null).cast("double"))
        .as("srm_chi2_6"),
      when(okSrm, pr6(p)).otherwise(lit(null).cast("double"))
        .as("srm_p6"),
      when(okSrm, pr6(p) < lit(0.001))
        .otherwise(lit(null).cast("boolean")).as("srm_flag"),
      when(okMde, pr6(sd)).otherwise(lit(null).cast("double")).as("sd6"),
      when(okMde, pr6(mde)).otherwise(lit(null).cast("double"))
        .as("mde_abs6"),
      when(okMde && mean > 0, pr6(mde / mean))
        .otherwise(lit(null).cast("double")).as("mde_rel6"))
  }

  /** SQL-text twin of [[experimentHealth]] (moment column names →
    * output expressions, operation-ordered identically).
    */
  def experimentHealthSql(
      n: String, na: String, nb: String, sy: String, syy: String)
      : Map[String, String] = {
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    def p6(e: String) = s"floor(($e) * 1e6 + 0.5)/1e6"
    val nD = dd(n); val naD = dd(na); val nbD = dd(nb)
    val chi2 = s"(($naD - $nbD) * ($naD - $nbD) / ($naD + $nbD))"
    val p = normP2Sql(s"sqrt($chi2)")
    val vy = s"(${dd(sy)} / 1e6)"
    val vyy = s"(${dd(syy)} / 1e12)"
    val v = s"(($vyy - $vy * $vy / $nD) / ($nD - 1e0))"
    val mean = s"($vy / $nD)"
    val mde = s"(2.801585 * sqrt($v * (1e0 / $naD + 1e0 / $nbD)))"
    val okSrm = s"($n > 0)"
    val okMde = s"($na > 0 AND $nb > 0 AND $n > 1 AND $v > 0)"
    Map(
      "srm_chi2_6" -> s"CASE WHEN $okSrm THEN ${p6(chi2)} END",
      "srm_p6" -> s"CASE WHEN $okSrm THEN ${p6(p)} END",
      "srm_flag" -> s"CASE WHEN $okSrm THEN ${p6(p)} < 0.001 END",
      "sd6" -> s"CASE WHEN $okMde THEN ${p6(s"sqrt($v)")} END",
      "mde_abs6" -> s"CASE WHEN $okMde THEN ${p6(mde)} END",
      "mde_rel6" -> (s"CASE WHEN $okMde AND $mean > 0 " +
        s"THEN ${p6(s"$mde / $mean")} END"))
  }

  /** Difference-in-differences over a 2×2 (arm × period) design:
    * did = (m_b,post − m_b,pre) − (m_a,post − m_a,pre), the
    * interaction that separates a treatment effect from a
    * pre-existing arm imbalance. Per-cell exact moments (n, Σy
    * int64 micro, Σy² decimal128) from ONE aggregate; the Welch-
    * style standard error sums the four cell variance/n terms in
    * fixed a0→a1→b0→b1 order; p via [[normP2]]. Any cell with
    * n ≤ 1 (or zero variance everywhere) reads NULL effect columns
    * with the four means still reported.
    *
    * `preCol` is 1 for the pre period, 0 for post.
    *
    * Output: ONE row (n_a0, n_a1, n_b0, n_b1, mean_a_pre6,
    * mean_a_post6, mean_b_pre6, mean_b_post6, did6, t6, p6,
    * significant).
    */
  def diffInDiff(
      units: DataFrame,
      armCol: String,
      preCol: String,
      microCol: String): DataFrame = {
    val y = col(microCol).cast("long")
    val yd = y.cast("decimal(38,0)")
    val arm = col(armCol).cast("long")
    val pre = col(preCol).cast("long")
    def cell(a: Long, p: Long) = arm === a && pre === p
    val tags = Seq(("a0", 0L, 1L), ("a1", 0L, 0L), ("b0", 1L, 1L),
      ("b1", 1L, 0L))
    val momCols = tags.flatMap { case (t, a, p) => Seq(
      sum(when(cell(a, p), 1L).otherwise(0L)).as(s"n_$t"),
      sum(when(cell(a, p), y).otherwise(0L)).as(s"__s_$t"),
      sum(when(cell(a, p), yd * yd)
        .otherwise(lit(0).cast("decimal(38,0)"))).as(s"__q_$t"))
    }
    val m = units.agg(momCols.head, momCols.tail: _*)
    def nD(t: String) = col(s"n_$t").cast("double")
    def mean(t: String) =
      col(s"__s_$t").cast("double") / lit(1e6) / nD(t)
    def vOf(t: String) = {
      val s = col(s"__s_$t").cast("double") / lit(1e6)
      (col(s"__q_$t").cast("double") / lit(1e12) -
        s * s / nD(t)) / (nD(t) - lit(1.0))
    }
    val did = (mean("b1") - mean("b0")) - (mean("a1") - mean("a0"))
    val se2 = vOf("a0") / nD("a0") + vOf("a1") / nD("a1") +
      vOf("b0") / nD("b0") + vOf("b1") / nD("b1")
    val tt = did / sqrt(se2)
    val p = normP2(tt)
    val ok = tags.map { case (t, _, _) => col(s"n_$t") > 1L }
      .reduce(_ && _) && se2 > 0
    m.select((tags.map { case (t, _, _) => col(s"n_$t") } ++ Seq(
      pr6(mean("a0")).as("mean_a_pre6"),
      pr6(mean("a1")).as("mean_a_post6"),
      pr6(mean("b0")).as("mean_b_pre6"),
      pr6(mean("b1")).as("mean_b_post6"),
      when(ok, pr6(did)).otherwise(lit(null).cast("double")).as("did6"),
      when(ok, pr6(tt)).otherwise(lit(null).cast("double")).as("t6"),
      when(ok, pr6(p)).otherwise(lit(null).cast("double")).as("p6"),
      when(ok, pr6(p) <= lit(0.05))
        .otherwise(lit(null).cast("boolean")).as("significant"))): _*)
  }

  /** Cochran–Mantel–Haenszel test over STRATIFIED 2×2 conversion
    * tables: pools the arm→conversion association across strata
    * (cohorts, segments, countries) without mixing their base rates
    * — the guard against Simpson's paradox that a single pooled 2×2
    * (q189) walks straight into. Per stratum k with arm-1 count n1,
    * arm-0 count n0, converted m1, total n:
    *
    *   χ² = (Σ(a_k − n1_k·m1_k/n_k))² / Σ V_k,
    *   V_k = n1·n0·m1·m0 / (n²(n−1))
    *
    * plus the Mantel–Haenszel pooled odds ratio
    * Σ(a_k d_k/n_k) / Σ(b_k c_k/n_k). No continuity correction (a
    * fixed convention beats a knife-edge |·|−0.5 flip).
    *
    * Determinism: the 2×2 cells are exact integer aggregates; each
    * stratum's (a−E), V, and OR terms snap to integer NANO-units
    * before the cross-stratum sums (q190 discipline); the final
    * χ²/p/OR chain is one row. Strata with n ≤ 1 contribute nothing
    * (V undefined). Degenerate totals (ΣV = 0, or a zero OR
    * denominator) read NULL.
    *
    * Output: ONE row (n_strata, n_units, chi2_6, p6, significant,
    * or_mh6).
    */
  def cmhTest(
      units: DataFrame,
      stratumCol: String,
      armCol: String,
      convCol: String): DataFrame = {
    val arm = col(armCol).cast("long")
    val cv = col(convCol).cast("boolean").cast("long")
    val cells = units.groupBy(col(stratumCol).as("__k"))
      .agg(
        sum(when(arm === 1L && cv === 1L, 1L).otherwise(0L)).as("__a"),
        sum(when(arm === 1L && cv === 0L, 1L).otherwise(0L)).as("__b"),
        sum(when(arm === 0L && cv === 1L, 1L).otherwise(0L)).as("__c"),
        sum(when(arm === 0L && cv === 0L, 1L).otherwise(0L)).as("__d"))
    val n1 = col("__a") + col("__b")
    val n0 = col("__c") + col("__d")
    val m1 = col("__a") + col("__c")
    val m0 = col("__b") + col("__d")
    val nk = n1 + n0
    val nD = nk.cast("double")
    def nano(c: Column): Column =
      floor(c * lit(1e9) + lit(0.5)).cast("long")
    val usable = nk > 1L
    val terms = cells.select(
      when(usable, nano(col("__a").cast("double") -
        n1.cast("double") * m1.cast("double") / nD))
        .otherwise(0L).as("__dev9"),
      when(usable, nano(n1.cast("double") * n0.cast("double") *
        m1.cast("double") * m0.cast("double") /
        (nD * nD * (nD - lit(1.0))))).otherwise(0L).as("__v9"),
      when(usable, nano(col("__a").cast("double") *
        col("__d").cast("double") / nD)).otherwise(0L).as("__ad9"),
      when(usable, nano(col("__b").cast("double") *
        col("__c").cast("double") / nD)).otherwise(0L).as("__bc9"),
      when(usable, 1L).otherwise(0L).as("__use"),
      nk.as("__nk"))
    val s = terms.agg(sum(col("__use")).as("n_strata"),
      sum(col("__nk")).as("n_units"),
      sum(col("__dev9")).as("__sd9"), sum(col("__v9")).as("__sv9"),
      sum(col("__ad9")).as("__sad9"), sum(col("__bc9")).as("__sbc9"))
    val dev = col("__sd9").cast("double") / lit(1e9)
    val v = col("__sv9").cast("double") / lit(1e9)
    val chi2 = dev * dev / v
    val p = normP2(sqrt(chi2))
    val orMh = (col("__sad9").cast("double") / lit(1e9)) /
      (col("__sbc9").cast("double") / lit(1e9))
    val okChi = col("__sv9") > 0L
    val okOr = col("__sbc9") > 0L
    s.select(col("n_strata"), col("n_units"),
      when(okChi, pr6(chi2)).otherwise(lit(null).cast("double"))
        .as("chi2_6"),
      when(okChi, pr6(p)).otherwise(lit(null).cast("double")).as("p6"),
      when(okChi, pr6(p) <= lit(0.05))
        .otherwise(lit(null).cast("boolean")).as("significant"),
      when(okOr, pr6(orMh)).otherwise(lit(null).cast("double"))
        .as("or_mh6"))
  }

  /** Benjamini–Hochberg step-up FDR control over a hypothesis frame:
    * rank hypotheses by ascending p (ties broken by `keyCols` for a
    * total order), adjusted p(i) = min over j ≥ i of p(j)·m/j
    * (clamped at 1), reject where the ROUNDED adjusted p ≤ α.
    * NULL p rows (degenerate tests) pass through with NULL
    * adjusted/rejected and do not count toward m.
    *
    * The rank and the suffix-min ride one window over the
    * hypothesis frame — test-family-sized (a grouping grid's cells),
    * never corpus-sized; min/max are order-free so no snapping is
    * needed before them.
    *
    * Output: input columns + (rank, adj_p6, rejected).
    */
  def bhFdr(
      df: DataFrame,
      keyCols: Seq[String],
      pCol: String,
      alpha: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tested = df.filter(col(pCol).isNotNull)
    val mDf = tested.agg(count(lit(1)).as("__m"))
    val ordCols = col(pCol) +: keyCols.map(col)
    val w = Window.orderBy(ordCols: _*)
    val wSuffix = Window.orderBy(ordCols.map(_.desc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = tested.crossJoin(broadcast(mDf))
      .withColumn("rank", row_number().over(w))
      .withColumn("__raw",
        col(pCol) * col("__m").cast("double") / col("rank").cast("double"))
      .withColumn("__adj", least(min(col("__raw")).over(wSuffix), lit(1.0)))
      .withColumn("adj_p6", pr6(col("__adj")))
      .withColumn("rejected", col("adj_p6") <= lit(alpha))
      .drop("__m", "__raw", "__adj")
    val nulls = df.filter(col(pCol).isNull)
      .withColumn("rank", lit(null).cast("int"))
      .withColumn("adj_p6", lit(null).cast("double"))
      .withColumn("rejected", lit(null).cast("boolean"))
    ranked.unionByName(nulls)
  }

  /** χ² goodness-of-fit against the UNIFORM distribution over
    * `nCells` integer cells, per key, with a Wilson–Hilferty normal
    * approximation for the arbitrary-dof p-value (WH 1931: χ²/k is
    * approximately-normal after a cube root; |error| < 1e-3 for
    * k ≥ 5 — far coarser than the A&S polynomial, fine for an
    * alerting p). The "is traffic actually flat across the week"
    * screen that q213's 1-dof SRM test can't ask.
    *
    * INPUT CONTRACT: `cellCol` values must already lie in
    * [0, nCells) — callers bucket with pmod, not % (a negative %
    * result would fall outside the grid and the zero-fill left join
    * would silently exclude it from BOTH n and the χ² sum, quietly
    * weakening the test). Out-of-range cells are NOT detected here:
    * detection would cost a validation pass per call on the hot
    * aggregate, and every in-repo caller buckets with pmod.
    *
    * Exactness: cells zero-fill (a missing cell counts 0 — the q190
    * grid convention); χ² = Σ(m·o − n)² / (m·n) rides the square sum
    * in decimal(38,0) (exact at any count), lifted to double only in
    * the final row-local chain, 6dp-snapped; dof = m−1; the upper
    * tail comes from [[normP2]]. `significant` compares the ROUNDED
    * p against 0.05.
    *
    * Scale shape: one corpus aggregate to the (key, cell) frame, one
    * zero-fill left join against the keys × cells grid, one key
    * aggregate. Nothing else.
    *
    * Output: (keyCol, n, chisq6, z6, p6, significant); NULL
    * z/p/significant when a key has n = 0.
    */
  def chisqUniformGof(
      df: DataFrame,
      keyCol: String,
      cellCol: String,
      nCells: Int): DataFrame = {
    require(nCells >= 2, s"nCells must be >= 2, got $nCells")
    val obs = df.groupBy(col(keyCol).as("__k"),
      col(cellCol).cast("long").as("__c"))
      .agg(count(lit(1)).as("__o"))
    val keys = obs.select(col("__k")).distinct()
    val grid = keys.crossJoin(
      spark_range_cells(nCells))
    val filled = grid.join(obs, Seq("__k", "__c"), "left")
      .select(col("__k"), coalesce(col("__o"), lit(0L)).as("__o"))
    val tot = filled.groupBy(col("__k")).agg(sum(col("__o")).as("__n"))
    val dev = filled.join(tot, Seq("__k"))
      .withColumn("__d", lit(nCells.toLong) * col("__o") - col("__n"))
    val m = dev.groupBy(col("__k"))
      .agg(max(col("__n")).as("n"),
        sum(col("__d").cast("decimal(38,0)") * col("__d")).as("__ss"))
    val k = (nCells - 1).toDouble
    val nD = col("n").cast("double")
    val chisq = col("__ss").cast("double") /
      (lit(nCells.toDouble) * nD)
    // cube root as pow(x, 1/3): JVM Math.pow and DuckDB pow are
    // bit-identical on this box (probed), while DuckDB's cbrt() is
    // NOT correctly rounded (cbrt(27) reads 3.0000000000000004)
    val z = (pow(chisq / lit(k), lit(1.0) / lit(3.0)) -
      (lit(1.0) - lit(2.0) / lit(9.0 * k))) /
      sqrt(lit(2.0) / lit(9.0 * k))
    val p = when(z >= 0, normP2(z) / lit(2.0))
      .otherwise(lit(1.0) - normP2(z) / lit(2.0))
    val ok = col("n") > 0
    m.select(col("__k").as(keyCol), col("n"),
      when(ok, pr6(chisq)).otherwise(lit(null).cast("double"))
        .as("chisq6"),
      when(ok, pr6(z)).otherwise(lit(null).cast("double")).as("z6"),
      when(ok, pr6(p)).otherwise(lit(null).cast("double")).as("p6"),
      when(ok, pr6(p) < lit(0.05))
        .otherwise(lit(null).cast("boolean")).as("significant"))
  }

  /** A 0..n-1 single-column frame (__c) without a driver-side
    * collection — `spark.range` through the active session.
    */
  private def spark_range_cells(n: Int) = {
    val s = org.apache.spark.sql.SparkSession.active
    s.range(n).select(col("id").as("__c"))
  }
}
