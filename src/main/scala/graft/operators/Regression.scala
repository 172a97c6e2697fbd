package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form regression operators: 2-feature OLS via the normal
  * equations (one aggregate pass + a Cramer solve — no iteration, no
  * driver loop), and isotonic regression over a binned curve via the
  * max–min minimax identity (the calibration-map fitter behind
  * monotone score calibration).
  *
  * Determinism discipline: every cross-row moment is an exact
  * integer sum — features are small integers, the outcome is a
  * pre-snapped micro-unit long, and the y² / cross moments ride
  * decimal(38,0) where int64 could overflow. The solve itself is ONE
  * row of double arithmetic with identical text in both engines,
  * 6dp-snapped.
  */
object Regression {

  private def pr6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** OLS fit of y = β₀ + β₁x₁ + β₂x₂ by the normal equations,
    * solved with Cramer's rule on the 3×3 Gram matrix.
    *
    * `yMicroCol` is the micro-unit outcome (int64); `x1Col`/`x2Col`
    * small-integer features (e.g. hour-of-day, weekday). Moments:
    * n, Σx₁, Σx₂, Σx₁², Σx₁x₂, Σx₂² in int64 (features are small);
    * Σy, Σx₁y, Σx₂y in int64 micro; Σy² in decimal(38,0) micro².
    * The β/R² chain is row-local double math; a singular Gram
    * matrix (collinear features, e.g. a constant column) reads NULL
    * betas — det is compared against exact 0 because its inputs are
    * exact integers carried into doubles.
    *
    * Output: ONE row (n, beta0_6, beta1_6, beta2_6, r2_6).
    *
    * Scale shape: one map-side-combinable aggregate; nothing else.
    * For k features beyond 2, the same recipe wants a real linear
    * solver — at k ≤ 3 Cramer stays a few codegen'd multiplies.
    */
  def olsFit(
      df: DataFrame,
      yMicroCol: String,
      x1Col: String,
      x2Col: String): DataFrame = {
    val x1 = col(x1Col).cast("long")
    val x2 = col(x2Col).cast("long")
    val y = col(yMicroCol).cast("long")
    val yd = y.cast("decimal(38,0)")
    val m = df.agg(
      count(lit(1)).as("n"),
      sum(x1).as("s1"), sum(x2).as("s2"),
      sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"),
      sum(x2 * x2).as("s22"),
      sum(y).as("sy"), sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"),
      sum(yd * yd).as("syy"))
    val nD = col("n").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    val s11 = col("s11").cast("double")
    val s12 = col("s12").cast("double")
    val s22 = col("s22").cast("double")
    val sy = col("sy").cast("double") / lit(1e6)
    val s1y = col("s1y").cast("double") / lit(1e6)
    val s2y = col("s2y").cast("double") / lit(1e6)
    val syy = col("syy").cast("double") / lit(1e12)
    val det = nD * (s11 * s22 - s12 * s12) -
      s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
    val b0 = (sy * (s11 * s22 - s12 * s12) -
      s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)) / det
    val b1 = (nD * (s1y * s22 - s12 * s2y) -
      sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)) / det
    val b2 = (nD * (s11 * s2y - s1y * s12) -
      s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)) / det
    val sse = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    val sst = syy - sy * sy / nD
    val ok = col("n") > 2L && det =!= lit(0.0)
    m.select(col("n"),
      when(ok, pr6(b0)).otherwise(lit(null).cast("double")).as("beta0_6"),
      when(ok, pr6(b1)).otherwise(lit(null).cast("double")).as("beta1_6"),
      when(ok, pr6(b2)).otherwise(lit(null).cast("double")).as("beta2_6"),
      when(ok && sst > 0, pr6(lit(1.0) - sse / sst))
        .otherwise(lit(null).cast("double")).as("r2_6"))
  }

  /** SQL-text twin of [[olsFit]]'s solve chain for oracle queries:
    * given the ten moment column names, the output expression per
    * readout column, operation-ordered identically to the Column
    * chain.
    */
  def olsSql(
      n: String, s1: String, s2: String, s11: String, s12: String,
      s22: String, sy: String, s1y: String, s2y: String,
      syy: String): Map[String, String] = {
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    def p6(e: String) = s"floor(($e) * 1e6 + 0.5)/1e6"
    val nD = dd(n)
    val v1 = dd(s1); val v2 = dd(s2)
    val v11 = dd(s11); val v12 = dd(s12); val v22 = dd(s22)
    val vy = s"(${dd(sy)} / 1e6)"
    val v1y = s"(${dd(s1y)} / 1e6)"
    val v2y = s"(${dd(s2y)} / 1e6)"
    val vyy = s"(${dd(syy)} / 1e12)"
    val det = s"($nD * ($v11 * $v22 - $v12 * $v12) - " +
      s"$v1 * ($v1 * $v22 - $v12 * $v2) + $v2 * ($v1 * $v12 - $v11 * $v2))"
    val b0 = s"(($vy * ($v11 * $v22 - $v12 * $v12) - " +
      s"$v1 * ($v1y * $v22 - $v12 * $v2y) + " +
      s"$v2 * ($v1y * $v12 - $v11 * $v2y)) / $det)"
    val b1 = s"(($nD * ($v1y * $v22 - $v12 * $v2y) - " +
      s"$vy * ($v1 * $v22 - $v12 * $v2) + " +
      s"$v2 * ($v1 * $v2y - $v1y * $v2)) / $det)"
    val b2 = s"(($nD * ($v11 * $v2y - $v1y * $v12) - " +
      s"$v1 * ($v1 * $v2y - $v1y * $v2) + " +
      s"$vy * ($v1 * $v12 - $v11 * $v2)) / $det)"
    val sse = s"($vyy - ($b0 * $vy + $b1 * $v1y + $b2 * $v2y))"
    val sst = s"($vyy - $vy * $vy / $nD)"
    val ok = s"($n > 2 AND $det <> 0e0)"
    Map(
      "beta0_6" -> s"CASE WHEN $ok THEN ${p6(b0)} END",
      "beta1_6" -> s"CASE WHEN $ok THEN ${p6(b1)} END",
      "beta2_6" -> s"CASE WHEN $ok THEN ${p6(b2)} END",
      "r2_6" -> (s"CASE WHEN $ok AND $sst > 0 " +
        s"THEN ${p6(s"1e0 - $sse / $sst")} END"))
  }

  /** Per-key simple OLS trend: for every key, the slope/intercept/R²
    * of a micro-unit outcome over an integer regressor — the
    * "which segments are drifting, and how fast" readout that q208's
    * single global fit can't give. One map-side-combinable aggregate
    * produces every key's six moments; the solve is row-local double
    * arithmetic in [[olsSimpleSql]]'s exact operation order,
    * 6dp-snapped. Keys with n < 2 or a degenerate regressor
    * (den = 0) read NULL fits; constant outcomes read NULL R²
    * (SST = 0) — the [[olsFit]] conventions, per key.
    *
    * Exactness: n, Σx, Σx², Σy, Σxy are int64 (x small-integer, y
    * micro); Σy² rides decimal(38,0) like [[olsFit]]'s. Keep x
    * OFFSET-SMALL (e.g. day − min(day), not raw epoch-day) so the
    * Σxy products hold: |x|·|y_micro|·rows < 2⁶³.
    *
    * Output: (keyCol, n, slope6, intercept6, r2_6), one row per key;
    * callers order. slope6 is outcome units per x unit.
    */
  def groupedOls(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yMicroCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yMicroCol).cast("long")
    val yd = y.cast("decimal(38,0)")
    val m = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(x * x).as("sxx"),
        sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(yd * yd).as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val sxxD = col("sxx").cast("double")
    val vy = col("sy").cast("double") / lit(1e6)
    val vxy = col("sxy").cast("double") / lit(1e6)
    val vyy = col("syy").cast("double") / lit(1e12)
    val den = nD * sxxD - sxD * sxD
    val slope = (nD * vxy - sxD * vy) / den
    val inter = (vy - slope * sxD) / nD
    val sse = vyy - (inter * vy + slope * vxy)
    val sst = vyy - vy * vy / nD
    val ok = col("n") >= 2L && den =!= lit(0.0)
    m.select(col(keyCol), col("n"),
      when(ok, pr6(slope)).otherwise(lit(null).cast("double"))
        .as("slope6"),
      when(ok, pr6(inter)).otherwise(lit(null).cast("double"))
        .as("intercept6"),
      when(ok && sst > 0, pr6(lit(1.0) - sse / sst))
        .otherwise(lit(null).cast("double")).as("r2_6"))
  }

  /** SQL-text twin of [[groupedOls]]'s solve for oracle queries:
    * given the six moment column names, the output expression per
    * readout column, operation-ordered identically.
    */
  def olsSimpleSql(
      n: String, sx: String, sxx: String, sy: String, sxy: String,
      syy: String): Map[String, String] = {
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    def p6(e: String) = s"floor(($e) * 1e6 + 0.5)/1e6"
    val nD = dd(n); val sxD = dd(sx); val sxxD = dd(sxx)
    val vy = s"(${dd(sy)} / 1e6)"
    val vxy = s"(${dd(sxy)} / 1e6)"
    val vyy = s"(${dd(syy)} / 1e12)"
    val den = s"($nD * $sxxD - $sxD * $sxD)"
    val slope = s"(($nD * $vxy - $sxD * $vy) / $den)"
    val inter = s"(($vy - $slope * $sxD) / $nD)"
    val sse = s"($vyy - ($inter * $vy + $slope * $vxy))"
    val sst = s"($vyy - $vy * $vy / $nD)"
    val ok = s"($n >= 2 AND $den <> 0e0)"
    Map(
      "slope6" -> s"CASE WHEN $ok THEN ${p6(slope)} END",
      "intercept6" -> s"CASE WHEN $ok THEN ${p6(inter)} END",
      "r2_6" -> (s"CASE WHEN $ok AND $sst > 0 " +
        s"THEN ${p6(s"1e0 - $sse / $sst")} END"))
  }

  /** Logistic regression of a binary label on two small-integer
    * features (+ intercept) by `steps` Newton–IRLS rounds from
    * β = 0 — the GLM companion of [[olsFit]]: same one-aggregate-
    * per-round scale shape, same Cramer 3×3 solve, no gradient
    * schedule to tune (Newton needs no learning rate; logistic
    * likelihood is globally concave).
    *
    * Determinism contract (oracle-replayable): each round's per-row
    * IRLS weight μ(1−μ) and residual y−μ are snapped to int64 micro
    * units BEFORE summation, so every cross-row moment is an exact
    * integer sum (order-free in any engine at any partition layout);
    * the Newton step solves the integer moments in one row of double
    * arithmetic written in [[irlsSql]]'s exact operation order, and
    * β is re-snapped to the 1e-6 grid after every round (the
    * [[GraphOps.pageRank]] per-iteration discipline, so drift cannot
    * compound across rounds). The only transcendental is `exp`
    * inside the sigmoid — the [[Hypothesis.normP2]] precedent; a
    * last-ulp `exp` divergence would have to land a row's weight
    * within one ulp of a .5 micro boundary to flip a moment by 1,
    * and the final 6dp snap absorbs even that.
    *
    * Moment bound: per row, wm ≤ 2.5e5 and |x| small (hour/weekday
    * sized), so int64 holds to ~1e11 rows; beyond, ride the products
    * on decimal(38,0) like [[olsFit]]'s Σy².
    *
    * A singular (or non-finite) Gram matrix at any round reads NULL
    * betas/accuracy with the counts still reported, like [[olsFit]].
    *
    * Output: ONE row (n, n_pos, beta0_6, beta1_6, beta2_6, acc6 —
    * the training accuracy of the η > 0 cut under the final betas).
    *
    * Scale shape: `steps`+1 map-side-combinable aggregates over a
    * lineage-truncated 3-column frame; β travels as literals
    * (driver state = 3 doubles — centroid-sized, the allowed kind).
    */
  def logisticFit(
      df: DataFrame,
      yCol: String,
      x1Col: String,
      x2Col: String,
      steps: Int): DataFrame = {
    require(steps >= 1 && steps <= 8, s"steps must be in [1,8], got $steps")
    val base = df
      .filter(col(yCol).isNotNull && col(x1Col).isNotNull &&
        col(x2Col).isNotNull)
      .select(when(col(yCol).cast("boolean"), 1L).otherwise(0L).as("__y"),
        col(x1Col).cast("long").as("__x1"),
        col(x2Col).cast("long").as("__x2"))
      .localCheckpoint(true)
    def snap6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def etaOf(b: (Double, Double, Double)): Column =
      lit(b._1) + lit(b._2) * col("__x1").cast("double") +
        lit(b._3) * col("__x2").cast("double")
    var b = (0.0, 0.0, 0.0)
    var ok = true
    var step = 0
    while (step < steps && ok) {
      val mu = lit(1.0) / (lit(1.0) + exp(-etaOf(b)))
      val wm = floor(mu * (lit(1.0) - mu) * lit(1e6) + lit(0.5)).cast("long")
      val rm = floor((col("__y").cast("double") - mu) * lit(1e6) + lit(0.5))
        .cast("long")
      val r = base.agg(
        sum(wm).as("sw"),
        sum(wm * col("__x1")).as("sw1"), sum(wm * col("__x2")).as("sw2"),
        sum(wm * col("__x1") * col("__x1")).as("sw11"),
        sum(wm * col("__x1") * col("__x2")).as("sw12"),
        sum(wm * col("__x2") * col("__x2")).as("sw22"),
        sum(rm).as("sr"),
        sum(rm * col("__x1")).as("sr1"), sum(rm * col("__x2")).as("sr2"))
        .head()
      if (r.isNullAt(0)) ok = false
      else {
        val sw = r.getLong(0).toDouble
        val sw1 = r.getLong(1).toDouble; val sw2 = r.getLong(2).toDouble
        val sw11 = r.getLong(3).toDouble; val sw12 = r.getLong(4).toDouble
        val sw22 = r.getLong(5).toDouble
        val sr = r.getLong(6).toDouble
        val sr1 = r.getLong(7).toDouble; val sr2 = r.getLong(8).toDouble
        // identical operation order to [[irlsSql]]'s d0/d1/d2 text
        val det = sw * (sw11 * sw22 - sw12 * sw12) -
          sw1 * (sw1 * sw22 - sw12 * sw2) + sw2 * (sw1 * sw12 - sw11 * sw2)
        if (det == 0.0 || !java.lang.Double.isFinite(det)) ok = false
        else {
          val d0 = (sr * (sw11 * sw22 - sw12 * sw12) -
            sw1 * (sr1 * sw22 - sw12 * sr2) +
            sw2 * (sr1 * sw12 - sw11 * sr2)) / det
          val d1 = (sw * (sr1 * sw22 - sw12 * sr2) -
            sr * (sw1 * sw22 - sw12 * sw2) +
            sw2 * (sw1 * sr2 - sr1 * sw2)) / det
          val d2 = (sw * (sw11 * sr2 - sr1 * sw12) -
            sw1 * (sw1 * sr2 - sr1 * sw2) +
            sr * (sw1 * sw12 - sw11 * sw2)) / det
          b = (snap6(b._1 + d0), snap6(b._2 + d1), snap6(b._3 + d2))
          if (!java.lang.Double.isFinite(b._1) ||
            !java.lang.Double.isFinite(b._2) ||
            !java.lang.Double.isFinite(b._3)) ok = false
        }
      }
      step += 1
    }
    val correct = (etaOf(b) > lit(0.0)) === (col("__y") === lit(1L))
    val m = base.agg(count(lit(1)).as("n"),
      coalesce(sum(col("__y")), lit(0L)).as("n_pos"),
      coalesce(sum(when(correct, 1L).otherwise(0L)), lit(0L))
        .as("n_correct"))
    val okNow = ok // stabilize for the closure
    def bLit(v: Double): Column =
      if (okNow) lit(v) else lit(null).cast("double")
    m.select(col("n"), col("n_pos"),
      bLit(b._1).as("beta0_6"), bLit(b._2).as("beta1_6"),
      bLit(b._3).as("beta2_6"),
      when(lit(okNow) && col("n") > 0L,
        pr6(col("n_correct").cast("double") / col("n").cast("double")))
        .otherwise(lit(null).cast("double")).as("acc6"))
  }

  /** SQL-text twin of [[logisticFit]] for oracle queries: the CTE
    * chain (no leading WITH) unrolling `steps` IRLS rounds over
    * `view`, which must expose integer columns y (0/1), x1, x2.
    * Exposes `ir$steps` (b0, b1, b2 — the final snapped betas) and
    * `irf` (n, n_pos, n_correct); the caller writes the readout
    * SELECT. Operation order matches the Column/driver chain
    * token-for-token.
    */
  def irlsSql(view: String, steps: Int): String = {
    require(steps >= 1 && steps <= 8, s"steps must be in [1,8], got $steps")
    val eta = "(b0 + b1 * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE))"
    val mu = s"(1e0 / (1e0 + exp(-($eta))))"
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    val d0 = s"((${dd("sr")} * (${dd("sw11")} * ${dd("sw22")} - " +
      s"${dd("sw12")} * ${dd("sw12")}) - ${dd("sw1")} * (${dd("sr1")} * " +
      s"${dd("sw22")} - ${dd("sw12")} * ${dd("sr2")}) + ${dd("sw2")} * " +
      s"(${dd("sr1")} * ${dd("sw12")} - ${dd("sw11")} * ${dd("sr2")})) " +
      "/ det)"
    val d1 = s"((${dd("sw")} * (${dd("sr1")} * ${dd("sw22")} - " +
      s"${dd("sw12")} * ${dd("sr2")}) - ${dd("sr")} * (${dd("sw1")} * " +
      s"${dd("sw22")} - ${dd("sw12")} * ${dd("sw2")}) + ${dd("sw2")} * " +
      s"(${dd("sw1")} * ${dd("sr2")} - ${dd("sr1")} * ${dd("sw2")})) " +
      "/ det)"
    val d2 = s"((${dd("sw")} * (${dd("sw11")} * ${dd("sr2")} - " +
      s"${dd("sr1")} * ${dd("sw12")}) - ${dd("sw1")} * (${dd("sw1")} * " +
      s"${dd("sr2")} - ${dd("sr1")} * ${dd("sw2")}) + ${dd("sr")} * " +
      s"(${dd("sw1")} * ${dd("sw12")} - ${dd("sw11")} * ${dd("sw2")})) " +
      "/ det)"
    val det = s"(${dd("sw")} * (${dd("sw11")} * ${dd("sw22")} - " +
      s"${dd("sw12")} * ${dd("sw12")}) - ${dd("sw1")} * (${dd("sw1")} * " +
      s"${dd("sw22")} - ${dd("sw12")} * ${dd("sw2")}) + ${dd("sw2")} * " +
      s"(${dd("sw1")} * ${dd("sw12")} - ${dd("sw11")} * ${dd("sw2")}))"
    val head = "ir0 AS (SELECT 0e0 AS b0, 0e0 AS b1, 0e0 AS b2)"
    val rounds = (1 to steps).map { k =>
      s"""irr$k AS (SELECT x1, x2,
         |    CAST(floor($mu * (1e0 - $mu) * 1e6 + 0.5) AS BIGINT) AS wm,
         |    CAST(floor((CAST(y AS DOUBLE) - $mu) * 1e6 + 0.5) AS BIGINT)
         |      AS rm
         |  FROM $view, ir${k - 1}),
         |irm$k AS (SELECT CAST(sum(wm) AS BIGINT) AS sw,
         |    CAST(sum(wm * x1) AS BIGINT) AS sw1,
         |    CAST(sum(wm * x2) AS BIGINT) AS sw2,
         |    CAST(sum(wm * x1 * x1) AS BIGINT) AS sw11,
         |    CAST(sum(wm * x1 * x2) AS BIGINT) AS sw12,
         |    CAST(sum(wm * x2 * x2) AS BIGINT) AS sw22,
         |    CAST(sum(rm) AS BIGINT) AS sr,
         |    CAST(sum(rm * x1) AS BIGINT) AS sr1,
         |    CAST(sum(rm * x2) AS BIGINT) AS sr2
         |  FROM irr$k),
         |ird$k AS (SELECT sw, sw1, sw2, sw11, sw12, sw22, sr, sr1, sr2,
         |    $det AS det FROM irm$k),
         |ir$k AS (SELECT floor((b0 + $d0) * 1e6 + 0.5)/1e6 AS b0,
         |    floor((b1 + $d1) * 1e6 + 0.5)/1e6 AS b1,
         |    floor((b2 + $d2) * 1e6 + 0.5)/1e6 AS b2
         |  FROM ird$k, ir${k - 1})""".stripMargin
    }
    val fin =
      s"""irf AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(y) AS BIGINT) AS n_pos,
         |    CAST(sum(CASE WHEN ($eta > 0e0) = (y = 1) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_correct
         |  FROM $view, ir$steps)""".stripMargin
    (head +: rounds :+ fin).mkString(",\n")
  }

  /** Isotonic (monotone non-decreasing) regression over a BINNED
    * curve via the minimax identity: the fitted value at bin k is
    *
    *   ŷ_k = max_{i ≤ k} min_{j ≥ k} mean(y over bins i..j)
    *
    * — the closed form of the pool-adjacent-violators solution,
    * computed with bounded-size set arithmetic instead of PAV's
    * sequential merge loop (which does not distribute). With B bins
    * the interval frame is B², the (k, interval) expansion ≤ B³ —
    * all constants once the curve is binned, which is the point:
    * bin first (corpus-sized aggregate), fit on the B-row curve.
    *
    * Input: per-bin stats (binCol ascending long, weight `nCol`
    * int64, `sMicroCol` int64 micro sum of the outcome). Interval
    * means are exact-integer ratios evaluated row-locally; min/max
    * are order-free so nothing needs snapping before them.
    *
    * Output: per bin — (binCol, n, mean6 — the raw bin mean,
    * fitted6 — the isotonic fit, non-decreasing in bin order).
    */
  def isotonicFit(
      bins: DataFrame,
      binCol: String,
      nCol: String,
      sMicroCol: String): DataFrame = {
    val base = bins.select(col(binCol).cast("long").as("__bin"),
      col(nCol).cast("long").as("__n"), col(sMicroCol).cast("long")
        .as("__s"))
      .localCheckpoint(true) // B rows; feeds intervals + the k frame
    val lo = base.select(col("__bin").as("__i"))
    val hi = base.select(col("__bin").as("__j"))
    val spans = lo.crossJoin(hi).filter(col("__i") <= col("__j"))
    val members = spans.join(base,
        col("__bin") >= col("__i") && col("__bin") <= col("__j"))
      .groupBy(col("__i"), col("__j"))
      .agg(sum(col("__n")).as("__wn"), sum(col("__s")).as("__ws"))
      .filter(col("__wn") > 0L)
      .select(col("__i"), col("__j"),
        (col("__ws").cast("double") / lit(1e6) /
          col("__wn").cast("double")).as("__mean"))
    val ks = base.select(col("__bin").as("__k"))
    val fitted = ks.join(members,
        col("__i") <= col("__k") && col("__j") >= col("__k"))
      .groupBy(col("__k"), col("__i"))
      .agg(min(col("__mean")).as("__inner"))
      .groupBy(col("__k"))
      .agg(max(col("__inner")).as("__fit"))
    base.join(fitted, col("__bin") === col("__k"))
      .select(col("__bin").as(binCol), col("__n").as("n"),
        when(col("__n") > 0,
          pr6(col("__s").cast("double") / lit(1e6) /
            col("__n").cast("double")))
          .otherwise(lit(null).cast("double")).as("mean6"),
        pr6(col("__fit")).as("fitted6"))
  }
}
