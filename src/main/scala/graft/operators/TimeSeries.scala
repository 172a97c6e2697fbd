package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, StructField, StructType}

/** Distributed time-series subsequence similarity search (the
  * streaming-data similarity-search family — EDBT 2019/REPOSE ICDE
  * 2021 problem shape, re-expressed Spark-first): for each key's
  * event-time-ordered value series, score every length-`w` sliding
  * window by Pearson correlation against a fixed query pattern and
  * return the top-k windows per key — "where does this series look
  * most like the pattern" (trend/motif detection over metric
  * streams).
  *
  * The 100 TB shape: ONE shuffle (the per-key sort the window
  * functions need — the same key+time partitioning every other
  * per-key operator here uses), then w-1 `lead()` columns and pure
  * codegen arithmetic — no self-join, no per-key array
  * materialization, no UDF. Window count = row count, so the scored
  * frame never exceeds the input and the final top-k is a per-key
  * rank. Pattern length is a literal constant (a query, not data).
  *
  * Determinism contract (the q102 oracle replays it textually): sums
  * are explicit LEFT-ASSOCIATIVE chains in window-position order —
  * not aggregates — so both engines execute the identical IEEE op
  * sequence and the guard (`w·Σxx − Σx² > 0`, excluding
  * zero-variance windows) decides identically; the correlation is
  * rounded to 6 dp before ranking, ties break on the earlier start
  * position. Windows shorter than `w` (series tails) are excluded.
  */
object TimeSeries {

  /** Top-k pattern-correlated windows per key.
    *
    * Output: (key, rnk, start_pos, corr6) where `start_pos` is the
    * window's 1-based position in the key's (ts, id)-ordered series
    * and corr6 the 6-dp-rounded Pearson correlation with `pattern`.
    */
  def subsequenceSearch(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valCol: String,
      pattern: Seq[Double],
      k: Int): DataFrame = {
    val w = pattern.length
    require(w >= 2, "pattern must have at least 2 points")
    require(k >= 1, "k must be positive")
    val sy = pattern.sum
    val syy = pattern.map(p => p * p).sum
    val denY = math.sqrt(w * syy - sy * sy)
    require(denY > 0, "pattern must not be constant")

    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
    val xs: Seq[Column] = col(valCol).cast("double") +:
      (1 until w).map(i => lead(col(valCol).cast("double"), i).over(ord))
    // both windows partition on the ORIGINAL key attribute — aliasing
    // it below the shuffle would hide the partitioning from the rank
    // window and buy a second exchange (plan-asserted in the spec)
    val named = events.select(
      Seq(col(keyCol),
        row_number().over(ord).cast("long").as("start_pos")) ++
      xs.zipWithIndex.map { case (c, i) => c.as(s"__x$i") }: _*)
      // exclude tail windows (any missing lead) — null-safe even if
      // the value column itself carries nulls mid-series
      .filter((0 until w).map(i => col(s"__x$i").isNotNull).reduce(_ && _))

    def chain(terms: Seq[Column]): Column = terms.reduceLeft(_ + _)
    val sx = chain((0 until w).map(i => col(s"__x$i")))
    val sxx = chain((0 until w).map(i => col(s"__x$i") * col(s"__x$i")))
    val sxy = chain((0 until w).map(i => col(s"__x$i") * lit(pattern(i))))
    val varX = lit(w.toDouble) * sxx - sx * sx
    val corr = (lit(w.toDouble) * sxy - sx * lit(sy)) /
      (sqrt(varX) * lit(denY))
    val scored = named
      .withColumn("__varx", varX)
      .filter(col("__varx") > 0)
      .select(col(keyCol), col("start_pos"),
        (floor(corr * lit(1e6) + lit(0.5)) / lit(1e6)).as("corr6"))
    val rankW = Window.partitionBy(col(keyCol))
      .orderBy(col("corr6").desc, col("start_pos"))
    scored
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= k)
      .select(col(keyCol), col("rnk"), col("start_pos"), col("corr6"))
  }

  /** Rolling z-score anomaly detection: for each key's
    * (ts, id)-ordered series, score every point against the mean and
    * sample standard deviation of its `w` PRECEDING values and flag
    * |z| ≥ `zThreshold` — the classic streaming outlier monitor
    * (trailing window only, so a point never explains itself and the
    * detector is causally usable on live streams).
    *
    * Same determinism discipline as [[subsequenceSearch]]: the
    * trailing values come from `lag()` columns and the sums are
    * explicit LEFT-ASSOCIATIVE chains in lag order (never a window
    * aggregate, whose addend order — and, in DuckDB, segment-tree
    * association — floats), so both engines run the identical IEEE
    * sequence; z is rounded at 6dp BEFORE the threshold compare so
    * the flag cannot flip on a last-ulp difference. Points without a
    * full trailing window, and windows with zero variance, are
    * excluded (`w·Σxx − (Σx)² > 0` decides identically in both
    * engines).
    *
    * Scale shape: ONE shuffle (the per-key sort), then w lag columns
    * and pure codegen arithmetic — no self-join, state bounded by w
    * per row. Output: (key, id, value, z6, anomaly).
    */
  def rollingZScore(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valCol: String,
      w: Int,
      zThreshold: Double): DataFrame = {
    require(w >= 2, "window must have at least 2 points")
    require(zThreshold > 0, "zThreshold must be positive")
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
    val lags = (1 to w).map(i => lag(col(valCol).cast("double"), i).over(ord))
    val named = events.select(
      Seq(col(keyCol), col(idCol), col(valCol).cast("double").as("value")) ++
        lags.zipWithIndex.map { case (c, i) => c.as(s"__x$i") }: _*)
      .filter((0 until w).map(i => col(s"__x$i").isNotNull).reduce(_ && _))
    def chain(terms: Seq[Column]): Column = terms.reduceLeft(_ + _)
    val sx = chain((0 until w).map(i => col(s"__x$i")))
    val sxx = chain((0 until w).map(i => col(s"__x$i") * col(s"__x$i")))
    val varNum = lit(w.toDouble) * sxx - sx * sx
    val z = (col("value") - sx / lit(w.toDouble)) /
      sqrt(varNum / lit((w.toDouble) * (w - 1).toDouble))
    named
      .withColumn("__vn", varNum)
      .filter(col("__vn") > 0)
      .select(col(keyCol), col(idCol), col("value"),
        (floor(z * lit(1e6) + lit(0.5)) / lit(1e6)).as("z6"))
      .withColumn("anomaly", abs(col("z6")) >= lit(zThreshold))
  }

  /** Truncated exponentially-weighted moving average (EWMA) per key:
    * for each event the weighted mean of its value and the `lookback-1`
    * PRECEDING values in the key's (ts, id) order, weight `(1-α)^j` on
    * the j-th-newest point, normalized by the weights actually present
    * (pandas `ewm(adjust=True)` semantics, truncated to a finite
    * window). Truncation is the SCALE choice: the exact recursive EWMA
    * carries unbounded per-key state and an inherently sequential
    * prefix product, while the truncated form is `lookback` lag
    * columns over ONE per-key sort — bounded state, whole-stage
    * codegen — at a relative error ≤ (1-α)^lookback of the dropped
    * tail (α=0.5, L=6 → <1.6%).
    *
    * Determinism (q102/q121 discipline): numerator and denominator are
    * explicit LEFT-ASSOCIATIVE chains in lag order, never a window
    * aggregate; absent terms contribute an EXACT +0.0; the quotient is
    * rounded at 6dp. With α an exact dyadic (0.5 default) every weight
    * literal is bit-identical in both engines.
    *
    * Output: (key, id, value, n_terms, ewma6) — partial leading
    * windows are KEPT (adjust=true renormalizes), unlike the z-score's
    * full-window contract.
    */
  def ewmaSmooth(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valCol: String,
      alpha: Double,
      lookback: Int): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    require(lookback >= 1, s"lookback must be >= 1, got $lookback")
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
    val weights = (0 until lookback).map(j => math.pow(1.0 - alpha, j))
    val xs = col(valCol).cast("double") +:
      (1 until lookback).map(i => lag(col(valCol).cast("double"), i).over(ord))
    val named = events.select(
      Seq(col(keyCol), col(idCol), col(valCol).cast("double").as("value")) ++
        xs.zipWithIndex.map { case (c, i) => c.as(s"__x$i") }: _*)
    def chain(terms: Seq[Column]): Column = terms.reduceLeft(_ + _)
    val num = chain((0 until lookback).map(j =>
      coalesce(col(s"__x$j"), lit(0.0)) * lit(weights(j))))
    val den = chain((0 until lookback).map(j =>
      when(col(s"__x$j").isNull, lit(0.0)).otherwise(lit(weights(j)))))
    val nTerms = chain((0 until lookback).map(j =>
      when(col(s"__x$j").isNull, lit(0)).otherwise(lit(1))))
    named.select(col(keyCol), col(idCol), col("value"),
      nTerms.as("n_terms"),
      (floor(num / den * lit(1e6) + lit(0.5)) / lit(1e6)).as("ewma6"))
  }

  /** OHLC downsampling (candlestick bars): per (key, bucket) the
    * first/max/min/last value, where first/last are decided by the
    * TOTAL (tsCol, tieCol) order. One combinable hash aggregate —
    * open/close ride min/max over (ts, tie, value) structs, so the
    * shuffle carries one row per (key, bucket) per map task, never a
    * per-key window. `bucket` is `date_trunc(unit, ts)`.
    */
  def ohlcDownsample(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      unit: String = "hour"): DataFrame = {
    val ord = struct(col(tsCol), col(tieCol), col(valueCol).as("__v"))
    df.groupBy(col(keyCol),
        date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(ord).getField("__v").as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(ord).getField("__v").as("close"))
  }

  /** One-sided CUSUM changepoint detection (Page 1954): per key, the
    * cumulative positive drift above `target + slack`
    *
    *   s₀ = 0;   sᵢ = max(0, sᵢ₋₁ + (xᵢ − target − slack))
    *
    * with an alarm where sᵢ > threshold — the classic sequential
    * drift detector next to q121's rolling z-score (z catches point
    * spikes, CUSUM catches small persistent shifts).
    *
    * The recurrence is non-linear (the max(0,·) clamp), so no window
    * frame expresses it: each key's history is folded as a STREAMING
    * per-key scan — one hash exchange on the key, one external
    * per-partition sort on (key, ts, tie), then an O(1)-state
    * iterator fold — never a per-key array. A key with n rows costs
    * O(n log n) sort + O(n) fold with O(1) driver/executor state, so
    * an unbounded key history streams (and spills) instead of
    * materializing a multi-MB single row; the arithmetic chain is
    * written with the exact left-associative grouping the relational
    * oracle replays, so stream, batch, and oracle agree bit-for-bit.
    */
  def cusum(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      target: Double,
      slack: Double,
      threshold: Double): DataFrame = {
    val prepped = df.select(col(keyCol), col(tsCol),
      col(tieCol).cast("long").as(tieCol),
      col(valueCol).cast("double").as(valueCol))
    // same exchange the old collect_list aggregate paid, but the sort
    // is external (spills) and the fold streams — per-key state is
    // one double, not the key's history
    val sorted = prepped
      .repartition(col(keyCol))
      .sortWithinPartitions(
        col(keyCol), col(tsCol), col(tieCol), col(valueCol))
    val enc = Encoders.row(StructType(sorted.schema.fields ++ Array(
      StructField("s6", DoubleType), StructField("alarm", BooleanType))))
    sorted.mapPartitions { rows =>
      var key: Any = null
      var open = false
      var s = 0.0
      rows.map { r =>
        val k = r.get(0)
        if (!open || !java.util.Objects.equals(k, key)) {
          key = k; open = true; s = 0.0
        }
        // EXACT grouping replayed by the oracle:
        // s' = greatest(0, s + (x - target - slack)); a null x makes
        // the sum null and greatest(0, null) = 0, as the old HOF fold
        val xNull = r.isNullAt(3)
        s = if (xNull) 0.0
            else math.max(0.0, s + (r.getDouble(3) - target - slack))
        Row(k, r.get(1), r.get(2),
          if (xNull) null else java.lang.Double.valueOf(r.getDouble(3)),
          math.floor(s * 1e6 + 0.5) / 1e6, s > threshold)
      }
    }(enc)
  }

  /** Forecast-accuracy comparison: per key, the MAE of
    * [[holtSmooth]]'s one-step-ahead forecasts vs the seasonal-naive
    * baseline (x̂_t = x_{t−period}) over the days BOTH are defined,
    * and their ratio — the MASE shape (Hyndman & Koehler 2006): a
    * model that can't beat "same day last week" reads ≥ 1 and should
    * not ship.
    *
    * Determinism: each day's two absolute errors snap to int64 micro
    * BEFORE summation (order-free); both MAEs and the ratio are
    * row-local readouts of the exact sums (equal day counts cancel,
    * so mase6 is the plain sum ratio), 6dp-snapped.
    *
    * Scale shape: the Holt fold (one key exchange) + ONE more per-key
    * ordered window for the seasonal lag on the same day grain + a
    * key-grain aggregate.
    *
    * Output per key: (keyCol, n — compared days, mae_holt6,
    * mae_naive6, mase6 — NULL when the naive MAE is 0).
    */
  def holtVsSeasonalNaive(
      df: DataFrame,
      keyCol: String,
      tCol: String,
      xCol: String,
      alpha: Double,
      beta: Double,
      period: Int): DataFrame = {
    require(period >= 1, s"period must be >= 1, got $period")
    import org.apache.spark.sql.expressions.Window
    val holt = holtSmooth(df, keyCol, tCol, xCol, alpha, beta)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
    val both = holt
      .withColumn("__nv", lag(col("x"), period).over(w))
      .filter(col("fc6").isNotNull && col("__nv").isNotNull)
      .select(col(keyCol),
        floor(abs(col("x") - col("fc6")) * lit(1e6) + lit(0.5))
          .cast("long").as("__eh"),
        floor(abs(col("x") - col("__nv")) * lit(1e6) + lit(0.5))
          .cast("long").as("__en"))
    val p6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    both.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("__eh")).as("__sh"),
        sum(col("__en")).as("__sn"))
      .select(col(keyCol), col("n"),
        p6(col("__sh").cast("double") / col("n").cast("double") /
          lit(1e6)).as("mae_holt6"),
        p6(col("__sn").cast("double") / col("n").cast("double") /
          lit(1e6)).as("mae_naive6"),
        when(col("__sn") > 0,
          p6(col("__sh").cast("double") / col("__sn").cast("double")))
          .otherwise(lit(null).cast("double")).as("mase6"))
  }

  /** Index of dispersion (variance-to-mean ratio) per key over a
    * count series — the burstiness monitor: a Poisson-arrival stream
    * reads ≈ 1, machine-gun retries / thundering herds read ≫ 1,
    * quota-smoothed traffic ≪ 1 (Cox & Lewis 1966). The one-line
    * companion the anomaly detectors (q121/q194) assume but never
    * report.
    *
    * Exactness: per-key n, Σx, Σx² are exact int64 aggregates (x is
    * a count; Σx² holds to ~3e9 days of 1e6-level counts — beyond,
    * ride decimal like [[Regression.olsFit]]); mean/variance/ratio
    * are one row of double arithmetic, 6dp-snapped, with the
    * population-variance formula in fixed order. The overdispersion
    * flag compares the ROUNDED ratio (the q85 pred discipline).
    *
    * Scale shape: ONE map-side-combinable aggregate; nothing else.
    *
    * Output: (keyCol, n_days, mean6, var6, dispersion6,
    * overdispersed — NULL ratio/flag when the mean is 0).
    */
  def dispersionIndex(
      df: DataFrame,
      keyCol: String,
      countCol: String,
      threshold: Double = 1.5): DataFrame = {
    val x = col(countCol).cast("long")
    val m = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(x).as("__sx"), sum(x * x).as("__sxx"))
    val nD = col("n_days").cast("double")
    val mean = col("__sx").cast("double") / nD
    val varP = col("__sxx").cast("double") / nD -
      (col("__sx").cast("double") / nD) *
      (col("__sx").cast("double") / nD)
    val p6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    m.select(col(keyCol), col("n_days"),
      p6(mean).as("mean6"), p6(varP).as("var6"),
      when(col("__sx") > 0, p6(varP / mean))
        .otherwise(lit(null).cast("double")).as("dispersion6"),
      when(col("__sx") > 0, p6(varP / mean) > lit(threshold))
        .otherwise(lit(null).cast("boolean")).as("overdispersed"))
  }

  /** Holt's linear-trend exponential smoothing (Holt 1957) per key —
    * the forecasting member of the smoothing family: [[ewmaSmooth]]
    * tracks a level, this tracks level AND trend, and emits the
    * one-step-ahead forecast fc_t = l_{t−1} + b_{t−1} BEFORE folding
    * x_t in, so every row carries its own backtest error. Recurrence
    * (α level gain, β trend gain; init l₁ = x₁, b₁ = 0, fc₁ = null):
    *
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * Determinism: the fold is a streaming per-key scan in (t, x)
    * order — the [[cusum]] discipline (one key exchange, one external
    * per-partition sort, O(1) per-key state) — and the oracle replays
    * the SAME left-associative chain with a recursive CTE,
    * bit-identical, no tolerance (JVM doubles are strict IEEE-754
    * binary64, the identical op sequence to the oracle's). Pick
    * DYADIC gains (0.5, 0.25) and every product is exact. h-step
    * forecasts are row-local functions of the last row (l + h·b) —
    * consumers extend without re-folding.
    *
    * Scale shape: ONE key exchange + per-partition sort; per-key
    * state is TWO doubles (level, trend), never the series — an
    * unbounded key streams instead of materializing its history in
    * one row.
    *
    * Output: (keyCol, tCol, x, level6, trend6, fc6 — null on each
    * key's first row); callers order.
    */
  def holtSmooth(
      df: DataFrame,
      keyCol: String,
      tCol: String,
      xCol: String,
      alpha: Double,
      beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0,1], got $beta")
    val prepped = df.select(col(keyCol),
      col(tCol).cast("long").as(tCol), col(xCol).cast("double").as("x"))
    val sorted = prepped
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tCol), col("x"))
    val enc = Encoders.row(StructType(sorted.schema.fields ++ Array(
      StructField("level6", DoubleType), StructField("trend6", DoubleType),
      StructField("fc6", DoubleType))))
    val (a, g) = (alpha, beta)
    sorted.mapPartitions { rows =>
      var key: Any = null
      var open = false
      var first = true
      // boxed so a null x poisons the chain exactly as the old
      // expression fold did (null propagates through l'/b'/fc)
      var l: java.lang.Double = null
      var b: java.lang.Double = null
      def p6(v: java.lang.Double): java.lang.Double =
        if (v == null) null else math.floor(v * 1e6 + 0.5) / 1e6
      rows.map { r =>
        val k = r.get(0)
        if (!open || !java.util.Objects.equals(k, key)) {
          key = k; open = true; first = true; l = null; b = null
        }
        val xNull = r.isNullAt(2)
        var fc: java.lang.Double = null
        if (first) {
          // init l₁ = x₁, b₁ = 0, fc₁ = null
          l = if (xNull) null else java.lang.Double.valueOf(r.getDouble(2))
          b = 0.0
          first = false
        } else {
          fc = if (l == null || b == null) null
               else java.lang.Double.valueOf(l + b)
          if (xNull || l == null || b == null) { l = null; b = null }
          else {
            // EXACT chains replayed by the oracle:
            //   l' = α·x + (1−α)·(l + b)
            //   b' = β·(l' − l) + (1−β)·b
            val x = r.getDouble(2)
            val lv = a * x + (1.0 - a) * (l + b)
            val bv = g * (lv - l) + (1.0 - g) * b
            l = lv; b = bv
          }
        }
        Row(k,
          if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)),
          if (xNull) null else java.lang.Double.valueOf(r.getDouble(2)),
          p6(l), p6(b), p6(fc))
      }
    }(enc)
  }

  /** Regular-grid resampling with forward fill: one row per (key,
    * grid point) on a `stepExpr`-spaced grid spanning each key's
    * [trunc(min ts), trunc(max ts)], carrying the key's LAST value
    * at-or-before the point (null before the first observation) —
    * pandas `resample().ffill()`.
    *
    * Scale shape: grid bounds are one combinable aggregate; the grid
    * explode is rows × (span/step) — the DESIGNED output size; the
    * fill is [[AsOfJoin.floorJoin]] (union + one key shuffle + one
    * per-key sort), never a per-grid-point lookup join.
    */
  def resampleFfill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      unit: String = "hour",
      stepExpr: String = "interval 1 hour"): DataFrame = {
    val bounds = df.groupBy(col(keyCol))
      .agg(date_trunc(unit, min(col(tsCol))).as("__lo"),
        date_trunc(unit, max(col(tsCol))).as("__hi"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"), expr(stepExpr)))
        .as("grid_ts"))
    AsOfJoin.floorJoin(grid,
        df.select(col(keyCol), col(tsCol), col(tieCol), col(valueCol)),
        keys = Seq(keyCol), probeTs = "grid_ts", buildTs = tsCol,
        payload = Seq(tieCol, valueCol))
      .select(col(keyCol), col("grid_ts"), col(valueCol))
  }

  /** Cross-correlation function between two integer-valued series on
    * a shared integer time grid: ccf(ℓ) = corr(x_t, y_{t+ℓ}) for
    * ℓ ∈ [−maxLag, maxLag] — does one stream LEAD the other
    * (views → purchases a day later), the lagged-dependence readout
    * a same-bucket correlation (q172) cannot see.
    *
    * Both inputs are (t, value) frames on an integer grid index;
    * missing grid points count as 0 (the count-series convention —
    * an absent day is zero events, not missing data). Each lag's
    * Pearson runs on the overlap rows only (grid − |ℓ| pairs), all
    * moments exact integer sums, the correlation one row-local
    * double chain (the q172/q186 formula), 6dp-rounded; zero
    * variance on either side reads NULL.
    *
    * Scale shape: two grid-key aggregates + a grid-frame join, then
    * ONE ordered window carrying all 2·maxLag shifted columns (the
    * grid is calendar-bounded — the bounded-frame single-task window
    * precedent) and one combinable aggregate; the stacked output is
    * 2·maxLag+1 rows.
    *
    * Output: (lag, n_pairs, ccf6), lag ascending.
    */
  def crossCorrelation(
      x: DataFrame,
      y: DataFrame,
      tCol: String,
      vCol: String,
      maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag in [1, 64], got $maxLag")
    val spark = x.sparkSession
    val xs = x.select(col(tCol).cast("long").as("__t"),
      col(vCol).cast("long").as("__xv"))
    val ys = y.select(col(tCol).cast("long").as("__t"),
      col(vCol).cast("long").as("__yv"))
    val bounds = xs.select(col("__t"))
      .unionByName(ys.select(col("__t")))
      .agg(min(col("__t")).as("lo"), max(col("__t")).as("hi")).head()
    require(!bounds.isNullAt(0), "crossCorrelation needs non-empty input")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val grid = spark.range(lo, hi + 1).select(col("id").as("__t"))
      .join(xs.groupBy(col("__t")).agg(sum(col("__xv")).as("__xv")),
        Seq("__t"), "left")
      .join(ys.groupBy(col("__t")).agg(sum(col("__yv")).as("__yv")),
        Seq("__t"), "left")
      .select(col("__t"), coalesce(col("__xv"), lit(0L)).as("__xv"),
        coalesce(col("__yv"), lit(0L)).as("__yv"))
    val w = Window.orderBy(col("__t"))
    val lags = (-maxLag to maxLag).toSeq
    val shifted = lags.foldLeft(grid) { (df, l) =>
      val c = if (l < 0) lag(col("__yv"), -l).over(w)
              else if (l > 0) lead(col("__yv"), l).over(w)
              else col("__yv")
      df.withColumn(s"__y_$l", c)
    }
    val aggCols = lags.flatMap { l =>
      val yl = col(s"__y_$l")
      val live = yl.isNotNull
      Seq(
        sum(when(live, 1L).otherwise(0L)).as(s"__n_$l"),
        sum(when(live, col("__xv")).otherwise(0L)).as(s"__sx_$l"),
        sum(when(live, yl).otherwise(0L)).as(s"__sy_$l"),
        sum(when(live, col("__xv") * col("__xv")).otherwise(0L))
          .as(s"__sxx_$l"),
        sum(when(live, yl * yl).otherwise(0L)).as(s"__syy_$l"),
        sum(when(live, col("__xv") * yl).otherwise(0L)).as(s"__sxy_$l"))
    }
    val one = shifted.agg(aggCols.head, aggCols.tail: _*)
    def pr6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val stacked = lags.map { l =>
      val n = col(s"__n_$l").cast("double")
      val va = n * col(s"__sxx_$l").cast("double") -
        col(s"__sx_$l").cast("double") * col(s"__sx_$l").cast("double")
      val vb = n * col(s"__syy_$l").cast("double") -
        col(s"__sy_$l").cast("double") * col(s"__sy_$l").cast("double")
      val cov = n * col(s"__sxy_$l").cast("double") -
        col(s"__sx_$l").cast("double") * col(s"__sy_$l").cast("double")
      struct(lit(l.toLong).as("lag"), col(s"__n_$l").as("n_pairs"),
        when(va > 0 && vb > 0, pr6(cov / sqrt(va * vb)))
          .otherwise(lit(null).cast("double")).as("ccf6"))
    }
    one.select(explode(array(stacked: _*)).as("__p"))
      .select(col("__p.lag"), col("__p.n_pairs"), col("__p.ccf6"))
  }

  /** Day-of-week seasonality of a daily count series: the weekday
    * profile (mean per dow) plus η² — the share of daily variance
    * the weekday factor explains (SS_between/SS_total, the one-way
    * ANOVA effect size) — "is this weekly pattern real or noise",
    * answered before anyone trusts a weekday-adjusted forecast.
    *
    * dow = (epochDay + 4) % 7 with 0 = Sunday (1970-01-01 was a
    * Thursday). All moments are exact integer sums; the 7 per-group
    * SS terms snap to integer micro-units before summing (the q163
    * discipline) and η² is a one-row double chain; NULL when the
    * series is constant (no variance to explain).
    *
    * Scale shape: one day-key aggregate (map-side combined) → a
    * 7-group aggregate → 7-row arithmetic.
    *
    * Output: 7 rows (dow, n_days, total_events, mean6, eta2_6 —
    * replicated), dow ascending.
    */
  /** Per-key Theil–Sen robust slope: the LOWER MEDIAN of all pairwise
    * slopes (x_j − x_i)/(t_j − t_i) over each key's series (Theil
    * 1950, Sen 1968) — [[mannKendall]]'s companion: MK says WHETHER
    * the key trends, Theil–Sen says HOW FAST, and a single 100×
    * spike moves at most n−1 of the ~n²/2 slopes (OLS chases it
    * arbitrarily).
    *
    * Same deliberate shape as [[mannKendall]]: the pair join is
    * quadratic in the calendar-bounded SERIES LENGTH and linear in
    * keys; one key-hash shuffle with bounded per-key fan-out, then
    * ONE per-key window for the median rank (per-key pair blocks are
    * bounded, so the window task is too).
    *
    * Determinism: each pair's slope double is the same IEEE division
    * in any engine (micro-int inputs), and the median is a SELECTED
    * order statistic at rank (n_pairs+1) div 2 under the
    * (slope, t_i, t_j) total order — never averaged, so the output
    * is a raw computed value, 6dp-snapped only at the readout. The
    * slope is in INPUT value units per t unit — callers feeding
    * micro ints rescale themselves.
    *
    * Output per key with ≥ minN points: (keyCol, n_obs, n_pairs,
    * slope6).
    */
  def theilSen(
      df: DataFrame,
      keyCol: String,
      tCol: String,
      vCol: String,
      minN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val series = df.select(col(keyCol).as("__k"),
      col(tCol).cast("long").as("__t"), col(vCol).cast("long").as("__v"))
    val sized = series.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_obs"))
      .filter(col("n_obs") >= minN)
    val kept = series.join(sized, Seq("__k"))
    val a = kept.select(col("__k"), col("__t").as("__ta"),
      col("__v").as("__va"))
    val b = kept.select(col("__k"), col("__t").as("__tb"),
      col("__v").as("__vb"), col("n_obs"))
    val slopes = a.join(b, Seq("__k"))
      .filter(col("__ta") < col("__tb"))
      .select(col("__k"), col("n_obs"), col("__ta"), col("__tb"),
        ((col("__vb") - col("__va")).cast("double") /
          (col("__tb") - col("__ta")).cast("double")).as("__s"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__s"), col("__ta"), col("__tb"))
    val ranked = slopes
      .withColumn("__rn", row_number().over(w))
      .withColumn("__np",
        count(lit(1)).over(Window.partitionBy(col("__k"))))
    def pr6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    ranked
      .filter(col("__rn") === shiftright(col("__np") + lit(1L), 1))
      .select(col("__k").as(keyCol), col("n_obs"),
        col("__np").as("n_pairs"),
        pr6(col("__s")).as("slope6"))
  }

  /** Per-key Mann–Kendall trend test: S = Σ_{i<j} sign(x_j − x_i)
    * over each key's time-ordered series, the tie-corrected variance
    * Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18, and the
    * continuity-corrected z = (S∓1)/√Var — the nonparametric "is
    * this key trending" screen that needs no distributional
    * assumption and shrugs at outliers (a single 100× spike moves
    * OLS slope arbitrarily, it moves S by at most n−1).
    *
    * The pair sum is a WITHIN-KEY self-join on t_i < t_j —
    * deliberately quadratic in the SERIES LENGTH, which is
    * calendar-bounded (days of history), and linear in the number of
    * keys, which is what scales. A 1000× corpus is 1000× more keys ×
    * the same ~10² pair block per key: the join stays one key-hash
    * shuffle with bounded per-key fan-out. S and the variance
    * numerator ride exact int64 (n ≤ ~2M rows per key before
    * n(n−1)(2n+5) overflows — series are days, not rows).
    *
    * Keys with n < `minN` observations are dropped (a 3-point trend
    * is noise); all-tied series read NULL z/p/trend (Var = 0).
    * `significant` thresholds ROUNDED p at α=0.05.
    *
    * Output per key: (keyCol, n_obs, s_stat, var18 — the exact
    * 18·Var integer, z6, p6, trend ∈ increasing|decreasing|none,
    * NULL when untestable).
    */
  def mannKendall(
      df: DataFrame,
      keyCol: String,
      tCol: String,
      vCol: String,
      minN: Int = 10): DataFrame = {
    val series = df.select(col(keyCol).as("__k"),
      col(tCol).cast("long").as("__t"), col(vCol).cast("long").as("__v"))
    val sized = series.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_obs"))
      .filter(col("n_obs") >= minN)
    val kept = series.join(sized, Seq("__k"))
    val a = kept.select(col("__k"), col("__t").as("__ta"),
      col("__v").as("__va"))
    val b = kept.select(col("__k"), col("__t").as("__tb"),
      col("__v").as("__vb"), col("n_obs"))
    val s = a.join(b, Seq("__k"))
      .filter(col("__ta") < col("__tb"))
      .groupBy(col("__k"))
      .agg(max(col("n_obs")).as("n_obs"),
        sum(signum(col("__vb") - col("__va")).cast("long")).as("s_stat"))
    val ties = kept.groupBy(col("__k"), col("__v"))
      .agg(count(lit(1)).as("__tg"))
      .groupBy(col("__k"))
      .agg(sum(col("__tg") * (col("__tg") - lit(1L)) *
        (lit(2L) * col("__tg") + lit(5L))).as("__tie18"))
    val n = col("n_obs")
    val var18 = n * (n - lit(1L)) * (lit(2L) * n + lit(5L)) -
      col("__tie18")
    val varD = col("var18").cast("double") / lit(18.0)
    val zRaw = when(col("s_stat") > 0,
        (col("s_stat") - lit(1L)).cast("double") / sqrt(varD))
      .when(col("s_stat") < 0,
        (col("s_stat") + lit(1L)).cast("double") / sqrt(varD))
      .otherwise(lit(0.0))
    def pr6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val p = Hypothesis.normP2(zRaw)
    val ok = col("var18") > 0L
    s.join(ties, Seq("__k"))
      .withColumn("var18", var18)
      .select(col("__k").as(keyCol), col("n_obs"), col("s_stat"),
        col("var18"),
        when(ok, pr6(zRaw)).otherwise(lit(null).cast("double")).as("z6"),
        when(ok, pr6(p)).otherwise(lit(null).cast("double")).as("p6"),
        when(!ok, lit(null).cast("string"))
          .when(pr6(p) <= lit(0.05) && col("s_stat") > 0,
            lit("increasing"))
          .when(pr6(p) <= lit(0.05) && col("s_stat") < 0,
            lit("decreasing"))
          .otherwise(lit("none")).as("trend"))
  }

  /** Additive seasonal decomposition of a daily series:
    * x = trend + seasonal + residual — trend is the CENTERED 7-day
    * rolling mean over the zero-filled calendar grid (q198's
    * missing-day convention), seasonal is the per-weekday mean of
    * the detrended series, residual is what's left: the
    * decomposition that turns "Tuesday looks low" into "Tuesday is
    * ALWAYS low (seasonal), this one is fine (residual ≈ 0)".
    *
    * Determinism: the trend snaps to integer micro per day
    * (sum7/7 is one row-local double op on exact ints), detrended
    * values are then exact micro ints, the per-dow seasonal mean is
    * one integer-sum ratio re-snapped, and the residual is pure
    * integer subtraction. Edge days without a full ±3 window are
    * EXCLUDED (not zero-padded — a half-window trend is a different
    * estimator).
    *
    * Scale shape: one day-grain aggregate (map-side combined), a
    * calendar-bounded grid join, ONE ordered window over the day
    * frame (bounded by the date span — the q198 carve-out), a
    * 7-group aggregate, grid-sized arithmetic after.
    *
    * Output per full-window grid day: (t, x, dow, trend6,
    * seasonal6, residual6).
    */
  def seasonalDecompose(
      counts: DataFrame,
      tCol: String,
      vCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = counts.select(col(tCol).cast("long").as("__t"),
      col(vCol).cast("long").as("__x"))
      .groupBy(col("__t")).agg(sum(col("__x")).as("__x"))
    val bounds = daily.agg(min(col("__t")).as("__lo"),
      max(col("__t")).as("__hi"))
    val grid = bounds.select(
        explode(sequence(col("__lo"), col("__hi"))).as("__t"))
      .join(daily, Seq("__t"), "left")
      .select(col("__t"), coalesce(col("__x"), lit(0L)).as("__x"))
    val w = Window.orderBy(col("__t")).rowsBetween(-3, 3)
    val framed = grid
      .withColumn("__s7", sum(col("__x")).over(w))
      .withColumn("__c7", count(lit(1)).over(w))
      .filter(col("__c7") === 7L)
      .select(col("__t"), col("__x"),
        floor(col("__s7").cast("double") / lit(7.0) * lit(1e6) +
          lit(0.5)).cast("long").as("__trend"))
      .withColumn("__det", col("__x") * lit(1000000L) - col("__trend"))
      .withColumn("dow", pmod(col("__t") + lit(4L), lit(7L)))
    val seasonal = framed.groupBy(col("dow"))
      .agg(sum(col("__det")).as("__sd"), count(lit(1)).as("__cd"))
      .select(col("dow"),
        floor(col("__sd").cast("double") / col("__cd").cast("double") +
          lit(0.5)).cast("long").as("__seas"))
    framed.join(broadcast(seasonal), Seq("dow"))
      .select(col("__t").as(tCol), col("__x").as(vCol), col("dow"),
        (col("__trend").cast("double") / lit(1e6)).as("trend6"),
        (col("__seas").cast("double") / lit(1e6)).as("seasonal6"),
        ((col("__det") - col("__seas")).cast("double") / lit(1e6))
          .as("residual6"))
  }

  def dowSeasonality(
      counts: DataFrame,
      tCol: String,
      vCol: String): DataFrame = {
    val daily = counts.select(col(tCol).cast("long").as("__t"),
      col(vCol).cast("long").as("__x"))
      .groupBy(col("__t")).agg(sum(col("__x")).as("__x"))
      .select(pmod(col("__t") + lit(4L), lit(7L)).as("dow"), col("__x"))
    val g = daily.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("__x")).as("__sg"),
        sum(col("__x") * col("__x")).as("__ssg"))
    val tot = g.agg(sum(col("n_days")).as("__n"), sum(col("__sg")).as("__sx"),
      sum(col("__ssg")).as("__sxx"))
    val terms = g.select(floor(
        col("__sg").cast("double") * col("__sg").cast("double") /
          col("n_days").cast("double") * lit(1e6) + lit(0.5))
        .cast("long").as("__tm"))
      .agg(sum(col("__tm")).as("__st"))
    def pr6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val nd = col("__n").cast("double")
    val grand = col("__sx").cast("double") * col("__sx").cast("double") / nd
    val ssb = col("__st").cast("double") / lit(1e6) - grand
    val sst = col("__sxx").cast("double") - grand
    g.crossJoin(broadcast(tot)).crossJoin(broadcast(terms))
      .select(col("dow"), col("n_days"), col("__sg").as("total_events"),
        pr6(col("__sg").cast("double") / col("n_days").cast("double"))
          .as("mean6"),
        when(sst > 0, pr6(ssb / sst))
          .otherwise(lit(null).cast("double")).as("eta2_6"))
  }
}
