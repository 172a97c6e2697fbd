package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** Subsequence search must find a planted motif exactly (corr 1.0 at
  * its start), respect the variance guard and tail exclusion, and
  * keep the one-shuffle plan shape.
  */
class TimeSeriesSpec extends SparkSuiteBase {

  import spark.implicits._

  private def series(key: Long, vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (key, Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        (key * 1000 + i).toLong, v)
    }

  private val ramp = (1 to 8).map(_.toDouble)

  test("a planted ramp is rank 1 with corr 1.0 at its start position") {
    // noise plateau, then an exact affine image of the pattern
    // (2x + 3) from position 11 — Pearson is affine-invariant
    val vals = Seq(5.0, 4.0, 6.0, 5.5, 4.5, 6.5, 5.0, 4.0, 6.0, 5.0) ++
      ramp.map(2.0 * _ + 3.0) ++ Seq(1.0, 9.0)
    val df = series(1L, vals).toDF("user_id", "ts", "event_id", "value")
    val top = TimeSeries.subsequenceSearch(df, "user_id", "ts",
        "event_id", "value", ramp, k = 1)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(top.toSeq == Seq((1, 11L, 1.0)))
  }

  test("rolling z-score flags a planted spike, and only the spike") {
    // flat-ish baseline with small wiggle, then a huge spike at
    // position 12 (0-based): its 8 trailing values are the baseline,
    // so |z| blows past 3; every baseline point stays under
    val base = Seq(5.0, 5.2, 4.8, 5.1, 4.9, 5.0, 5.3, 4.7, 5.0, 5.1, 4.9, 5.0)
    val vals = base ++ Seq(50.0) ++ Seq(5.0, 5.1)
    val df = series(7L, vals).toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.rollingZScore(df, "user_id", "ts", "event_id",
      "value", w = 8, zThreshold = 3.0).collect()
    val flagged = out.filter(_.getBoolean(4)).map(_.getLong(1)).toSeq
    assert(flagged == Seq(7L * 1000 + 12),
      s"exactly the spike must flag, got $flagged")
    // causality: the spike's own z uses only PRECEDING values, so its
    // z is large positive; the points after it (spike now inside their
    // trailing window) must not flag
    val zs = out.map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(zs(7L * 1000 + 12) > 10)
  }

  test("rolling z-score excludes short-window and zero-variance points") {
    // first w points have no full trailing window; a constant prefix
    // yields zero variance — both must be absent, not NaN/Inf
    val vals = Seq.fill(10)(3.0) ++ Seq(4.0, 5.0)
    val df = series(8L, vals).toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.rollingZScore(df, "user_id", "ts", "event_id",
      "value", w = 8, zThreshold = 3.0).collect()
    // points 0..7: no full window; points 8, 9, 10: constant trailing
    // window (variance 0); point 11: window {3.0 x 7, 4.0} has variance
    assert(out.map(_.getLong(1)).toSeq == Seq(8L * 1000 + 11))
    assert(!out.exists(r => r.getDouble(3).isNaN || r.getDouble(3).isInfinite))
  }

  test("rolling z-score is per-key: one key's spike never leaks into another's") {
    val calm = series(10L, Seq.fill(12)(5.0) ++ Seq(5.1))
    val spiky = series(11L, Seq(5.0, 5.2, 4.8, 5.1, 4.9, 5.0, 5.3, 4.7,
      5.0, 100.0))
    val df = (calm ++ spiky).toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.rollingZScore(df, "user_id", "ts", "event_id",
      "value", w = 8, zThreshold = 3.0).collect()
    val byKey = out.groupBy(_.getLong(0))
    assert(!byKey.getOrElse(10L, Array()).exists(_.getBoolean(4)))
    assert(byKey(11L).filter(_.getBoolean(4)).map(_.getLong(1)).toSeq ==
      Seq(11L * 1000 + 9))
  }

  test("a descending ramp anti-correlates at -1") {
    val vals = Seq(9.0, 1.0, 7.0) ++ ramp.reverse ++ Seq(3.0)
    val df = series(2L, vals).toDF("user_id", "ts", "event_id", "value")
    val all = TimeSeries.subsequenceSearch(df, "user_id", "ts",
        "event_id", "value", ramp, k = 100)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    assert(all(4L) == -1.0)
  }

  test("flat windows are excluded by the variance guard; tails never score") {
    val vals = Seq.fill(10)(7.0) ++ Seq(1.0, 2.0)
    val df = series(3L, vals).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.subsequenceSearch(df, "user_id", "ts",
        "event_id", "value", ramp, k = 100)
      .collect().map(_.getLong(2)).toSet
    // positions 1..3 are flat (variance 0); positions >5 are tails
    // (fewer than 8 points); 4 and 5 include the 1.0/2.0 step
    assert(got == Set(4L, 5L))
    // a series shorter than the pattern yields nothing
    val short = series(4L, Seq(1.0, 2.0, 3.0))
      .toDF("user_id", "ts", "event_id", "value")
    assert(TimeSeries.subsequenceSearch(short, "user_id", "ts",
      "event_id", "value", ramp, k = 5).count() == 0)
  }

  test("one key shuffle: the scoring and ranking windows share the exchange") {
    val p = graft.Queries.all("q102_subseq_search")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected exactly 1 key shuffle, got $hashExchanges:\n$p")
    assert(!p.contains("Join"), "subsequence search must not plan a join")
  }

  test("constant pattern is rejected") {
    val df = series(5L, ramp).toDF("user_id", "ts", "event_id", "value")
    intercept[IllegalArgumentException] {
      TimeSeries.subsequenceSearch(df, "user_id", "ts", "event_id",
        "value", Seq(2.0, 2.0, 2.0), k = 1)
    }
  }

  test("OHLC: open/close follow the total order, ties on ts break by id") {
    import java.sql.Timestamp
    def t(x: String) = Timestamp.valueOf(x)
    val df = Seq(
      // one hour bucket for key 1: two events share the SAME ts —
      // open must be the lower id, close the higher
      (1L, t("2024-01-01 10:05:00"), 1L, 5.0),
      (1L, t("2024-01-01 10:05:00"), 2L, 9.0),
      (1L, t("2024-01-01 10:40:00"), 3L, 1.0),
      // second bucket
      (1L, t("2024-01-01 11:10:00"), 4L, 7.0),
      (2L, t("2024-01-01 10:30:00"), 5L, 3.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.ohlcDownsample(df, "user_id", "ts", "event_id",
        "value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    assert(got((1L, "2024-01-01 10:00:00.0")) ===
      ((3L, 5.0, 9.0, 1.0, 1.0)))
    assert(got((1L, "2024-01-01 11:00:00.0")) ===
      ((1L, 7.0, 7.0, 7.0, 7.0)))
    assert(got((2L, "2024-01-01 10:00:00.0")) ===
      ((1L, 3.0, 3.0, 3.0, 3.0)))
  }

  test("resample+ffill: grid spans trunc(min)..trunc(max), nulls before first obs") {
    import java.sql.Timestamp
    def t(x: String) = Timestamp.valueOf(x)
    val df = Seq(
      (1L, t("2024-01-01 10:30:00"), 1L, 5.0),
      (1L, t("2024-01-01 13:10:00"), 2L, 8.0),
      (2L, t("2024-01-01 11:00:00"), 3L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.resampleFfill(df, "user_id", "ts", "event_id",
        "value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got === Set(
      // 10:00 grid point precedes the 10:30 observation -> null
      (1L, "2024-01-01 10:00:00.0", None),
      (1L, "2024-01-01 11:00:00.0", Some(5.0)),
      (1L, "2024-01-01 12:00:00.0", Some(5.0)),
      (1L, "2024-01-01 13:00:00.0", Some(5.0)),
      // key 2: single point exactly on its own grid mark
      (2L, "2024-01-01 11:00:00.0", Some(2.0))))
  }

  test("CUSUM: clamp at zero, drift accumulation, alarm onset, hand-computed") {
    import java.sql.Timestamp
    def t(i: Int) = new Timestamp(1700000000000L + i * 1000L)
    // target 10, slack 2 -> drift adds (x - 12); threshold 5
    val vals = Seq(10.0, 9.0, 15.0, 16.0, 14.0, 8.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (1L, t(i), i.toLong, v)
    }.toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.cusum(df, "user_id", "ts", "event_id", "value",
        target = 10.0, slack = 2.0, threshold = 5.0)
      .collect().map(r => r.getLong(2) -> (r.getDouble(4), r.getBoolean(5)))
      .toMap
    // s: max(0,0-2)=0; max(0,0-3)=0; max(0,0+3)=3; 3+4=7; 7+2=9; 9-4=5
    assert(got(0L) === ((0.0, false)))
    assert(got(1L) === ((0.0, false)))
    assert(got(2L) === ((3.0, false)))
    assert(got(3L) === ((7.0, true)))
    assert(got(4L) === ((9.0, true)))
    assert(got(5L) === ((5.0, false)), "alarm is strict >")
  }

  test("CUSUM deterministic under repartitioning") {
    import java.sql.Timestamp
    val df = (0 until 200).map { i =>
      ((i % 3).toLong, new Timestamp(1700000000000L + i * 1000L),
        i.toLong, ((i * 37) % 100).toDouble)
    }.toDF("user_id", "ts", "event_id", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      TimeSeries.cusum(d, "user_id", "ts", "event_id", "value",
        50.0, 5.0, 60.0).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(4))).toSet
    assert(run(df) === run(df.repartition(7)))
  }

  test("CUSUM/holt: streaming fold — no per-key history in the plan, " +
      "200k-row single key matches the driver replay") {
    // the old collect_list + HOF-aggregate fold materialized each
    // key's full history in one row and rebuilt the accumulator array
    // per step (O(n²)); this would not finish on 200k rows. The
    // streaming fold must (a) show no collect_list in the plan and
    // (b) reproduce the exact left-associative chain.
    val df = spark.range(200000).select(
      lit(1L).as("user_id"),
      timestamp_millis(lit(1700000000000L) + col("id") * lit(1000L))
        .as("ts"),
      col("id").as("event_id"),
      (col("id") * lit(37L) % lit(100L)).cast("double").as("value"))
    val out = TimeSeries.cusum(df, "user_id", "ts", "event_id", "value",
      target = 50.0, slack = 5.0, threshold = 60.0)
    assert(!out.queryExecution.optimizedPlan.toString.contains("collect_list"))
    var s = 0.0
    var alarms = 0L
    (0L until 200000L).foreach { i =>
      s = math.max(0.0, s + ((i * 37 % 100).toDouble - 50.0 - 5.0))
      if (s > 60.0) alarms += 1
    }
    val last = out.orderBy(col("event_id").desc).limit(1).collect()(0)
    assert(last.getDouble(4) == math.floor(s * 1e6 + 0.5) / 1e6)
    assert(out.filter(col("alarm")).count() == alarms)

    val holt = TimeSeries.holtSmooth(
      df.select(col("user_id"), col("event_id").as("t"), col("value").as("x")),
      "user_id", "t", "x", alpha = 0.5, beta = 0.25)
    assert(!holt.queryExecution.optimizedPlan.toString.contains("collect_list"))
    var (l, b) = (0.0, 0.0)
    (0L until 200000L).foreach { i =>
      val x = (i * 37 % 100).toDouble
      if (i == 0L) { l = x; b = 0.0 }
      else {
        val lv = 0.5 * x + (1.0 - 0.5) * (l + b)
        b = 0.25 * (lv - l) + (1.0 - 0.25) * b
        l = lv
      }
    }
    val hLast = holt.orderBy(col("t").desc).limit(1).collect()(0)
    assert(hLast.getDouble(3) == math.floor(l * 1e6 + 0.5) / 1e6)
    assert(hLast.getDouble(4) == math.floor(b * 1e6 + 0.5) / 1e6)
  }

  test("EWMA: hand-checked values, adjust=true renormalization on partial windows") {
    import java.sql.Timestamp
    val df = Seq(1.0, 3.0, 5.0, 7.0).zipWithIndex.map { case (v, i) =>
      (1L, new Timestamp(1700000000000L + i * 1000L), i.toLong, v)
    }.toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.ewmaSmooth(df, "user_id", "ts", "event_id", "value",
        alpha = 0.5, lookback = 3)
      .collect().map(r => r.getLong(1) -> (r.getInt(3), r.getDouble(4))).toMap
    // t0: 1/1 = 1;  t1: (3 + .5*1)/1.5 = 7/3;  t2: (5+.5*3+.25*1)/1.75
    assert(got(0L) === ((1, 1.0)))
    assert(got(1L) === ((2, math.floor(3.5 / 1.5 * 1e6 + 0.5) / 1e6)))
    assert(got(2L) === ((3, math.floor(6.75 / 1.75 * 1e6 + 0.5) / 1e6)))
    assert(got(3L) === ((3, math.floor(10.25 / 1.75 * 1e6 + 0.5) / 1e6)))
  }

  test("EWMA: truncation error vs the exact recursive EWMA is <= (1-a)^L of range") {
    import java.sql.Timestamp
    val vals = (0 until 100).map(i => ((i * 37) % 100).toDouble)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (1L, new Timestamp(1700000000000L + i * 1000L), i.toLong, v)
    }.toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.ewmaSmooth(df, "user_id", "ts", "event_id", "value",
        alpha = 0.5, lookback = 8)
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    // exact adjusted EWMA, full history
    var num = 0.0; var den = 0.0
    vals.zipWithIndex.foreach { case (v, i) =>
      num = num * 0.5 + v; den = den * 0.5 + 1.0
      val err = math.abs(got(i.toLong) - num / den)
      assert(err <= math.pow(0.5, 8) * 100.0 + 1e-9,
        s"truncation error $err at $i exceeds the (1-a)^L bound")
    }
  }

  test("EWMA plan: one exchange (the per-key sort), no self-join") {
    import java.sql.Timestamp
    val df = (0 until 50).map { i =>
      ((i % 3).toLong, new Timestamp(1700000000000L + i * 1000L),
        i.toLong, i.toDouble)
    }.toDF("user_id", "ts", "event_id", "value")
    val p = TimeSeries.ewmaSmooth(df, "user_id", "ts", "event_id", "value",
        alpha = 0.5, lookback = 6)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"EWMA must shuffle once, saw $exchanges:\n$p")
    assert(!p.contains("Join"), s"EWMA must not self-join:\n$p")
  }

  test("crossCorrelation: a 1-step lead reads ccf(+1) = 1, gaps fill 0") {
    import spark.implicits._
    // y_t = x_{t-1}: y LAGS x by one day → corr(x_t, y_{t+1}) = 1.
    // Grid spans 0..5; x misses t=5 and y misses t=0 → filled 0.
    // non-monotone series: a LINEAR x would read 1.0 at every lag
    // (any aligned window of a line is perfectly correlated)
    val x = Seq((0L, 1L), (1L, 3L), (2L, 2L), (3L, 5L), (4L, 4L))
      .toDF("t", "v")
    val y = Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 5L), (5L, 4L))
      .toDF("t", "v")
    val got = TimeSeries.crossCorrelation(x, y, "t", "v", maxLag = 2)
      .orderBy(col("lag")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    // n_pairs = grid − |lag| = 6 − |l|
    assert(got.map(g => (g._1, g._2)).toSeq ===
      Seq((-2L, 4L), (-1L, 5L), (0L, 6L), (1L, 5L), (2L, 4L)))
    val byLag = got.map(g => g._1 -> g._3).toMap
    assert(byLag(1L) == 1.0, s"perfect 1-step lead: $byLag")
    assert(byLag(0L) < 1.0 && byLag(2L) < 1.0,
      "other lags must read weaker")
    // constant x ACROSS THE WHOLE GRID (a shorter constant series
    // would stop being constant after the zero-fill): NULL at every lag
    val const = (0L to 5L).map(t => (t, 7L)).toDF("t", "v")
    val rc = TimeSeries.crossCorrelation(const, y, "t", "v", maxLag = 1)
      .collect()
    assert(rc.forall(_.isNullAt(2)), "zero variance must read NULL")
  }

  test("dowSeasonality: pure weekly pattern reads eta2 = 1, constant NULL") {
    import spark.implicits._
    // two full weeks where the count is a pure function of the
    // weekday: between-group variance explains everything
    val pure = (0L to 13L).map(t => (t, (t + 4) % 7 + 1)).toDF("t", "v")
    val got = TimeSeries.dowSeasonality(pure, "t", "v")
      .orderBy(col("dow")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length == 7)
    assert(got.forall(_._2 == 2L), "two days per weekday")
    // dow d has constant count d+1 → mean d+1, total 2(d+1)
    assert(got.forall(g => g._4 == g._1 + 1.0 && g._3 == 2 * (g._1 + 1)))
    assert(got.forall(_._5 == 1.0), s"pure pattern is eta2=1: ${got.toSeq}")

    val const = (0L to 13L).map(t => (t, 5L)).toDF("t", "v")
    val rc = TimeSeries.dowSeasonality(const, "t", "v").collect()
    assert(rc.forall(_.isNullAt(4)), "constant series has no variance")

    // duplicate t rows pre-sum into the day before anything else
    val dup = Seq((0L, 2L), (0L, 3L), (1L, 5L)).toDF("t", "v")
    val rd = TimeSeries.dowSeasonality(dup, "t", "v")
      .orderBy(col("dow")).collect()
    assert(rd.map(_.getLong(2)).toSet == Set(5L),
      "both days total 5 after the t-grain pre-aggregation")
  }

  test("seasonalDecompose: pure weekly pattern splits exactly") {
    import spark.implicits._
    // x = 10 + pat[t%7], Σpat = 0 → every 7-day centered mean is
    // exactly 10: trend 10, seasonal = the pattern, residual 0
    val pat = Seq(0L, 1L, 2L, 3L, -2L, -2L, -2L)
    val df = (0L to 20L).map(t => (t, 10L + pat((t % 7).toInt)))
      .toDF("t", "x")
    val out = TimeSeries.seasonalDecompose(df, "t", "x")
      .orderBy(col("t")).collect()
    // only full-window days 3..17 survive
    assert(out.map(_.getLong(0)).toSeq == (3L to 17L))
    assert(out.forall(_.getDouble(3) == 10.0), "trend is exactly 10")
    assert(out.forall(r => r.getDouble(5) == 0.0),
      "a pure pattern has zero residual")
    val byT = out.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert((3L to 17L).forall(t =>
      byT(t) == pat((t % 7).toInt).toDouble))
    // x = trend + seasonal + residual identically
    assert(out.forall(r => math.abs(r.getLong(1).toDouble -
      (r.getDouble(3) + r.getDouble(4) + r.getDouble(5))) < 1e-9))
  }

  test("seasonalDecompose: missing grid days are zero-filled") {
    import spark.implicits._
    // a hole at t=5: the grid fills it with 0, windows spanning it
    // see the 0 (not a skipped row)
    val df = (0L to 13L).filter(_ != 5L).map(t => (t, 7L)).toDF("t", "x")
    val out = TimeSeries.seasonalDecompose(df, "t", "x")
      .orderBy(col("t")).collect()
    val byT = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(3))).toMap
    assert(byT(5L)._1 == 0L, "the hole itself appears with x = 0")
    // a window fully clear of the hole: days 9..13 window for t=10?
    // t=10 window covers 7..13 — all 7s → trend 7 exactly
    assert(byT(10L)._2 == 7.0)
    // a window containing the hole: t=4 covers 1..7 → (6·7)/7 = 6
    assert(byT(4L)._2 == 6.0)
  }

  test("mannKendall: strictly increasing series, exact S and var") {
    import spark.implicits._
    // v = t for t=0..9: S = 45 (all pairs ascending), no ties →
    // var18 = 10·9·25 = 2250, Var = 125, z = 44/√125 = 3.935979
    val df = (0L to 9L).map(t => ("u", t, t)).toDF("k", "t", "v")
    val r = TimeSeries.mannKendall(df, "k", "t", "v", minN = 5).head()
    assert(r.getAs[Long]("n_obs") == 10L)
    assert(r.getAs[Long]("s_stat") == 45L)
    assert(r.getAs[Long]("var18") == 2250L)
    assert(r.getAs[Double]("z6") == 3.93548)
    assert(r.getAs[String]("trend") == "increasing")
  }

  test("mannKendall: tie correction and the decreasing branch") {
    import spark.implicits._
    // v = [5,5,3,1]: pairs (5,5)=0, 5>3 ×2, 5>1 ×2, 3>1 → S = -5
    // ties: one group of 2 → tie18 = 2·1·9 = 18
    // var18 = 4·3·13 − 18 = 138
    val df = Seq(("u", 0L, 5L), ("u", 1L, 5L), ("u", 2L, 3L),
      ("u", 3L, 1L)).toDF("k", "t", "v")
    val r = TimeSeries.mannKendall(df, "k", "t", "v", minN = 2).head()
    assert(r.getAs[Long]("s_stat") == -5L)
    assert(r.getAs[Long]("var18") == 138L)
    // z = (-5+1)/√(138/18) = -1.44463; p ≈ 0.1486 → "none"
    assert(r.getAs[Double]("z6") == -1.44463)
    assert(r.getAs[String]("trend") == "none")
  }

  test("mannKendall: all-tied series reads NULL, short keys drop") {
    import spark.implicits._
    val df = (Seq.tabulate(6)(i => ("flat", i.toLong, 7L)) ++
      Seq(("short", 0L, 1L), ("short", 1L, 2L))).toDF("k", "t", "v")
    val out = TimeSeries.mannKendall(df, "k", "t", "v", minN = 5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("short"), "below-minN keys are dropped")
    val f = out("flat")
    assert(f.getAs[Long]("s_stat") == 0L)
    assert(f.getAs[Long]("var18") == 0L)
    assert(f.isNullAt(f.fieldIndex("z6")))
    assert(f.isNullAt(f.fieldIndex("trend")))
  }

  test("holtVsSeasonalNaive: pure weekly pattern crowns the naive") {
    import spark.implicits._
    // exact period-7 pattern over 4 weeks: the seasonal naive is
    // PERFECT (mae 0 → mase NULL); Holt's trendless smoothing lags
    val pat = Seq(10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0)
    val rows = (0 until 28).map(t => ("k", t.toLong, pat(t % 7)))
      .toDF("key", "t", "x")
    val r = TimeSeries.holtVsSeasonalNaive(rows, "key", "t", "x",
      0.5, 0.25, period = 7).head()
    assert(r.getAs[Long]("n") == 21L)
    assert(r.getAs[Double]("mae_naive6") == 0.0)
    assert(r.getAs[Double]("mae_holt6") > 0.0)
    assert(r.isNullAt(r.fieldIndex("mase6")), "perfect naive → NULL")
    // a constant series: Holt is also perfect → mase NULL both ways?
    // no — both MAEs are 0, naive 0 → NULL (zero-denominator rule)
    val const = (0 until 20).map(t => ("c", t.toLong, 5.0))
      .toDF("key", "t", "x")
    val c = TimeSeries.holtVsSeasonalNaive(const, "key", "t", "x",
      0.5, 0.25, 7).head()
    assert(c.getAs[Double]("mae_holt6") == 0.0 &&
      c.isNullAt(c.fieldIndex("mase6")))
  }

  test("crossCorrelation with itself: ACF identity (lag 0 = 1, symmetric)") {
    import spark.implicits._
    val s = Seq((0L, 5L), (1L, 9L), (2L, 2L), (3L, 7L), (4L, 4L),
      (5L, 8L)).toDF("t", "v")
    val acf = TimeSeries.crossCorrelation(s, s, "t", "v", maxLag = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ccf6")).toMap
    assert(acf(0L) == 1.0)
    assert(acf(1L) == acf(-1L) && acf(2L) == acf(-2L), s"got $acf")
  }

  test("theilSen: exact line recovers slope, spike barely moves it") {
    import spark.implicits._
    // key "lin": v = 3t exactly over 10 days → every pair slope = 3
    val lin = (0L until 10L).map(t => ("lin", t, 3L * t))
    // key "spk": same line but day 9 spikes to 1000 — OLS would chase
    // it; the median pair slope stays 3
    val spk = (0L until 9L).map(t => ("spk", t, 3L * t)) :+
      ("spk", 9L, 1000L)
    val got = TimeSeries.theilSen((lin ++ spk).toDF("k", "t", "v"),
        "k", "t", "v", minN = 5)
      .orderBy("k").collect()
    assert(got(0).getAs[Double]("slope6") == 3.0)
    assert(got(0).getAs[Long]("n_pairs") == 45L)
    assert(got(1).getAs[Double]("slope6") == 3.0,
      s"spike must not move the median slope: ${got(1)}")
    // short series are dropped
    val short = Seq(("s", 1L, 1L), ("s", 2L, 2L)).toDF("k", "t", "v")
    assert(TimeSeries.theilSen(short, "k", "t", "v", minN = 5)
      .count() == 0L)
  }

  test("dispersionIndex: Poisson-ish ~1, bursty >>1, constant 0, zero NULL") {
    import spark.implicits._
    val rows =
      // constant series: variance 0 → ratio 0, not overdispersed
      (1L to 4L).map(t => ("const", t, 5L)) ++
      // bursty: {0,0,0,12} → mean 3, var (9+9+9+81)/4=27 → ratio 9
      Seq(("burst", 1L, 0L), ("burst", 2L, 0L), ("burst", 3L, 0L),
        ("burst", 4L, 12L)) ++
      // all-zero: mean 0 → NULL ratio and flag
      (1L to 3L).map(t => ("zero", t, 0L))
    val got = TimeSeries.dispersionIndex(rows.toDF("k", "t", "x")
        .select(col("k"), col("x")), "k", "x")
      .orderBy("k").collect()
    val burst = got(0)
    assert(burst.getAs[Double]("mean6") == 3.0 &&
      burst.getAs[Double]("var6") == 27.0 &&
      burst.getAs[Double]("dispersion6") == 9.0 &&
      burst.getAs[Boolean]("overdispersed"))
    val const = got(1)
    assert(const.getAs[Double]("dispersion6") == 0.0 &&
      !const.getAs[Boolean]("overdispersed"))
    val zero = got(2)
    assert(zero.isNullAt(zero.fieldIndex("dispersion6")) &&
      zero.isNullAt(zero.fieldIndex("overdispersed")))
  }

  test("holtSmooth: hand-folded level/trend/forecast chain") {
    import spark.implicits._
    // x = 10, 14, 10 with α=0.5, β=0.25:
    //   t1: l=10, b=0, fc=null
    //   t2: fc=10, l=12, b=0.25·2=0.5
    //   t3: fc=12.5, l=11.25, b=0.25·(-0.75)+0.375=0.1875
    val df = Seq(("k", 1L, 10.0), ("k", 2L, 14.0), ("k", 3L, 10.0))
      .toDF("key", "t", "x")
    val got = TimeSeries.holtSmooth(df, "key", "t", "x", 0.5, 0.25)
      .orderBy("t").collect()
    assert(got(0).isNullAt(got(0).fieldIndex("fc6")))
    assert(got(0).getAs[Double]("level6") == 10.0 &&
      got(0).getAs[Double]("trend6") == 0.0)
    assert(got(1).getAs[Double]("fc6") == 10.0 &&
      got(1).getAs[Double]("level6") == 12.0 &&
      got(1).getAs[Double]("trend6") == 0.5)
    assert(got(2).getAs[Double]("fc6") == 12.5 &&
      got(2).getAs[Double]("level6") == 11.25 &&
      got(2).getAs[Double]("trend6") == 0.1875)
  }

  test("holtSmooth: per-key independence, determinism, trend onset") {
    import spark.implicits._
    val rows = (1L to 8L).flatMap(t =>
      Seq(("ramp", t, 2.0 * t.toDouble), ("flat", t, 7.0)))
    val df = rows.toDF("key", "t", "x")
    val a = TimeSeries.holtSmooth(df, "key", "t", "x", 0.5, 0.25)
    val flat = a.filter(col("key") === "flat").orderBy("t").collect()
    // a constant series keeps level = x, trend = 0, forecast exact
    assert(flat.forall(_.getAs[Double]("level6") == 7.0))
    assert(flat.forall(_.getAs[Double]("trend6") == 0.0))
    assert(flat.drop(1).forall(_.getAs[Double]("fc6") == 7.0))
    // the ramp's one-step error shrinks as the trend locks on
    val ramp = a.filter(col("key") === "ramp").orderBy("t").collect()
    val errs = ramp.drop(1).map(r =>
      math.abs(r.getAs[Double]("x") - r.getAs[Double]("fc6")))
    assert(errs.last < errs.head, s"errors ${errs.toSeq}")
    // bit-exact across runs and partitionings
    val b = TimeSeries.holtSmooth(df.repartition(5), "key", "t", "x",
      0.5, 0.25)
    assert(a.orderBy("key", "t").collect().toSeq ==
      b.orderBy("key", "t").collect().toSeq)
  }
}
