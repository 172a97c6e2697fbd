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
}
