package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TimeSeries.ewmaSmooth]]
  * (S-family × time-series smoothing): the same truncated adjusted
  * EWMA, as a per-key `flatMapGroupsWithState` whose state is the last
  * `lookback − 1` values — O(L) per key however long the stream runs,
  * the live-metric deployment shape of the q165 batch operator. The
  * truncation IS what makes the streaming form possible with bounded
  * state: the exact recursive EWMA needs only one accumulator but can
  * never equal a batch lag-chain bit-for-bit, while the truncated
  * window is the identical finite IEEE expression in both shapes.
  *
  * Exactness contract: the pure core folds numerator and denominator
  * left-associatively in weight order over the most-recent-first
  * window — the batch operator's exact `coalesce(lag j, 0)·w_j` chain,
  * absent terms contributing the same exact +0.0 — and rounds at 6dp,
  * so stream output == batch output row-for-row (asserted over a
  * multi-batch MemoryStream feed in StreamingSemanticsSpec).
  *
  * Ordering contract: [[StreamingAnomaly]]'s — within a micro-batch a
  * key's events are processed in (ts, id) order; across batches the
  * feed must be per-key time-ordered.
  */
object StreamingEwma {

  case class Point(key: Long, tsMs: Long, id: Long, value: Double)
  case class Smoothed(key: Long, id: Long, value: Double, nTerms: Int,
      ewma6: Double)
  /** most-recent-first trailing values, length ≤ lookback − 1 */
  case class Trailing(recent: Seq[Double])

  /** Pure smoothing core, shared by the streaming driver and the
    * spec's reference fold. Returns (smoothed rows, new state).
    */
  def smoothPure(
      alpha: Double,
      lookback: Int,
      st0: Seq[Double],
      events: Seq[Point]): (Seq[Smoothed], Seq[Double]) = {
    val weights = (0 until lookback).map(j => math.pow(1.0 - alpha, j))
    var buf = st0
    val out = Seq.newBuilder[Smoothed]
    events.sortBy(e => (e.tsMs, e.id)).foreach { e =>
      val xs = e.value +: buf // x0 (current) then lag 1, lag 2, …
      // the batch chain verbatim: j ascending, left-associative,
      // absent terms add exact 0.0 (coalesce(null,0)*w_j == 0.0*w_j)
      val num = (0 until lookback).map(j =>
        if (j < xs.length) xs(j) * weights(j) else 0.0).reduceLeft(_ + _)
      val den = (0 until lookback).map(j =>
        if (j < xs.length) weights(j) else 0.0).reduceLeft(_ + _)
      val ewma6 = math.floor(num / den * 1e6 + 0.5) / 1e6
      out += Smoothed(e.key, e.id, e.value,
        math.min(xs.length, lookback), ewma6)
      buf = (e.value +: buf).take(lookback - 1)
    }
    (out.result(), buf)
  }

  /** Wire the core over a (streaming) Dataset of points. */
  def smoothed(points: Dataset[Point], alpha: Double, lookback: Int)(
      implicit spark: SparkSession): Dataset[Smoothed] = {
    import spark.implicits._
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    require(lookback >= 1, s"lookback must be >= 1, got $lookback")
    points
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Point], state: GroupState[Trailing]) =>
          val st0 = state.getOption.map(_.recent).getOrElse(Seq.empty)
          val (out, st1) = smoothPure(alpha, lookback, st0, it.toSeq)
          state.update(Trailing(st1))
          out.iterator
      }
  }
}
