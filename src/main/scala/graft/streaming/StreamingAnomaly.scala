package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TimeSeries.rollingZScore]]
  * (S-family × time-series monitoring): the same trailing-window
  * z-score, as a per-key `flatMapGroupsWithState` whose state is the
  * last `w` values — O(w) per key however long the stream runs, the
  * live-monitoring deployment shape of the q121 batch operator.
  *
  * Exactness contract: the pure core below executes the IDENTICAL
  * IEEE sequence as the batch operator's codegen chains — the sums
  * fold left-associatively over the most-recent-first window exactly
  * as the batch `lag(1) + lag(2) + …` chain does, the variance guard
  * is the same `w·Σxx − (Σx)² > 0`, and z rounds at 6dp before the
  * threshold compare — so stream output == batch output row-for-row
  * (StreamingSemanticsSpec asserts equality over a multi-batch
  * MemoryStream feed, any batch split).
  *
  * Ordering contract: within a micro-batch, a key's events are
  * processed in (ts, id) order; ACROSS batches the feed must be
  * per-key time-ordered (the same id/time-monotone append contract as
  * the chunk maintainer — late events would need watermarked
  * reordering upstream, which composes but is not this operator).
  */
object StreamingAnomaly {

  case class Point(key: Long, tsMs: Long, id: Long, value: Double)
  case class Score(key: Long, id: Long, value: Double, z6: Double,
      anomaly: Boolean)
  /** most-recent-first trailing values, length ≤ w */
  case class Trailing(recent: Seq[Double])

  /** Pure scoring core, shared by the streaming driver and the spec's
    * reference fold. Returns (scores, new trailing state).
    */
  def scorePure(
      w: Int,
      zThreshold: Double,
      st0: Seq[Double],
      events: Seq[Point]): (Seq[Score], Seq[Double]) = {
    var buf = st0
    val out = Seq.newBuilder[Score]
    events.sortBy(e => (e.tsMs, e.id)).foreach { e =>
      if (buf.length >= w) {
        val xs = buf.take(w)
        // left-associative, most-recent-first — the batch operator's
        // exact chain order (lag(1) + lag(2) + … and squares likewise)
        val sx = xs.reduceLeft(_ + _)
        val sxx = xs.map(x => x * x).reduceLeft(_ + _)
        val varNum = w.toDouble * sxx - sx * sx
        if (varNum > 0) {
          val z = (e.value - sx / w.toDouble) /
            math.sqrt(varNum / (w.toDouble * (w - 1).toDouble))
          val z6 = math.floor(z * 1e6 + 0.5) / 1e6
          out += Score(e.key, e.id, e.value, z6, math.abs(z6) >= zThreshold)
        }
      }
      buf = (e.value +: buf).take(w)
    }
    (out.result(), buf)
  }

  /** Wire the core over a (streaming) Dataset of points. */
  def scores(points: Dataset[Point], w: Int, zThreshold: Double)(
      implicit spark: SparkSession): Dataset[Score] = {
    import spark.implicits._
    points
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Point], state: GroupState[Trailing]) =>
          val st0 = state.getOption.map(_.recent).getOrElse(Seq.empty)
          val (out, st1) = scorePure(w, zThreshold, st0, it.toSeq)
          state.update(Trailing(st1))
          out.iterator
      }
  }
}
