package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TimeSeries.cusum]] (q156):
  * Page's one-sided CUSUM as per-key `flatMapGroupsWithState` — the
  * live-monitoring deployment of the batch detector, with state ONE
  * double per key (the running s), the cheapest possible stateful
  * operator.
  *
  * Exactness contract (the StreamingAnomaly discipline): the pure
  * core executes the IDENTICAL left-associative IEEE chain as the
  * batch fold — `max(0, s + (x − target − slack))` with the same
  * grouping — so stream output == batch output bit-for-bit over any
  * batch split (spec-asserted). Ordering contract: per-key
  * time-ordered feed across batches; in-batch events are sorted.
  */
object StreamingCusum {

  case class Point(key: Long, tsMs: Long, id: Long, value: Double)
  case class Score(key: Long, id: Long, value: Double, s6: Double,
      alarm: Boolean)
  case class Cusum(s: Double)

  /** Pure core shared with the spec's reference fold. */
  def scorePure(
      target: Double,
      slack: Double,
      threshold: Double,
      s0: Double,
      events: Seq[Point]): (Seq[Score], Double) = {
    var s = s0
    val out = Seq.newBuilder[Score]
    events.sortBy(e => (e.tsMs, e.id)).foreach { e =>
      s = math.max(0.0, s + (e.value - target - slack))
      val s6 = math.floor(s * 1e6 + 0.5) / 1e6
      out += Score(e.key, e.id, e.value, s6, s > threshold)
    }
    (out.result(), s)
  }

  def scores(
      points: Dataset[Point],
      target: Double,
      slack: Double,
      threshold: Double)(implicit spark: SparkSession): Dataset[Score] = {
    import spark.implicits._
    points
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Point], state: GroupState[Cusum]) =>
          val s0 = state.getOption.map(_.s).getOrElse(0.0)
          val (out, s1) = scorePure(target, slack, threshold, s0, it.toSeq)
          state.update(Cusum(s1))
          out.iterator
      }
  }
}
