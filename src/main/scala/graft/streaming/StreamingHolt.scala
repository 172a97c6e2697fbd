package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TimeSeries.holtSmooth]]
  * (q230): Holt's linear-trend smoothing as per-key
  * `flatMapGroupsWithState` — the live forecaster, with state THREE
  * values per key (level, trend, started flag). Each arriving point
  * first reads its one-step-ahead forecast l+b (the self-backtest),
  * then folds in.
  *
  * Exactness contract (the StreamingCusum discipline): the pure core
  * executes the IDENTICAL operation-ordered IEEE chain as the batch
  * fold — l' = α·x + (1−α)·(l + b); b' = β·(l' − l) + (1−β)·b — so
  * stream output == batch output bit-for-bit over any batch split
  * (spec-asserted). Ordering contract: per-key time-ordered feed
  * across batches; in-batch points are sorted by t.
  */
object StreamingHolt {

  case class Point(key: String, t: Long, x: Double)
  case class Fit(key: String, t: Long, x: Double, level6: Double,
      trend6: Double, fc6: Option[Double])
  case class Holt(l: Double, b: Double, has: Boolean)

  /** Pure core shared with the spec's reference fold. */
  def fitPure(
      alpha: Double,
      beta: Double,
      s0: Holt,
      points: Seq[Point]): (Seq[Fit], Holt) = {
    def p6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
    var st = s0
    val out = Seq.newBuilder[Fit]
    points.sortBy(_.t).foreach { e =>
      val (lNew, bNew, fc) =
        if (!st.has) (e.x, 0.0, None)
        else {
          val l1 = alpha * e.x + (1.0 - alpha) * (st.l + st.b)
          val b1 = beta * ((alpha * e.x + (1.0 - alpha) * (st.l + st.b)) -
            st.l) + (1.0 - beta) * st.b
          (l1, b1, Some(st.l + st.b))
        }
      st = Holt(lNew, bNew, has = true)
      out += Fit(e.key, e.t, e.x, p6(lNew), p6(bNew), fc.map(p6))
    }
    (out.result(), st)
  }

  def fits(
      points: Dataset[Point],
      alpha: Double,
      beta: Double)(implicit spark: SparkSession): Dataset[Fit] = {
    import spark.implicits._
    points
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Point], state: GroupState[Holt]) =>
          val s0 = state.getOption.getOrElse(Holt(0.0, 0.0, has = false))
          val (out, s1) = fitPure(alpha, beta, s0, it.toSeq)
          state.update(s1)
          out.iterator
      }
  }
}
