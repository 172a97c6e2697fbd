package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** [[StreamingUpsert]] re-expressed on Spark 4's `transformWithState`
  * arbitrary-state API (SPARK-49042 family) — the successor to
  * `mapGroupsWithState` that this library should be ready for: typed
  * named state (`ValueState`), explicit `TimeMode`, per-state TTL
  * config, and RocksDB-only execution (the scale-grade state store;
  * the old API's HDFS-backed default keeps full maps on heap).
  *
  * Semantics are IDENTICAL to [[StreamingUpsert]] — commutative
  * latest-wins by (tsMs, id), one state row per key, emission per
  * key-with-data — and StreamingSemanticsSpec asserts the two APIs
  * produce the same output over the same out-of-order feed, which is
  * the migration-safety property this twin exists to prove.
  */
object StreamingUpsertV2 {

  import StreamingUpsert.{Change, Latest}

  private class LatestProcessor
      extends StatefulProcessor[Long, Change, Latest] {
    @transient private var state: ValueState[Latest] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Latest]("latest",
        Encoders.product[Latest], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Change],
        timerValues: TimerValues): Iterator[Latest] = {
      var best = if (state.exists()) Option(state.get()) else None
      rows.foreach { c =>
        if (best.forall(b => b.tsMs < c.tsMs ||
            (b.tsMs == c.tsMs && b.id < c.id)))
          best = Some(Latest(c.key, c.tsMs, c.id, c.typ, c.value))
      }
      val b = best.get // rows nonempty or state existed
      state.update(b)
      Iterator.single(b)
    }
  }

  def latest(changes: Dataset[Change])(
      implicit spark: SparkSession): Dataset[Latest] = {
    import spark.implicits._
    changes
      .groupByKey(_.key)
      .transformWithState(new LatestProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
