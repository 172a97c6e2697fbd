package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of [[graft.operators.Cdc.latestWins]] (q132): a
  * continuously-maintained current-state table over an append-only
  * change stream, as per-key `mapGroupsWithState` — every micro-batch
  * emits the CURRENT winner for each key that received any data
  * (possibly unchanged, when the batch carried only stale versions —
  * idempotent-upsert semantics for the sink, not a change feed).
  *
  * State is ONE row per key — the current winner — so memory is
  * key-space-bounded regardless of stream length.
  *
  * Ordering contract: NONE. Latest-wins is an associative/commutative
  * max over the (tsMs, id) version tuple, so late or re-ordered
  * deliveries converge to the same state — unlike the id-monotone
  * maintainers (chunk index), replays and shuffles are harmless by
  * construction, which is exactly why latest-wins is the standard CDC
  * compaction discipline. StreamingSemanticsSpec asserts
  * stream == batch after every prefix of an out-of-order feed.
  */
object StreamingUpsert {

  case class Change(key: Long, tsMs: Long, id: Long, typ: String,
      value: Double)

  /** Emissions mirror the state row; `key`'s latest version wins. */
  case class Latest(key: Long, tsMs: Long, id: Long, typ: String,
      value: Double)

  def latest(changes: Dataset[Change])(
      implicit spark: SparkSession): Dataset[Latest] = {
    import spark.implicits._
    changes
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Change], state: GroupState[Latest]) =>
          var best = state.getOption
          it.foreach { c =>
            if (best.forall(b => b.tsMs < c.tsMs ||
                (b.tsMs == c.tsMs && b.id < c.id)))
              best = Some(Latest(c.key, c.tsMs, c.id, c.typ, c.value))
          }
          val b = best.get // group nonempty or state existed
          state.update(b)
          b
      }
  }
}
