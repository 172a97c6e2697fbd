package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Behavior.sessionize]] (q138):
  * gap-based sessions maintained per key with
  * `flatMapGroupsWithState` + EVENT-TIME timeout — a session closes
  * either when a later event of the same key arrives past the gap,
  * or when the WATERMARK passes (last event + gap), so open sessions
  * flush without waiting for more key traffic (the semantics the
  * built-in session_window gives q40; here the state is explicit so
  * the session counter, duration math, and flush timing are
  * bit-identical to the batch operator's window formulation).
  *
  * State per key: ONE row (counter, start, last, n) — constant
  * memory per key however long the stream runs. After a timeout
  * flush the row is KEPT with n = 0 as a closed marker: the counter
  * must survive the flush or the key's next session would renumber
  * from 1 and diverge from the batch operator's per-key numbering
  * (spec-asserted by resuming traffic after a timeout).
  *
  * Ordering contract: the feed must be GLOBALLY watermark-aligned,
  * not merely per-key ordered — `withWatermark` + EventTimeTimeout
  * filters any input behind the watermark that OTHER keys advanced,
  * so a key whose batches lag another key's event time loses events
  * silently. Within a batch events are sorted before folding.
  * StreamingSemanticsSpec asserts closed-session output equals the
  * q138 batch operator row-for-row, including the watermark-forced
  * final flush and post-timeout resumption.
  */
object StreamingSessionize {

  case class Ev(key: Long, ts: Timestamp, id: Long)
  case class Sess(key: Long, sess: Long, n_events: Long, start_ms: Long,
      end_ms: Long, dur_ms: Long)
  case class Open(sess: Long, startMs: Long, lastMs: Long, n: Long)

  def sessions(events: Dataset[Ev], gapMs: Long)(
      implicit spark: SparkSession): Dataset[Sess] = {
    import spark.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Ev], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            val o = state.get
            // keep the counter (n = 0 marks "no open session") — a
            // removed state would renumber the key's next session
            state.update(o.copy(n = 0))
            Iterator(Sess(key, o.sess, o.n, o.startMs, o.lastMs,
              o.lastMs - o.startMs))
          } else {
            val out = Seq.newBuilder[Sess]
            var open = state.getOption.filter(_.n > 0)
            var lastClosed = state.getOption.map(_.sess).getOrElse(0L)
            it.toSeq.sortBy(e => (e.ts.getTime, e.id)).foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(o) if t - o.lastMs > gapMs =>
                  out += Sess(key, o.sess, o.n, o.startMs, o.lastMs,
                    o.lastMs - o.startMs)
                  open = Some(Open(o.sess + 1, t, t, 1))
                case Some(o) =>
                  open = Some(o.copy(lastMs = math.max(o.lastMs, t),
                    n = o.n + 1))
                case None =>
                  open = Some(Open(lastClosed + 1, t, t, 1))
              }
            }
            open.foreach { o =>
              state.update(o)
              state.setTimeoutTimestamp(o.lastMs + gapMs + 1)
            }
            out.result().iterator
          }
      }
  }
}
