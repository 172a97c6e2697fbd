package graft

import org.apache.spark.sql.functions._

/** Batch-replayable streaming semantics (SURVEY §2B S-2/S-3): the
  * window operators used by the streaming plane, verified against the
  * oracle by running them in batch mode over `events` (identical
  * semantics; the MemoryStream-driven variants live in the ScalaTest
  * streaming suite where the oracle can't reach).
  */
object StreamingQueries extends QueryGroup {

  // ---------------------------------------------------------------- S-2
  // Tumbling 1-minute window (epoch-aligned = date_trunc minute) — the
  // reference's 60 s sampling cadence (PulsarPartitionSyncWorker
  // .java:236).
  q("q39_tumbling_window",
    s"""SELECT epoch_ms(date_trunc('minute', ts)) AS wstart_ms,
       |  count(*) AS n, ${sqlRound("sum(value)", 2)} AS val_sum
       |FROM events
       |GROUP BY date_trunc('minute', ts)
       |ORDER BY wstart_ms""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"), pround(sum(col("value")), 2).as("val_sum"))
      .select(unix_millis(col("window.start")).as("wstart_ms"),
        col("n"), col("val_sum"))
      .orderBy(col("wstart_ms"))
  }

  // S-2 sliding window: 10-minute windows sliding every 5 — each event
  // lands in exactly 2 windows. Oracle enumerates the two candidate
  // 5-minute-aligned starts per event and keeps those whose window
  // covers the event.
  q("q50_sliding_window",
    s"""WITH c AS (
       |  SELECT e.*, unnest([date_trunc('minute', ts) - INTERVAL (EXTRACT(minute FROM ts)::INT % 5) MINUTE,
       |                      date_trunc('minute', ts) - INTERVAL (EXTRACT(minute FROM ts)::INT % 5) MINUTE - INTERVAL 5 MINUTE]) AS wstart
       |  FROM events e),
       |w AS (SELECT * FROM c WHERE ts >= wstart AND ts < wstart + INTERVAL 10 MINUTE)
       |SELECT epoch_ms(wstart) AS wstart_ms, count(*) AS n,
       |  ${sqlRound("sum(value)", 2)} AS val_sum
       |FROM w GROUP BY wstart ORDER BY wstart_ms""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"), pround(sum(col("value")), 2).as("val_sum"))
      .select(unix_millis(col("window.start")).as("wstart_ms"),
        col("n"), col("val_sum"))
      .orderBy(col("wstart_ms"))
  }

  // ---------------------------------------------------------------- S-3
  // Session windows per user (10 min gap). Oracle = gaps-and-islands:
  // a session breaks when the gap to the previous event is >= the gap
  // duration (Spark merges events with ts < current session end =
  // last ts + gap).
  q("q40_session_window",
    """WITH x AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts >= lag(ts) OVER w + INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |g AS (
      |  SELECT user_id, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM x)
      |SELECT user_id, epoch_ms(min(ts)) AS sstart_ms,
      |  epoch_ms(max(ts) + INTERVAL 10 MINUTE) AS send_ms, count(*) AS n
      |FROM g GROUP BY user_id, grp
      |ORDER BY user_id, sstart_ms""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("sstart_ms"),
        unix_millis(col("session_window.end")).as("send_ms"),
        col("n"))
      .orderBy(col("user_id"), col("sstart_ms"))
  }
}
