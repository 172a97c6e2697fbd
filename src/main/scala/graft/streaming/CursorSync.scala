package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.AsOfJoin

/** Cursor (subscription) translation — SURVEY §2A A15–A19, §3.3.
  *
  * The reference keeps a two-tier src→dst MessageId index (dense
  * 1-minute cache + sparse ≥1-sample/minute skip-list with 1 h
  * retention, `PulsarPartitionSyncWorker.java:71-85,236-240`,
  * `SparseMap.java`) and translates observed cursor positions with a
  * floor lookup, then creates/resets destination subscriptions.
  *
  * Spark mapping: the index is a DataFrame maintained by
  * [[OffsetIndex.sparseSample]]; translation is the as-of join
  * ([[OffsetIndex.translate]], no-floor ⇒ null — fixing the
  * reference's NPE, `SparseMap.java:57`); the create/reset/skip
  * decision is a per-key state machine in `flatMapGroupsWithState`
  * ([[CursorSync.decide]]).
  */
object OffsetIndex {

  /** A16: keep the FIRST mapping per (topic, partition, minute), and
    * expire entries older than `retentionMinutes` relative to the
    * newest sample of their partition (the reference evicts on put
    * against wall-clock; event-time-relative keeps tests
    * deterministic). Tie-break inside a minute: smallest
    * (srcLedger, srcEntry).
    */
  def sparseSample(offsetMap: DataFrame, retentionMinutes: Int = 60): DataFrame = {
    val minuteCol = date_trunc("minute", col("recordedTs"))
    val w = Window
      .partitionBy(col("topic"), col("partition"), minuteCol)
      .orderBy(col("recordedTs"), col("srcLedger"), col("srcEntry"))
    val wMax = Window.partitionBy(col("topic"), col("partition"))
    // retention FIRST, then pick each minute's representative among
    // the surviving rows — the other order silently drops a whole
    // minute whose first sample is just outside retention even though
    // later samples in that minute are inside it
    offsetMap
      .withColumn("__maxTs", max(col("recordedTs")).over(wMax))
      .filter(col("recordedTs") >= col("__maxTs") - expr(s"INTERVAL $retentionMinutes MINUTE"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__maxTs")
  }

  /** A17: translate each cursor observation to the greatest indexed
    * mapping with (srcLedger, srcEntry) <= read position, per
    * (topic, partition). Adds nullable dstLedger/dstEntry.
    */
  def translate(cursorStats: DataFrame, index: DataFrame): DataFrame = {
    val probe = cursorStats.withColumn("__pos",
      struct(col("readLedger").as("l"), col("readEntry").as("e")))
    val build = index.select(col("topic"), col("partition"),
      struct(col("srcLedger").as("l"), col("srcEntry").as("e")).as("__pos"),
      col("dstLedger"), col("dstEntry"))
    AsOfJoin.floorJoin(probe, build,
        keys = Seq("topic", "partition"),
        probeTs = "__pos", buildTs = "__pos",
        payload = Seq("dstLedger", "dstEntry"))
      .drop("__pos")
  }

  /** Two-tier translation, matching the reference's lookup order
    * (`PulsarPartitionSyncWorker.java:211-218`): an EXACT hit against
    * the full offset map first (the reference's dense 1-minute
    * `messageIdMap` cache — here the whole recorded map, a strict
    * superset of the reference's TTL'd tier), falling back to the
    * sparse floor sample only when the cursor sits on a message the
    * map never recorded. Without the dense tier, a cursor at a
    * just-copied message resolves to its minute's FIRST sample — up to
    * a minute early, extra redelivery after subscription create/reset.
    *
    * Both tiers are equi/as-of joins over the tiny cursor-stat probe
    * side; the offset map is the build side in both.
    */
  def translateTwoTier(
      cursorStats: DataFrame,
      offsetMap: DataFrame,
      retentionMinutes: Int = 60,
      denseRetentionMinutes: Int = 60): DataFrame = {
    val sparse = translate(cursorStats, sparseSample(offsetMap, retentionMinutes))
      .alias("s")
    // bound the dense build side with the same event-time-relative
    // retention rule as the sparse tier — the reference TTLs its dense
    // cache at 1 minute purely for heap reasons
    // (PulsarPartitionSyncWorker.java:71-72); here the bound exists so
    // the exact-match join's build side cannot grow with total stream
    // history at scale (wider default: an equi-join is indifferent to
    // window width, fidelity isn't)
    val wMax = Window.partitionBy(col("topic"), col("partition"))
    val dense = offsetMap
      .withColumn("__maxTs", max(col("recordedTs")).over(wMax))
      .filter(col("recordedTs") >=
        col("__maxTs") - expr(s"INTERVAL $denseRetentionMinutes MINUTE"))
      .select(col("topic"), col("partition"),
        col("srcLedger"), col("srcEntry"),
        col("dstLedger").as("__denseL"), col("dstEntry").as("__denseE"))
      .alias("d")
    sparse.join(dense,
        col("s.topic") === col("d.topic")
          && col("s.partition") === col("d.partition")
          && col("s.readLedger") === col("d.srcLedger")
          && col("s.readEntry") === col("d.srcEntry"), "left")
      .select(col("s.topic"), col("s.partition"), col("s.cursor"),
        col("s.readLedger"), col("s.readEntry"),
        coalesce(col("d.__denseL"), col("s.dstLedger")).as("dstLedger"),
        coalesce(col("d.__denseE"), col("s.dstEntry")).as("dstEntry"),
        col("s.observedTs"))
  }
}

/** Translated cursor observation: src read position + (nullable)
  * translated dst position + whether dst already has an active
  * consumer on this cursor (the reference leaves those alone,
  * `PulsarPartitionSyncWorker.java:190-193`).
  */
case class TranslatedCursorStat(
    topic: String,
    partition: Int,
    cursor: String,
    readLedger: Long,
    readEntry: Long,
    dstLedger: Option[Long],
    dstEntry: Option[Long],
    dstHasActive: Boolean,
    observedTs: java.sql.Timestamp)

/** Emitted action; `action` ∈ create | reset. Unchanged positions emit
  * nothing (the reference's skip, `:177-179`).
  */
case class CursorAction(
    topic: String,
    partition: Int,
    cursor: String,
    action: String,
    dstLedger: Option[Long],
    dstEntry: Option[Long])

/** Last mirrored src position per (topic, partition, cursor). */
case class CursorState(srcLedger: Long, srcEntry: Long)

object CursorSync {

  /** A19 state machine, one key = (topic, partition, cursor):
    *   - first sighting → `create` at the translated position;
    *   - same src position as last mirrored → no output;
    *   - moved → `reset`, unless the destination already has an active
    *     consumer on the cursor (it owns it now — skip).
    * Observations inside a batch are applied in observedTs order.
    */
  /** Pure state-machine core, shared by the streaming
    * (`flatMapGroupsWithState`) and tick ([[SyncPipeline.syncCursors]])
    * drivers: fold the batch of observations (in observedTs order)
    * over the last mirrored position.
    */
  def decidePure(
      key: (String, Int, String),
      last0: Option[CursorState],
      stats: Seq[TranslatedCursorStat]): (Seq[CursorAction], Option[CursorState]) = {
    val (topic, partition, cursor) = key
    val out = Seq.newBuilder[CursorAction]
    var last = last0
    stats.sortBy(s => (s.observedTs.getTime, s.readLedger, s.readEntry))
      .foreach { s =>
        val pos = CursorState(s.readLedger, s.readEntry)
        if (last.isEmpty) {
          out += CursorAction(topic, partition, cursor, "create", s.dstLedger, s.dstEntry)
          last = Some(pos)
        } else if (last.get != pos) {
          if (!s.dstHasActive) {
            out += CursorAction(topic, partition, cursor, "reset", s.dstLedger, s.dstEntry)
          }
          last = Some(pos)
        } // unchanged → skip
      }
    (out.result(), last)
  }

  def decide(
      key: (String, Int, String),
      stats: Iterator[TranslatedCursorStat],
      state: GroupState[CursorState]): Iterator[CursorAction] = {
    val (actions, newState) = decidePure(key, state.getOption, stats.toSeq)
    newState.foreach(state.update)
    actions.iterator
  }

  /** Wire the state machine over a (possibly streaming) Dataset. */
  def actions(stats: Dataset[TranslatedCursorStat])(
      implicit spark: SparkSession): Dataset[CursorAction] = {
    import spark.implicits._
    stats
      .groupByKey(s => (s.topic, s.partition, s.cursor))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(decide)
  }

  /** Batch twin of [[actions]]: every key's full observation set folds
    * through [[decidePure]] from empty state (one logical micro-batch),
    * with a per-key 1-based `ord` stamping each emitted action's fold
    * position — the deterministic relation q59's DuckDB oracle replays
    * as window/lag SQL (the fold's `last` always equals the PREVIOUS
    * observation's position, so lag() is an exact reformulation). One
    * shuffle on the state key; per-key state is a single position —
    * the same bounded-state shape the streaming operator carries.
    */
  def batchActions(stats: Dataset[TranslatedCursorStat]): DataFrame = {
    val spark = stats.sparkSession
    import spark.implicits._
    stats.groupByKey(s => (s.topic, s.partition, s.cursor))
      .flatMapGroups { (key: (String, Int, String), it: Iterator[TranslatedCursorStat]) =>
        val (actions, _) = decidePure(key, None, it.toSeq)
        actions.iterator.zipWithIndex.map { case (a, i) =>
          (a.topic, a.partition, a.cursor, (i + 1).toLong,
            a.action, a.dstLedger, a.dstEntry)
        }
      }.toDF("topic", "part", "cursor", "ord", "action", "dst_ledger", "dst_entry")
  }
}
