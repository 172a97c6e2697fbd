package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Engine sync configuration — the Spark-native equivalent of the
  * reference's `SyncConfig` (`SyncConfig.java:29-41`): a subscription
  * name for the mirror consumer and one auto-update flag per tree
  * level (`false` = sync that level once on the initial tick, `true` =
  * re-scan it on every periodic tick, SURVEY §2A A21 — enforced by
  * `tickMetadata(refreshOnly)`). `autoUpdatePartition` exists in the
  * reference but is never read there (SURVEY §2A quirks); here it
  * gates the partition-growth refresh: on refresh ticks the
  * partition diff (`MetadataSync.partitionCreates` →
  * `DestinationCluster.createPartitions`) runs when this flag or
  * `autoUpdateTopic` is set, restricted to topics already mirrored on
  * the destination.
  */
case class SyncConfig(
    subscriptionName: String = "graft-sync",
    autoUpdateTenant: Boolean = false,
    autoUpdateNamespace: Boolean = false,
    autoUpdateTopic: Boolean = false,
    autoUpdatePartition: Boolean = false)

/** Read side of a cluster's metadata + message stream (what the
  * reference reaches through `PulsarAdmin`/`PulsarClient` on the
  * source). DataFrame-shaped so a live DataSource-V2 connector, a
  * file-backed fixture, or an in-memory fake all plug in identically.
  */
trait SourceCluster {
  def tenants: DataFrame // tenant, allowedClusters
  def namespaces: DataFrame // tenant, namespace, policiesJson
  def topics: DataFrame // tenant, namespace, topic, partitioned, partitions, properties
  /** Raw message stream (RawMessage schema), Earliest position. */
  def messages: DataFrame
  def cursorStats: DataFrame // CursorStat schema
}

/** Write/admin side of the destination cluster. Creates MUST be
  * conflict-as-success idempotent (the reference swallows
  * `ConflictException`, e.g. `PulsarTenantSyncManager.java:79`).
  */
trait DestinationCluster {
  def clusters: Seq[String]
  def tenants: DataFrame
  def namespaces: DataFrame
  def topics: DataFrame
  def createTenants(rows: Seq[TenantRow]): Unit
  def createNamespaces(rows: Seq[NamespaceRow]): Unit
  def createTopics(rows: Seq[TopicRow]): Unit
  /** Create missing physical partitions (incl. partition-count growth
    * on an already-synced topic). Default no-op: destinations that
    * create all partitions as part of the partitioned-topic create can
    * ignore it.
    */
  def createPartitions(rows: Seq[PartitionRow]): Unit = ()
  def sink: DestinationSink
  def hasActiveCursor(topic: String, partition: Int, cursor: String): Boolean
  def applyCursorAction(action: CursorAction): Unit
}

/** The reference's `PulsarSync` re-expressed Spark-first: the control
  * plane is a batch anti-join tick ([[MetadataSync]]), the data plane
  * a Structured Streaming mirror ([[MessageMirror]]), cursor
  * translation an as-of join + keyed state machine
  * ([[OffsetIndex]]/[[CursorSync]]). The reference's scheduled
  * executor cadences (3 min / 1 min / 10 s) become the caller's
  * trigger policy: run [[tickMetadata]]/[[syncCursors]] from any
  * scheduler, run [[startMirror]] once per topology with the trigger
  * of your choice (`AvailableNow` = the reference's one-shot mode).
  */
class SyncPipeline(
    spark: SparkSession,
    source: SourceCluster,
    dest: DestinationCluster,
    conf: SyncConfig = SyncConfig()) {

  /** One control-plane tick (A1–A13): compute the per-level create
    * plan and apply it level-ordered. Returns created counts per level
    * (tenants, namespaces, topics). Safe to re-run at any cadence.
    *
    * `refreshOnly = true` marks a periodic re-tick: only levels whose
    * `autoUpdate*` flag is set are re-scanned (the reference schedules
    * each level's manager independently; levels with the flag off sync
    * exactly once, on the initial tick).
    */
  def tickMetadata(refreshOnly: Boolean = false): (Long, Long, Long) = {
    def gate(df: => DataFrame, enabled: Boolean): DataFrame =
      if (!refreshOnly || enabled) df else df.limit(0)
    // fetch the topic listing once per tick: a live source issues an
    // admin call per access, and two snapshots could disagree between
    // the topic-create and partition-create plans
    val srcTopics = source.topics
    val plan = MetadataSync.tick(
      gate(source.tenants, conf.autoUpdateTenant), dest.tenants,
      gate(source.namespaces, conf.autoUpdateNamespace), dest.namespaces,
      gate(srcTopics, conf.autoUpdateTopic), dest.topics,
      dest.clusters,
      // partition growth refreshes on its own flag (the reference
      // re-checks partition metadata on a faster cadence than topics);
      // MetadataSync.tick restricts it to topics existing on dst
      srcTopicsForPartitions =
        gate(srcTopics, conf.autoUpdateTopic || conf.autoUpdatePartition))
    // metadata sets are tiny relative to the data plane; the apply
    // step is a driver-side admin call series, exactly like the
    // reference's async create chain
    val tenants = plan.tenants.collect().map { r =>
      TenantRow(r.getAs[String]("tenant"),
        r.getSeq[String](r.fieldIndex("allowedClusters")))
    }.toSeq
    dest.createTenants(tenants)
    val namespaces = plan.namespaces.collect().map { r =>
      NamespaceRow(r.getAs[String]("tenant"), r.getAs[String]("namespace"),
        r.getAs[String]("policiesJson"))
    }.toSeq
    dest.createNamespaces(namespaces)
    val topics = plan.topics.collect().map { r =>
      TopicRow(r.getAs[String]("tenant"), r.getAs[String]("namespace"),
        r.getAs[String]("topic"), r.getAs[Boolean]("partitioned"),
        r.getAs[Int]("partitions"),
        Option(r.getAs[Map[String, String]]("properties")).getOrElse(Map.empty))
    }.toSeq
    dest.createTopics(topics)
    val partitions = plan.partitions.collect().map { r =>
      PartitionRow(r.getAs[String]("tenant"), r.getAs[String]("namespace"),
        r.getAs[String]("topic"), r.getAs[Int]("partitionIndex"),
        r.getAs[String]("physicalTopic"))
    }.toSeq
    dest.createPartitions(partitions)
    (tenants.size.toLong, namespaces.size.toLong, topics.size.toLong)
  }

  /** Start the data-plane mirror (A14). One streaming query for the
    * whole topology — partitioning by (topic, partition) inside the
    * batch write preserves the reference's per-partition ordering
    * without one query per topic. When `offsets` is given, every
    * successful publish records its src→dst MessageId mapping (A15),
    * which [[syncCursors]] then consumes — the closed loop the
    * reference runs between its data plane and cursor plane.
    */
  def startMirror(checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      deadLetter: Option[DeadLetterSink] = None,
      offsets: Option[OffsetRecorder] = None) =
    MessageMirror.start(source.messages, dest.sink, checkpointDir, trigger,
      deadLetter, offsets).start()

  /** Continuous mode (A21): schedule metadata re-scan ticks at the
    * reference's cadence semantics — `autoUpdate*` false ⇒ one
    * immediate tick only, true ⇒ fixed-delay re-ticks. The reference
    * uses one 10-thread ScheduledExecutorService for all levels
    * (`PulsarSync.java:44`); the control plane here is a single
    * anti-join tick, so one scheduler thread suffices — the heavy
    * lifting happens on the Spark cluster, not the scheduler.
    * Returns a handle whose `close()` stops rescheduling.
    */
  def runContinuous(
      metadataPeriodMillis: Long = 3 * 60 * 1000L): AutoCloseable = {
    val exec = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      r => { val t = new Thread(r, "graft-sync-ticker"); t.setDaemon(true); t })
    val anyAuto = conf.autoUpdateTenant || conf.autoUpdateNamespace ||
      conf.autoUpdateTopic || conf.autoUpdatePartition
    val first = new java.util.concurrent.atomic.AtomicBoolean(true)
    val task: Runnable = () =>
      // A23: a failed tick logs (with stack trace — getMessage alone
      // hides NPEs) and waits for the next cadence; only fatal VM
      // errors propagate (and then scheduleWithFixedDelay stops, so
      // log them first rather than dying silently)
      try tickMetadata(refreshOnly = !first.getAndSet(false))
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft-sync] tick failed: $e")
          e.printStackTrace()
        case e: Throwable =>
          System.err.println(s"[graft-sync] tick died fatally: $e")
          e.printStackTrace()
          throw e
      }
    if (anyAuto)
      exec.scheduleWithFixedDelay(task, 0L, metadataPeriodMillis,
        java.util.concurrent.TimeUnit.MILLISECONDS)
    else {
      exec.submit(task)
      exec.shutdown() // one-shot: thread exits once the tick finishes
    }
    // graceful: stop rescheduling, let an in-flight tick finish (an
    // interrupt mid-apply could leave a level half-created)
    () => exec.shutdown()
  }

  // last mirrored position per cursor, persisted across ticks — the
  // reference's cursorSet/cursorPositionSet (PulsarPartitionSyncWorker
  // .java:158,174); the continuous-mode equivalent is the
  // flatMapGroupsWithState state store (CursorSync.actions).
  private val cursorState =
    scala.collection.mutable.Map.empty[(String, Int, String), CursorState]

  /** One cursor-plane tick (A15–A19): sparse-sample the offset map,
    * as-of translate the observed cursor positions, decide
    * create/reset per cursor, apply to the destination.
    */
  def syncCursors(offsetMap: DataFrame): Seq[CursorAction] = {
    val index = OffsetIndex.sparseSample(offsetMap)
    val translated = OffsetIndex.translate(source.cursorStats, index)
    val stats = translated.collect().map { r =>
      val topic = r.getAs[String]("topic")
      val partition = r.getAs[Int]("partition")
      val cursor = r.getAs[String]("cursor")
      TranslatedCursorStat(topic, partition, cursor,
        r.getAs[Long]("readLedger"), r.getAs[Long]("readEntry"),
        Option(r.get(r.fieldIndex("dstLedger"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("dstEntry"))).map(_.asInstanceOf[Long]),
        dest.hasActiveCursor(topic, partition, cursor),
        r.getAs[java.sql.Timestamp]("observedTs"))
    }.toSeq
    val actions = stats.groupBy(s => (s.topic, s.partition, s.cursor)).toSeq
      .sortBy(_._1)
      .flatMap { case (key, ss) =>
        val (acts, newState) = CursorSync.decidePure(key, cursorState.get(key), ss)
        newState.foreach(cursorState.update(key, _))
        acts
      }
    actions.foreach(dest.applyCursorAction)
    actions
  }
}
