package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Control-plane metadata sync (SURVEY §2A A1–A13, §3.1): each tick
  * computes `discovered(src) ∖ mirrored(dst)` per level of the
  * tenant → namespace → topic → partition tree and emits idempotent
  * create actions. The reference's conflict-as-success
  * (`ConflictException` swallowed, e.g. `PulsarTenantSyncManager
  * .java:79`) becomes an anti-join pre-filter: rows that already exist
  * on dst never become actions, so re-ticks are cheap no-ops and
  * replays are safe (§2A A21/A22).
  *
  * Everything here is a pure DataFrame → DataFrame function; the
  * side-effecting "apply actions to the destination admin API" step is
  * the caller's `foreachPartition`, which keeps this testable and lets
  * Catalyst plan the diffs (broadcast for small metadata sets).
  */
object MetadataSync {

  /** Rows present on src but missing on dst — the create set.
    * (A3/A6/A9/A12's merge, minus the rows that would conflict.)
    */
  def missing(src: DataFrame, dst: DataFrame, keys: Seq[String]): DataFrame =
    src.join(dst.select(keys.map(col): _*), keys, "left_anti")

  /** A2: tenant create payload rewrites allowedClusters to the
    * destination's cluster set
    * (`PulsarTenantSyncManager.java:71-78`).
    */
  def tenantCreates(
      srcTenants: DataFrame,
      dstTenants: DataFrame,
      dstClusters: Seq[String]): DataFrame =
    missing(srcTenants, dstTenants, Seq("tenant"))
      .withColumn("allowedClusters",
        lit(dstClusters.toArray).cast("array<string>"))

  /** A5/A6: namespaces carry their full policies verbatim
    * (`PulsarNamespaceSyncManager.java:74-79`).
    */
  def namespaceCreates(srcNs: DataFrame, dstNs: DataFrame): DataFrame =
    missing(srcNs, dstNs, Seq("tenant", "namespace"))

  /** A8: the logical topic list excludes physical partition topics
    * (`topic.contains("-partition")`,
    * `PulsarTopicSyncManager.java:72-74`).
    */
  def logicalTopics(topics: DataFrame): DataFrame =
    topics.filter(!col("topic").contains("-partition"))

  /** A9/A12: topic create set (both partitioned and non-partitioned;
    * partitioned rows keep partition count + properties).
    */
  def topicCreates(srcTopics: DataFrame, dstTopics: DataFrame): DataFrame =
    missing(logicalTopics(srcTopics), logicalTopics(dstTopics),
      Seq("tenant", "namespace", "topic"))

  /** A13: expand each partitioned topic into its physical partition
    * topics `topic + "-partition-" + i`
    * (`PulsarPartitionedTopicSyncWorker.java:71-73`, `Const.java:24`).
    */
  def partitionFanout(topics: DataFrame): DataFrame =
    topics.filter(col("partitioned") && col("partitions") > 0)
      .select(col("tenant"), col("namespace"), col("topic"), col("partitions"),
        explode(sequence(lit(0), col("partitions") - 1)).as("partitionIndex"))
      .withColumn("physicalTopic",
        concat(col("topic"), lit("-partition-"), col("partitionIndex").cast("string")))

  /** Physical partitions present on src but missing on dst — covers
    * both brand-new partitioned topics AND partition-count growth on
    * topics that already exist on dst (the reference re-fetches
    * partition metadata every minute and spawns workers for new
    * indexes, `PulsarPartitionedTopicSyncWorker.java:64-80`; a plain
    * topic-name anti-join would miss growth).
    */
  def partitionCreates(srcTopics: DataFrame, dstTopics: DataFrame): DataFrame =
    missing(
      partitionFanout(logicalTopics(srcTopics)),
      partitionFanout(logicalTopics(dstTopics)),
      Seq("tenant", "namespace", "topic", "partitionIndex"))

  /** Schema sync — the reference's README claims schema replication as
    * a goal (`README.md:4`) but ships NO code for it (SURVEY §1.2
    * documents the gap); this is the natural extension using the same
    * anti-join plane: a schema version present on src but missing on
    * dst becomes an idempotent create. Keyed by (tenant, namespace,
    * topic, version) so re-registering an old version is a no-op and
    * version history replicates in full.
    */
  def schemaCreates(srcSchemas: DataFrame, dstSchemas: DataFrame): DataFrame =
    missing(srcSchemas, dstSchemas,
      Seq("tenant", "namespace", "topic", "version"))

  /** One control-plane tick: the full create plan for a level-ordered
    * apply (tenants before namespaces before topics). Returned frames
    * are the exact argument order the applier needs.
    * `srcTopicsForPartitions` lets the caller gate the partition-diff
    * refresh independently of the topic level (SyncConfig
    * .autoUpdatePartition vs .autoUpdateTopic); it defaults to
    * `srcTopics`.
    */
  case class TickPlan(
      tenants: DataFrame,
      namespaces: DataFrame,
      topics: DataFrame,
      partitions: DataFrame)

  def tick(
      srcTenants: DataFrame, dstTenants: DataFrame,
      srcNs: DataFrame, dstNs: DataFrame,
      srcTopics: DataFrame, dstTopics: DataFrame,
      dstClusters: Seq[String],
      srcTopicsForPartitions: DataFrame = null): TickPlan = {
    val t = tenantCreates(srcTenants, dstTenants, dstClusters)
    val ns = namespaceCreates(srcNs, dstNs)
    val tp = topicCreates(srcTopics, dstTopics)
    val srcForParts = Option(srcTopicsForPartitions).getOrElse(srcTopics)
    // partitions are only created for topics that will exist on dst
    // after this tick (already there, or in tp's create set) — a
    // partition-only refresh (autoUpdatePartition without
    // autoUpdateTopic) must not materialize orphan physical partitions
    // for topics whose metadata was never created on dst
    val keys = Seq("tenant", "namespace", "topic")
    val willExist = logicalTopics(dstTopics).select(keys.map(col): _*)
      .unionByName(tp.select(keys.map(col): _*))
    val partsSrc = logicalTopics(srcForParts).join(willExist, keys, "left_semi")
    val parts = partitionCreates(partsSrc, dstTopics)
    TickPlan(t, ns, tp, parts)
  }
}
