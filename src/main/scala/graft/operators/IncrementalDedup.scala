package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (delta) near-dup dedup: a persisted fingerprint index
  * plus an `append(delta)` that folds new documents into the mined
  * pair list and cluster labels WITHOUT re-touching old corpus text —
  * the batch twin of the streaming near-dup query (q70) and the
  * operational shape the reference itself has (its sync ticks are
  * incremental and idempotent: re-scans diff against what exists,
  * `PulsarTenantSyncManager.java:56-58`, conflict-as-success
  * `:76-85`). At 100 TB nobody re-mines the corpus per snapshot; the
  * index turns per-tick cost from O(corpus text) into O(delta text +
  * index IO).
  *
  * Index layout (parquet under one directory):
  *   - `docs`      (doc)                 — every indexed id
  *   - `shingles`  (doc, blk, shingle)   — the int64-hashed distinct
  *                  shingle frame ([[Dedup.shingleFrame]]); ~8-byte
  *                  keys, columnar — re-reading this is the "no text
  *                  rescan" guarantee
  *   - `pairs`     (id_a, id_b, jaccard) — mined pairs so far
  *   - `labels`    (doc, cluster)        — connected components so far
  *   - `meta`      (version, n, threshold, max_df) — config
  *                  fingerprint; `append` refuses an index whose
  *                  schema version it does not understand
  *
  * EXACTNESS: `append` produces byte-identical pairs/labels to a full
  * re-mine of old ∪ delta (q75's oracle asserts it end-to-end):
  *
  *   - Pair mining is restricted to pairs with an endpoint in
  *     `delta ∪ affectedOld`, where `affectedOld` = old docs holding a
  *     shingle whose document frequency crossed the hot-shingle cap
  *     because of the delta (DF only grows on append). Old pairs with
  *     neither endpoint affected are carried over verbatim: neither
  *     their surviving shingle sets nor sizes can have changed — a
  *     shared shingle that crossed the cap would make both endpoints
  *     affected. Affected pairs are re-derived from the INDEX (the
  *     shingle frame), not from text.
  *   - Label folding re-runs pointer-jumped connected components only
  *     over TOUCHED components (old components holding an affected
  *     doc, a re-mined pair endpoint, or a dropped-pair endpoint, plus
  *     all delta docs); untouched components keep their labels. No
  *     edge can cross out of the touched set: an old pair's endpoints
  *     share a component, and every new pair's endpoints are touched
  *     by construction.
  *
  * Scale shape: per append, ONE delta-text shingling pass, linear
  * narrow-column index IO (shingle re-write + two DF aggregates), a
  * restrict × index equi-join for candidates (delta-sized output), and
  * a CC loop over the touched subgraph only. For multi-append
  * deployments at 100 TB, bucket the shingle table by `shingle`
  * (ScaleOps.writeBucketed) so the candidate join stops shuffling the
  * index side, and compact the index periodically.
  */
object IncrementalDedup {

  private val SchemaVersion = 1

  /** Everything an append produces: the updated label/pair frames
    * (backed by `outDir` parquet) and the touched-cluster ids — the
    * subset a survivor recompute actually needs to revisit.
    */
  final case class Appended(
      labels: DataFrame,
      pairs: DataFrame,
      touchedClusters: DataFrame)

  /** Mine `docs` from scratch and persist the fingerprint index under
    * `dir`. The initial pairs/labels are exactly
    * [[Dedup.ngramJaccardPairs]] + [[Dedup.clusters]] over `docs`.
    * Document ids must be non-null and unique (the delta-append
    * disjointness contract needs identity).
    */
  def buildIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int,
      threshold: Double,
      maxShingleDocFreq: Int,
      dir: String): Unit = {
    val spark = docs.sparkSession
    docs.filter(col(idCol).isNotNull).select(col(idCol).as("doc"))
      .write.mode("overwrite").parquet(s"$dir/docs")
    Dedup.shingleFrame(docs, idCol, textCol, blockCol, n)
      .write.mode("overwrite").parquet(s"$dir/shingles")
    // mine from the WRITTEN index, not the in-memory plan: one
    // shingling pass total, and the persisted frame is proven to be
    // what mining consumes (no drift between index and result)
    val sh = spark.read.parquet(s"$dir/shingles")
    Dedup.pairsFromShingles(sh, threshold, maxShingleDocFreq)
      .write.mode("overwrite").parquet(s"$dir/pairs")
    val pairs = spark.read.parquet(s"$dir/pairs")
    Dedup.clusters(spark.read.parquet(s"$dir/docs"), "doc", pairs)
      .write.mode("overwrite").parquet(s"$dir/labels")
    writeMeta(spark, dir, n, threshold, maxShingleDocFreq)
  }

  /** Fold `delta` into the index at `indexDir`, writing the updated
    * index to `outDir` (callers rotate directories between ticks; an
    * in-place overwrite would race its own readers). Returns the
    * updated labels/pairs plus the touched-cluster set. Delta ids must
    * be disjoint from the indexed ids — checked, fails loudly.
    */
  def append(
      delta: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      indexDir: String,
      outDir: String): Appended = {
    val spark = delta.sparkSession
    val (n, threshold, maxDf) = readMeta(spark, indexDir)

    val docsOld = spark.read.parquet(s"$indexDir/docs")
    val shOld = spark.read.parquet(s"$indexDir/shingles")
    val pairsOld = spark.read.parquet(s"$indexDir/pairs")
    val labelsOld = spark.read.parquet(s"$indexDir/labels")

    val deltaDocs = delta.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc"))
    val overlap = docsOld.join(deltaDocs, "doc").limit(1).count()
    require(overlap == 0,
      "delta ids must be disjoint from the indexed corpus " +
        "(append is insert-only; re-ingesting a doc would double-count " +
        "its shingles)")

    // ONE text-shingling pass — over the delta only; materialized
    // because both the index write and the DF aggregate below read it
    val shDelta = Dedup.shingleFrame(delta, idCol, textCol, blockCol, n)
      .localCheckpoint(true)
    shOld.unionByName(shDelta)
      .write.mode("overwrite").parquet(s"$outDir/shingles")
    docsOld.unionByName(deltaDocs)
      .write.mode("overwrite").parquet(s"$outDir/docs")
    val shAll = spark.read.parquet(s"$outDir/shingles")

    // shingles whose DF crossed the cap BECAUSE of the delta: their
    // old holders' surviving sets (and set sizes) changed, so every
    // pair touching those docs must be re-derived from the index.
    // Old and combined DFs come from ONE origin-tagged aggregate over
    // the union (two separate full-index aggregates, round-6 v1, paid
    // a second linear pass for the same numbers); the near-empty hot
    // lists are checkpointed so the mining pass reuses them.
    val dfBoth = shOld.withColumn("__new", lit(0L))
      .unionByName(shDelta.withColumn("__new", lit(1L)))
      .groupBy(col("blk"), col("shingle"))
      .agg(count(lit(1)).as("__c"), sum(col("__new")).as("__cnew"))
      .filter(col("__c") > maxDf)
      .localCheckpoint(true)
    val hotAll = dfBoth.select(col("blk"), col("shingle"))
    val newlyHot = dfBoth
      .filter(col("__c") - col("__cnew") <= maxDf)
      .select(col("blk"), col("shingle"))
    val affectedOld = shOld.join(newlyHot, Seq("blk", "shingle"), "left_semi")
      .select(col("doc")).distinct()

    // restrict is materialized once: it seeds the candidate join, two
    // anti-joins and the touched-component expansion below
    val restrict = affectedOld.unionByName(deltaDocs).distinct()
      .localCheckpoint(true)

    // the restricted mine is materialized ONCE — it feeds both the
    // pairs write and the touched-component seed below (an earlier
    // revision derived them independently and mined twice)
    val minedM = Dedup.pairsFromShinglesRestricted(
        shAll, restrict, threshold, maxDf, precomputedHot = Some(hotAll))
      .localCheckpoint(true)
    val keptOld = pairsOld
      .join(restrict.select(col("doc").as("id_a")), Seq("id_a"), "left_anti")
      .join(restrict.select(col("doc").as("id_b")), Seq("id_b"), "left_anti")
      .select(col("id_a"), col("id_b"), col("jaccard"))
    keptOld.unionByName(minedM)
      .write.mode("overwrite").parquet(s"$outDir/pairs")
    val pairsNew = spark.read.parquet(s"$outDir/pairs")

    // touched components: restricted docs, endpoints of every re-mined
    // pair (a delta doc can pair with ANY old doc), and endpoints of
    // every dropped old pair (a drop can split a component)
    // dropped = old pairs with EITHER endpoint restricted (exactly the
    // complement of keptOld) — derived directly from restrict rather
    // than an anti-join of keptOld against its own parent lineage
    val droppedTouched = pairsOld
      .join(restrict.select(col("doc").as("id_a")), Seq("id_a"), "left_semi")
      .unionByName(pairsOld
        .join(restrict.select(col("doc").as("id_b")), Seq("id_b"), "left_semi"))
    val touchedSeed = restrict
      .unionByName(minedM.select(col("id_a").as("doc")))
      .unionByName(minedM.select(col("id_b").as("doc")))
      .unionByName(droppedTouched.select(col("id_a").as("doc")))
      .unionByName(droppedTouched.select(col("id_b").as("doc")))
      .distinct()
    val touchedClusters = labelsOld
      .join(touchedSeed, labelsOld("doc") === touchedSeed("doc"), "left_semi")
      .select(col("cluster")).distinct()
      .localCheckpoint(true)
    val touchedOldDocs = labelsOld
      .join(touchedClusters, Seq("cluster"), "left_semi")
      .select(col("doc"))
    val subDocs = touchedOldDocs.unionByName(deltaDocs)
    // a kept pair's endpoints share an old component, so one
    // endpoint's membership decides the pair's
    val subPairs = keptOld
      .join(touchedOldDocs.select(col("doc").as("id_a")), Seq("id_a"), "left_semi")
      .unionByName(minedM)
    val subLabels = foldLabels(spark, subDocs, subPairs)
    labelsOld.join(touchedClusters, Seq("cluster"), "left_anti")
      .select(col("doc"), col("cluster"))
      .unionByName(subLabels.select(col("doc"), col("cluster")))
      .write.mode("overwrite").parquet(s"$outDir/labels")
    writeMeta(spark, outDir, n, threshold, maxDf)

    Appended(
      labels = spark.read.parquet(s"$outDir/labels"),
      pairs = pairsNew,
      touchedClusters = touchedClusters)
  }

  /** Connected components over the touched subgraph, size-routed
    * (same discipline as the cosine byte gate and the arrival-rank
    * router): a routine delta tick touches a near-dup subgraph of at
    * most delta-sized edge count, and the distributed pointer-jumping
    * loop pays ~8-10 fixed Spark jobs (per-round joins, checkpoints,
    * convergence counts) that dwarf the actual work — so below
    * `maxDriverEdges` LONG-keyed edges the components are solved with
    * one collect + union-find on the driver (bounded by the edge
    * count, NOT the corpus) and joined back. Larger subgraphs — or
    * non-long doc ids — take [[Dedup.clusters]]' distributed loop.
    * Both produce cluster = min reachable id; equality is spec-pinned
    * on random graphs.
    */
  private[operators] def foldLabels(
      spark: SparkSession,
      subDocs: DataFrame,
      subPairs: DataFrame,
      maxDriverEdges: Long = 200000L): DataFrame = {
    val longKeyed = subDocs.schema.fields.head.dataType ==
      org.apache.spark.sql.types.LongType
    val nEdges = if (longKeyed) subPairs.count() else Long.MaxValue
    if (nEdges > maxDriverEdges) Dedup.clusters(subDocs, "doc", subPairs)
    else {
      val edges = subPairs.select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) {
          val next = parent.getOrElse(c, c); parent(c) = r; c = next
        }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // root ids are chosen min-first by the union rule, but path
      // lengths can hide a smaller member behind a root — resolve the
      // true min per component explicitly
      val byRoot = nodes.groupBy(find)
      val label = byRoot.toSeq.flatMap { case (_, members) =>
        val m = members.min
        members.toSeq.map(_ -> m)
      }
      import spark.implicits._
      val lblDf = label.toSeq.toDF("doc", "__lbl")
      subDocs.join(lblDf, Seq("doc"), "left")
        .select(col("doc"), coalesce(col("__lbl"), col("doc")).as("cluster"))
    }
  }

  private def writeMeta(spark: SparkSession, dir: String, n: Int,
      threshold: Double, maxDf: Int): Unit = {
    import spark.implicits._
    Seq((SchemaVersion, n, threshold, maxDf))
      .toDF("version", "n", "threshold", "max_df")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def readMeta(spark: SparkSession,
      dir: String): (Int, Double, Int) = {
    val m = spark.read.parquet(s"$dir/meta").collect()
    require(m.length == 1, s"corrupt index meta at $dir/meta")
    val r = m(0)
    val ver = r.getAs[Int]("version")
    require(ver == SchemaVersion,
      s"index at $dir has schema version $ver; this build understands " +
        s"$SchemaVersion — rebuild the index")
    (r.getAs[Int]("n"), r.getAs[Double]("threshold"), r.getAs[Int]("max_df"))
  }
}
