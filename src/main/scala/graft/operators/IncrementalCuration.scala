package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Incremental end-to-end curation: [[Curation.curate]]'s decision
  * frame maintained as a persisted index plus an `append(delta)` —
  * the operational upgrade that stops q69-style snapshots from
  * re-mining (and even re-READING) the full corpus per tick.
  *
  * Index layout (parquet under one directory):
  *   - `dedup/…`        — an [[IncrementalDedup]] index (shingles,
  *                        pairs, labels)
  *   - `eval-shingles`  — the eval corpus's distinct decontamination
  *                        shingles (the eval TEXT is never needed
  *                        again); frozen — rotation hardlinks it
  *   - `signals`        — per-doc row-local signals
  *                        (doc, passes, ok_quality, contaminated);
  *                        append-only — rotation hardlinks old files
  *                        and appends only the delta's
  *   - `decisions`      — the full q69-shaped decision frame,
  *                        PARTITIONED BY bkt = hash-bucket(cluster);
  *                        an append rewrites only buckets holding a
  *                        touched or newborn cluster
  *                        ([[IndexRotation.rotateBucketed]])
  *   - `meta`           — config fingerprint incl. the stopword list
  *
  * EXACTNESS: append(delta) reproduces [[Curation.curate]] over
  * old ∪ delta bit-for-bit (q80's oracle is q69's full-corpus SQL):
  *   - quality and contamination are ROW-LOCAL (and the eval set is
  *     frozen in the index), so old docs' signals cannot change —
  *     only the delta's are computed;
  *   - cluster labels come from [[IncrementalDedup.append]], which is
  *     itself exact;
  *   - the survivor argmax is recomputed ONLY for clusters that are
  *     not carried over unchanged — an untouched cluster keeps its
  *     membership AND its members' scores, so its decision rows are
  *     byte-stable. New/touched cluster ids can never collide with an
  *     untouched cluster's id (labels are member ids, and an
  *     untouched cluster's min-member is outside the touched
  *     subgraph), so the carry-over split is a clean anti-join.
  *
  * Per-tick cost: delta text scans (quality/contam/shingling), the
  * dedup index IO, and a survivor aggregate over the touched
  * clusters only. Since round 7 the rotation itself is copy-free:
  * untouched files and decision buckets are hardlinked into the
  * rotated directory, so per-tick WRITE IO is delta-sized too (the
  * round-6 design rewrote every frame in full per tick — a
  * corpus-linear narrow-column copy at 10⁹ docs).
  */
object IncrementalCuration {

  private val SchemaVersion = 2

  /** Bucket count for the partitioned decisions frame (fixed at build
    * time, persisted in meta).
    */
  private val DefaultNumBuckets = 64

  /** Build the curation index over `train` and `eval` under `dir`.
    * Parameters mirror [[Curation.curate]]; they are persisted in the
    * meta table so appends cannot drift from the build config.
    */
  def buildIndex(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      stopwords: Seq[String],
      shingleN: Int = 3,
      jaccardThreshold: Double = 0.8,
      decontamN: Int = 5,
      minOverlap: Int = 1,
      maxShingleDocFreq: Int = 1000,
      dir: String): Unit = {
    val spark = train.sparkSession
    IncrementalDedup.buildIndex(train, idCol, textCol, blockCol,
      shingleN, jaccardThreshold, maxShingleDocFreq, s"$dir/dedup")
    eval.select(explode(TextFns.textShingles(col(textCol), decontamN))
        .as("shingle")).distinct()
      .write.mode("overwrite").parquet(s"$dir/eval-shingles")
    signalsOf(train, idCol, textCol, stopwords,
        spark.read.parquet(s"$dir/eval-shingles"), decontamN, minOverlap)
      .write.mode("overwrite").parquet(s"$dir/signals")
    val labels = spark.read.parquet(s"$dir/dedup/labels")
      .select(col("doc"), col("cluster"))
    decisionsOf(labels, spark.read.parquet(s"$dir/signals"))
      .withColumn("bkt",
        IndexRotation.bucketOf(col("cluster"), DefaultNumBuckets))
      .repartition(col("bkt")) // one file per bucket
      .write.partitionBy("bkt").mode("overwrite").parquet(s"$dir/decisions")
    writeMeta(spark, dir, stopwords, decontamN, minOverlap, DefaultNumBuckets)
  }

  /** Fold `delta` into the index at `indexDir`, writing the updated
    * index to `outDir`. Returns the updated decision frame
    * (doc, cluster, passes, ok_quality, contaminated, keep_dedup,
    * keep) — identical to a from-scratch [[Curation.curate]] over
    * old ∪ delta.
    */
  def append(
      delta: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      indexDir: String,
      outDir: String): DataFrame = {
    val spark = delta.sparkSession
    val (stopwords, decontamN, minOverlap, numBuckets) =
      readMeta(spark, indexDir)

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    // eval set is frozen: hardlinked into the rotated index, no copy
    val evalShingles = IndexRotation.rotateFrozen(spark,
      s"$indexDir/eval-shingles", s"$outDir/eval-shingles")

    // row-local signals: old docs' signals cannot change, so the frame
    // is append-only — old files hardlink over, only the delta's
    // signals are new bytes. The whole signal pass (quality +
    // contamination over the delta text) is INDEPENDENT of the dedup
    // fold and runs concurrently with it — a tick's wall-clock is
    // the dedup fold, not dedup + signals in sequence.
    val signalsF = Future {
      IndexRotation.rotateAppendOnly(spark,
        s"$indexDir/signals", s"$outDir/signals",
        signalsOf(delta, idCol, textCol, stopwords,
          evalShingles, decontamN, minOverlap))
    }

    val appended = IncrementalDedup.append(delta, idCol, textCol, blockCol,
      s"$indexDir/dedup", s"$outDir/dedup")
    val signals = Await.result(signalsF, Duration.Inf)

    // decisions: untouched clusters carry over byte-stable (their
    // buckets hardlink); the recomputed rows are exactly the dedup
    // append's non-carried labels — touched old clusters + clusters
    // born from the delta — with the survivor argmax re-run over the
    // new labels + signals
    val decCols = Seq("doc", "cluster", "passes", "ok_quality",
      "contaminated", "keep_dedup", "keep").map(col)
    // NOT checkpointed: the frame is consumed exactly once (inside the
    // decisions write below), and its cluster set — all the
    // touched-bucket probe needs — is readable off the CHECKPOINTED
    // recomputedLabels frame instead, so the survivor argmax runs as
    // part of the write job rather than as its own checkpoint job
    val recomputed = decisionsOf(appended.recomputedLabels, signals)
    // explicit schema (decision columns + the bkt partition column):
    // an index built over a corpus with no decisions would have an
    // empty partitioned dir that schema inference cannot read
    val decSchema = org.apache.spark.sql.types.StructType(
      recomputed.schema.fields :+ org.apache.spark.sql.types.StructField(
        "bkt", org.apache.spark.sql.types.IntegerType))
    // keeps the bkt PARTITION column: the touched-bucket filter below
    // statically prunes to the touched directories
    val oldDecisionsP = spark.read.schema(decSchema)
      .parquet(s"$indexDir/decisions")
    val bktOfC = IndexRotation.bucketOf(col("cluster"), numBuckets)
    // recomputed's clusters are exactly recomputedLabels' clusters
    // (decisionsOf preserves every label row's cluster), and THAT
    // frame is checkpointed — probing it keeps this collect cheap
    val touchedBkts = appended.touchedClusters.select(bktOfC.as("bkt"))
      .unionByName(appended.recomputedLabels.select(bktOfC.as("bkt")))
      .distinct().collect().map(_.getInt(0)).toSeq
    val replacement = oldDecisionsP
      .filter(col("bkt").isin(touchedBkts: _*))
      .join(appended.touchedClusters, Seq("cluster"), "left_anti")
      .unionByName(recomputed.withColumn("bkt", bktOfC))
    // decisions and meta land in disjoint directories — concurrent
    val metaF = Future {
      writeMeta(spark, outDir, stopwords, decontamN, minOverlap, numBuckets)
    }
    val decisionsNew = IndexRotation.rotateBucketed(spark,
        s"$indexDir/decisions", s"$outDir/decisions", touchedBkts,
        replacement)
      .select(decCols: _*)
    Await.result(metaF, Duration.Inf)
    decisionsNew
  }

  /** Row-local per-doc signals: quality passes/flag + contamination
    * against the frozen eval shingle set. Columns normalized to
    * (doc, passes, ok_quality, contaminated).
    */
  private def signalsOf(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], evalShingles: DataFrame,
      decontamN: Int, minOverlap: Int): DataFrame = {
    val quality = TextAnalysis.qualityFilter(docs, idCol, textCol, stopwords)
      .select(col(idCol).as("doc"),
        (col("ok_len").cast("int") + col("ok_word_len").cast("int")
          + col("ok_stopwords").cast("int") + col("ok_digits").cast("int")
          + col("ok_repetition").cast("int")).as("passes"),
        col("keep").as("ok_quality"))
    val contam = Dedup.decontaminateWith(docs, evalShingles, idCol, textCol,
        decontamN, minOverlap)
      .select(col(idCol).as("doc"), col("contaminated"))
    quality.join(contam, "doc")
  }

  /** Survivor argmax + keep conjunction over (labels ⋈ signals) — the
    * same computation for the initial build and for each recomputed
    * cluster subset (exactness depends on them being ONE code path).
    */
  private def decisionsOf(labels: DataFrame, signals: DataFrame): DataFrame =
    Dedup.clusterSurvivors(labels.join(signals, "doc"), "doc", "passes")
      .select(col("doc"), col("cluster"), col("passes"),
        col("ok_quality"), col("contaminated"), col("keep").as("keep_dedup"))
      .withColumn("keep",
        col("ok_quality") && !col("contaminated") && col("keep_dedup"))

  /** Compact the curation index at `indexDir` into `outDir`: the
    * nested dedup index compacts via [[IncrementalDedup.compact]],
    * eval-shingles/signals rewrite at session parallelism, decisions
    * to one file per bucket. Content and meta unchanged.
    */
  def compact(spark: SparkSession, indexDir: String, outDir: String): Unit = {
    val (stopwords, decontamN, minOverlap, numBuckets) =
      readMeta(spark, indexDir)
    IncrementalDedup.compact(spark, s"$indexDir/dedup", s"$outDir/dedup")
    IndexRotation.compactFrame(spark, s"$indexDir/eval-shingles",
      s"$outDir/eval-shingles", None, None)
    IndexRotation.compactFrame(spark, s"$indexDir/signals",
      s"$outDir/signals", None, None)
    IndexRotation.compactFrame(spark, s"$indexDir/decisions",
      s"$outDir/decisions", None, Some("bkt"))
    writeMeta(spark, outDir, stopwords, decontamN, minOverlap, numBuckets)
  }

  private def writeMeta(spark: SparkSession, dir: String,
      stopwords: Seq[String], decontamN: Int, minOverlap: Int,
      numBuckets: Int): Unit = {
    import spark.implicits._
    Seq((SchemaVersion, stopwords, decontamN, minOverlap, numBuckets))
      .toDF("version", "stopwords", "decontam_n", "min_overlap",
        "num_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def readMeta(spark: SparkSession,
      dir: String): (Seq[String], Int, Int, Int) = {
    val rows = spark.read.parquet(s"$dir/meta").collect()
    require(rows.length == 1, s"corrupt curation index meta at $dir/meta")
    val r = rows(0)
    val ver = r.getAs[Int]("version")
    require(ver == SchemaVersion,
      s"curation index at $dir has schema version $ver; this build " +
        s"understands $SchemaVersion — rebuild the index")
    // getAs returns a mutable ArraySeq; .toSeq pins the immutable type
    (r.getAs[scala.collection.Seq[String]]("stopwords").toSeq,
      r.getAs[Int]("decontam_n"), r.getAs[Int]("min_overlap"),
      r.getAs[Int]("num_buckets"))
  }
}
