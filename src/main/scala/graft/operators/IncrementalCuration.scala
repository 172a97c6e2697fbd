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
  *                        again)
  *   - `signals`        — per-doc row-local signals
  *                        (doc, passes, ok_quality, contaminated)
  *   - `decisions`      — the full q69-shaped decision frame
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
  * clusters only.
  */
object IncrementalCuration {

  private val SchemaVersion = 1

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
    decisionsOf(labels, spark.read.parquet(s"$dir/signals"))
      .write.mode("overwrite").parquet(s"$dir/decisions")
    writeMeta(spark, dir, stopwords, decontamN, minOverlap)
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
    val (stopwords, decontamN, minOverlap) = readMeta(spark, indexDir)

    val appended = IncrementalDedup.append(delta, idCol, textCol, blockCol,
      s"$indexDir/dedup", s"$outDir/dedup")

    // eval set is frozen: carry it into the rotated index
    spark.read.parquet(s"$indexDir/eval-shingles")
      .write.mode("overwrite").parquet(s"$outDir/eval-shingles")
    val evalShingles = spark.read.parquet(s"$outDir/eval-shingles")

    // row-local signals: delta only (old docs' signals cannot change)
    spark.read.parquet(s"$indexDir/signals")
      .unionByName(signalsOf(delta, idCol, textCol, stopwords,
        evalShingles, decontamN, minOverlap))
      .write.mode("overwrite").parquet(s"$outDir/signals")
    val signals = spark.read.parquet(s"$outDir/signals")

    // decisions: untouched clusters carry over byte-stable; everything
    // else (touched old clusters + clusters born from the delta) gets
    // its survivor argmax recomputed over the new labels + signals
    val oldDecisions = spark.read.parquet(s"$indexDir/decisions")
    val untouched = oldDecisions
      .join(appended.touchedClusters, Seq("cluster"), "left_anti")
      .localCheckpoint(true)
    val recomputeLabels = appended.labels
      .join(untouched.select(col("cluster")).distinct(),
        Seq("cluster"), "left_anti")
    val recomputed = decisionsOf(recomputeLabels, signals)
    untouched.unionByName(recomputed)
      .write.mode("overwrite").parquet(s"$outDir/decisions")
    writeMeta(spark, outDir, stopwords, decontamN, minOverlap)
    spark.read.parquet(s"$outDir/decisions")
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

  private def writeMeta(spark: SparkSession, dir: String,
      stopwords: Seq[String], decontamN: Int, minOverlap: Int): Unit = {
    import spark.implicits._
    Seq((SchemaVersion, stopwords, decontamN, minOverlap))
      .toDF("version", "stopwords", "decontam_n", "min_overlap")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def readMeta(spark: SparkSession,
      dir: String): (Seq[String], Int, Int) = {
    val rows = spark.read.parquet(s"$dir/meta").collect()
    require(rows.length == 1, s"corrupt curation index meta at $dir/meta")
    val r = rows(0)
    val ver = r.getAs[Int]("version")
    require(ver == SchemaVersion,
      s"curation index at $dir has schema version $ver; this build " +
        s"understands $SchemaVersion — rebuild the index")
    // getAs returns a mutable ArraySeq; .toSeq pins the immutable type
    (r.getAs[scala.collection.Seq[String]]("stopwords").toSeq,
      r.getAs[Int]("decontam_n"), r.getAs[Int]("min_overlap"))
  }
}
