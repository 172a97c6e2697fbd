package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Persisted incremental index for chunk-level dedup (q116) — the
  * [[Dedup.chunkDedup]] semantics operationalized the way a crawl
  * pipeline runs them: build once, then absorb id-monotone document
  * deltas with DELTA-SIZED work and ZERO corpus-keyed shuffles on a
  * routine tick.
  *
  * Why this index is even simpler than the v4 shingle index
  * ([[IncrementalDedup]]): keep-first is MONOTONE. Under the enforced
  * contract that every delta id exceeds every indexed id, an old
  * occurrence always beats a new one, so
  *   - persisted per-document outputs NEVER change on append (the
  *     outputs frame is append-only — one new part-file per tick);
  *   - the winner set only GAINS rows (chunks first seen in the
  *     delta), so the bucket-partitioned winners frame rotates with
  *     pure hardlink carries + inserted part-files — no bucket is
  *     ever rewritten, every old file stays inode-identical
  *     (spec-asserted via HardlinkProbe).
  *
  * Routine tick cost: chunk the delta (row-local), ONE bucket-pruned
  * read of old winners restricted to the delta's buckets (static
  * partition pruning over the `bkt=…` layout), one delta-keyed
  * keep-first window, one anti-join of delta winners against the
  * pruned old side, the delta's doc-keyed reassembly. Every shuffle
  * key is delta-sized.
  *
  * The id-monotonicity contract is REQUIRED (checked, loud): with
  * out-of-order ids a new doc could steal a chunk from an indexed
  * doc and already-persisted outputs would be wrong. Out-of-order
  * corpora rebuild instead — the same contract a log-structured
  * ingest pipeline runs under.
  */
object IncrementalChunkDedup {

  private val SchemaVersion = 1

  private def winnersSchema: StructType = StructType(Seq(
    StructField("chunk", StringType, nullable = true),
    StructField("__doc", LongType, nullable = true),
    StructField("pos", IntegerType, nullable = true),
    StructField("bkt", IntegerType, nullable = true)))

  private def outputsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text_dedup", StringType, nullable = true),
    StructField("n_kept", LongType, nullable = true),
    StructField("n_dropped", LongType, nullable = true)))

  /** Everything an append produces: the full-corpus outputs frame
    * (old rows carried, delta rows appended) and the rotated winner
    * frame, both backed by `dstDir` parquet.
    */
  final case class Appended(outputs: DataFrame, winners: DataFrame)

  /** Chunk `docs`, persist winners (bucket-partitioned on the chunk
    * hash) and per-document outputs under `dir`. Ids must be unique
    * longs; the append contract compares against their max.
    */
  def buildIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkWords: Int,
      dir: String,
      numBuckets: Int = 0): Unit = {
    val spark = docs.sparkSession
    val chunks = Dedup.chunkFrame(docs, idCol, textCol, chunkWords)
      .localCheckpoint(true)
    val nb = if (numBuckets > 0) numBuckets
      else IncrementalDedup.autoShingleBuckets(chunks.count())
    // the winners frame is computed ONCE and feeds both writes — the
    // outputs reassembly reads it back instead of re-running the
    // corpus-keyed keep-first window (review finding: the original
    // build paid the dominant chunk+window cost twice)
    Dedup.chunkWinners(chunks)
      .select(col("chunk"), col("__doc").cast("long").as("__doc"), col("pos"))
      .withColumn("bkt", IndexRotation.bucketOf(col("chunk"), nb))
      .repartition(col("bkt"))
      .write.partitionBy("bkt").mode("overwrite").parquet(s"$dir/winners")
    val winners = spark.read.schema(winnersSchema).parquet(s"$dir/winners")
    Dedup.reassembleChunks(
        docs.select(col(idCol).cast("long").as("doc_id")), "doc_id",
        chunks.select(col("__doc").cast("long").as("__doc"), col("pos"),
          col("chunk")),
        winners.select(col("__doc"), col("pos"), col("chunk")))
      .write.mode("overwrite").parquet(s"$dir/outputs")
    val maxId = docs.agg(max(col(idCol).cast("long"))).collect()(0).getLong(0)
    writeMeta(spark, dir, chunkWords, nb, maxId)
  }

  /** Absorb an id-monotone delta: `srcDir` stays valid for concurrent
    * readers; `dstDir` becomes the new index generation.
    */
  def append(
      delta: DataFrame,
      idCol: String,
      textCol: String,
      srcDir: String,
      dstDir: String): Appended = {
    require(srcDir != dstDir, "append requires distinct directories")
    val spark = delta.sparkSession
    val (chunkWords, nb, maxId) = readMeta(spark, srcDir)
    val bounds = delta.agg(min(col(idCol).cast("long")),
      max(col(idCol).cast("long"))).collect()(0)
    require(!bounds.isNullAt(0), "append needs a non-empty delta")
    require(bounds.getLong(0) > maxId,
      s"id-monotonicity violated: delta min ${bounds.getLong(0)} <= indexed " +
        s"max $maxId — keep-first would rewrite persisted outputs; rebuild")
    val dChunks = Dedup.chunkFrame(delta, idCol, textCol, chunkWords)
      .select(col("__doc").cast("long").as("__doc"), col("pos"), col("chunk"))
      .withColumn("bkt", IndexRotation.bucketOf(col("chunk"), nb))
      .localCheckpoint(true)
    val touched = dChunks.select(col("bkt")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // bucket-pruned old-winner lookup: the scan reads ONLY the delta's
    // bkt=… partitions, however large the corpus index is
    val old = spark.read.schema(winnersSchema).parquet(s"$srcDir/winners")
      .filter(col("bkt").isin(touched: _*))
      .select(col("chunk"))
    val dWinners = Dedup.chunkWinners(dChunks.drop("bkt"))
    val newWinners = dWinners.join(old, Seq("chunk"), "left_anti")
      .localCheckpoint(true)
    // kept delta occurrences are EXACTLY the new winners: every other
    // delta occurrence loses either to an indexed chunk or to the
    // delta's own first occurrence. Reassembly is the SHARED
    // [[Dedup.reassembleChunks]] — one copy of the semantics q116's
    // oracle equivalence depends on.
    val deltaOut = Dedup.reassembleChunks(
      delta.select(col(idCol).cast("long").as("doc_id")), "doc_id",
      dChunks.drop("bkt"), newWinners)
    // winners rotation is INSERT-ONLY (touched = none rewritten): old
    // buckets hardlink-carry untouched, new winners land as appended
    // part-files in their buckets
    val winners = IndexRotation.rotateBucketed(spark,
      s"$srcDir/winners", s"$dstDir/winners", Seq.empty,
      newWinners.withColumn("bkt", IndexRotation.bucketOf(col("chunk"), nb)))
    val outputs = IndexRotation.rotateAppendOnly(spark,
      s"$srcDir/outputs", s"$dstDir/outputs", deltaOut)
    writeMeta(spark, dstDir, chunkWords, nb, bounds.getLong(1))
    Appended(outputs, winners)
  }

  /** Restore one-file-per-bucket winner reads after multi-append runs
    * (same rows, same layout contract).
    */
  def compact(spark: SparkSession, indexDir: String, outDir: String): Unit = {
    require(indexDir != outDir, "compaction requires distinct directories")
    IndexRotation.compactFrame(spark, s"$indexDir/winners",
      s"$outDir/winners", Some(winnersSchema), Some("bkt"))
    IndexRotation.compactFrame(spark, s"$indexDir/outputs",
      s"$outDir/outputs", Some(outputsSchema), None)
    val (chunkWords, nb, maxId) = readMeta(spark, indexDir)
    writeMeta(spark, outDir, chunkWords, nb, maxId)
  }

  private def writeMeta(spark: SparkSession, dir: String, chunkWords: Int,
      numBuckets: Int, maxId: Long): Unit = {
    import spark.implicits._
    Seq((SchemaVersion, chunkWords, numBuckets, maxId))
      .toDF("version", "chunk_words", "num_buckets", "max_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def readMeta(spark: SparkSession, dir: String): (Int, Int, Long) = {
    val m = spark.read.parquet(s"$dir/meta").collect()
    require(m.length == 1, s"corrupt index meta at $dir/meta")
    val r = m(0)
    val ver = r.getAs[Int]("version")
    require(ver == SchemaVersion,
      s"index at $dir has schema version $ver; this build understands " +
        s"$SchemaVersion — rebuild the index")
    (r.getAs[Int]("chunk_words"), r.getAs[Int]("num_buckets"),
      r.getAs[Long]("max_id"))
  }
}
