package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.SimilarityIndex

/** The streaming face of the persisted IVF ANN index
  * ([[graft.operators.SimilarityIndex]]): each micro-batch of new
  * vectors is one [[SimilarityIndex.appendIvf]] tick — assign against
  * the PERSISTED centroids, hardlink-carry every untouched cell
  * partition, land the delta as new part-files in exactly its cells.
  * The mirror of [[StreamingIndexMaintainer]] for the embedding side
  * of the pipeline: same tick-dir log ([[TickDirs]]), same
  * effectively-once discipline (replayed ids anti-join against the
  * indexed id set before appending; an all-replayed batch is a no-op
  * tick), same crashed-half-tick cleanup.
  *
  * The first batch bootstraps `tick-0` via
  * [[SimilarityIndex.buildIvf]] with `numCells` smallest-id
  * centroids (or caller-trained ones) — so the batch that bootstraps
  * must carry at least `numCells` vectors. Every later tick keeps
  * those centroids frozen: retraining centroids mid-stream would put
  * old and new vectors in different geometries (re-clustering is a
  * REBUILD, not an append — run it as a separate job and point the
  * maintainer at the new root).
  *
  * Probe any time with
  * `SimilarityIndex.ivfProbe(probes, …, currentDir(spark, root).get, …)`
  * — ticks never mutate a committed dir, so in-flight probes are
  * never torn.
  */
object StreamingAnnMaintainer {

  /** The newest COMMITTED tick dir, if any. */
  def currentDir(spark: SparkSession, indexRoot: String): Option[String] =
    TickDirs.currentDir(spark, indexRoot)

  /** One tick, usable directly in tests (the `foreachBatch` body).
    * Returns the committed dir the index now lives in.
    */
  def tick(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      indexRoot: String,
      numCells: Int,
      centroids: Option[Seq[Array[Float]]] = None): String = {
    val spark = batch.sparkSession
    TickDirs.effectivelyOnceTick(batch, idCol, indexRoot,
      build = (fresh, dir) =>
        SimilarityIndex.buildIvf(fresh, idCol, vecCol, numCells, dir,
          centroids),
      append = (fresh, curDir, nextDir) =>
        SimilarityIndex.appendIvf(fresh, idCol, vecCol, curDir, nextDir),
      // the id read is column-pruned to the 8-byte id (bulk + tail)
      seenIds = curDir => SimilarityIndex.indexedIds(spark, curDir, idCol))
  }

  /** [[tick]] for the IVF-PQ layout: identical tick-dir discipline,
    * with the first batch bootstrapping via
    * [[SimilarityIndex.buildIvfPq]] (so it must carry at least
    * max(numCells, numCentroids) vectors — centroid AND codebook
    * seeds) and every later tick appending through
    * [[SimilarityIndex.appendIvfPq]] — the persisted quantization
    * geometry (centroids + codebooks) stays frozen across ticks for
    * the same reason centroids do in [[tick]]: re-deriving it would
    * make old codes and new codes incomparable. Re-quantizing is a
    * REBUILD job, not an append.
    */
  def tickPq(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      indexRoot: String,
      numCells: Int,
      numSub: Int,
      numCentroids: Int,
      centroids: Option[Seq[Array[Float]]] = None): String = {
    val spark = batch.sparkSession
    TickDirs.effectivelyOnceTick(batch, idCol, indexRoot,
      build = (fresh, dir) =>
        SimilarityIndex.buildIvfPq(fresh, idCol, vecCol, numCells,
          numSub, numCentroids, dir, centroids),
      append = (fresh, curDir, nextDir) =>
        SimilarityIndex.appendIvfPq(fresh, idCol, vecCol, curDir, nextDir),
      seenIds = curDir => SimilarityIndex.indexedIds(spark, curDir, idCol))
  }

  /** Start the maintainer: vector stream → one index tick per
    * micro-batch, wired through `foreachBatch` like
    * [[StreamingIndexMaintainer.start]].
    */
  def start(
      vecStream: DataFrame,
      idCol: String,
      vecCol: String,
      indexRoot: String,
      checkpointDir: String,
      numCells: Int,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    vecStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        tick(batch.toDF(), idCol, vecCol, indexRoot, numCells)
        ()
      }
}
