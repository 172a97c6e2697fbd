package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.IncrementalChunkDedup

/** The streaming face of the chunk-dedup index
  * ([[IncrementalChunkDedup]]): each micro-batch of new documents is
  * one append tick through `foreachBatch`, with the
  * [[StreamingIndexMaintainer]] replay discipline — commit markers,
  * half-tick cleanup, replayed-id filtering — so at-least-once
  * delivery maintains an effectively-once index.
  *
  * The chunk index's id-MONOTONICITY contract maps onto streaming
  * cleanly: a source that delivers documents in id order (the
  * log-structured ingest shape) satisfies it batch by batch, because
  * replay filtering only ever REMOVES the low-id prefix of a batch.
  * An out-of-order id still fails loudly inside the tick (the
  * operator's own require), surfacing as a stream error rather than a
  * silently wrong index.
  */
object StreamingChunkMaintainer {

  /** The newest COMMITTED tick dir, if any. */
  def currentDir(spark: SparkSession, indexRoot: String): Option[String] =
    TickDirs.currentDir(spark, indexRoot)

  /** One tick (the `foreachBatch` body). Returns the committed dir
    * the index now lives in — or `indexRoot` itself when no batch has
    * bootstrapped an index yet (empty first batch).
    */
  def tick(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      indexRoot: String,
      chunkWords: Int = 3): String = {
    val spark = batch.sparkSession
    TickDirs.effectivelyOnceTick(batch, idCol, indexRoot,
      build = (fresh, dir) =>
        IncrementalChunkDedup.buildIndex(fresh, idCol, textCol, chunkWords,
          dir),
      append = (fresh, curDir, nextDir) => {
        IncrementalChunkDedup.append(fresh, idCol, textCol, curDir, nextDir)
        ()
      },
      seenIds = curDir => spark.read.parquet(s"$curDir/outputs")
        .select(col("doc_id").cast("long").as(idCol)))
  }

  /** Start the maintainer: docs stream → one index tick per
    * micro-batch. Read results any time via
    * `spark.read.parquet(currentDir(...)/outputs)`.
    */
  def start(
      docsStream: DataFrame,
      idCol: String,
      textCol: String,
      indexRoot: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      chunkWords: Int = 3): DataStreamWriter[Row] =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        tick(batch.toDF(), idCol, textCol, indexRoot, chunkWords)
        ()
      }
}
