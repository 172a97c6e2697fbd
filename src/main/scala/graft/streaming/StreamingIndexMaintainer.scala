package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.IncrementalDedup

/** The streaming face of the incremental dedup index: each micro-batch
  * of new documents is one [[IncrementalDedup.append]] tick, wired
  * through `foreachBatch` exactly like [[MessageMirror]]'s sink. The
  * batch's offsets commit only after the tick returns, so a crash
  * mid-tick replays the batch — and the tick body is IDEMPOTENT
  * (replayed ids are filtered against the index's doc frame before
  * appending; an all-replayed batch skips the tick outright), which
  * upgrades at-least-once replay to an effectively-once index, the
  * same discipline as the mirror's MessageId dedupe.
  *
  * On-disk layout under `indexRoot`: one `tick-N` dir per applied
  * tick, each a complete rotated index ([[graft.operators.IndexRotation]]
  * hardlinks untouched files, so N ticks cost delta-sized IO, not N
  * copies). A `_TICK_DONE` marker commits a dir; a dir without the
  * marker is a crashed half-tick and is deleted and re-derived on the
  * next attempt. The first batch bootstraps `tick-0` via
  * [[IncrementalDedup.buildIndex]].
  */
object StreamingIndexMaintainer {

  /** The newest COMMITTED tick dir, if any. */
  def currentDir(spark: SparkSession, indexRoot: String): Option[String] =
    TickDirs.currentDir(spark, indexRoot)

  /** One tick, usable directly in tests (the `foreachBatch` body).
    * Returns the committed dir the index now lives in.
    */
  def tick(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      indexRoot: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleDocFreq: Int = 1000): String = {
    val spark = batch.sparkSession
    TickDirs.effectivelyOnceTick(batch, idCol, indexRoot,
      build = (fresh, dir) =>
        IncrementalDedup.buildIndex(fresh, idCol, textCol, blockCol,
          n, threshold, maxShingleDocFreq, dir),
      append = (fresh, curDir, nextDir) => {
        IncrementalDedup.append(fresh, idCol, textCol, blockCol,
          curDir, nextDir)
        ()
      },
      seenIds = curDir => spark.read.parquet(s"$curDir/docs")
        .select(col("doc").as(idCol)))
  }

  /** Start the maintainer: docs stream → one index tick per
    * micro-batch. Read results any time via
    * `spark.read.parquet(currentDir(...)/labels)`.
    */
  def start(
      docsStream: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      indexRoot: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleDocFreq: Int = 1000): DataStreamWriter[Row] =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        tick(batch.toDF(), idCol, textCol, blockCol, indexRoot,
          n, threshold, maxShingleDocFreq)
        ()
      }
}
