package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Tick-directory log shared by the streaming index maintainers
  * ([[StreamingIndexMaintainer]], [[StreamingAnnMaintainer]]): one
  * `tick-N` dir per applied micro-batch, committed by a `_TICK_DONE`
  * marker. A dir without the marker is a crashed half-tick — callers
  * delete and re-derive it. The marker write is the commit point: it
  * happens only after the tick's rotation completes, so a reader
  * following [[current]] never observes a partial index.
  */
private[streaming] object TickDirs {

  val Marker = "_TICK_DONE"

  def fs(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed tick numbers under `indexRoot`, ascending. */
  def committed(spark: SparkSession, indexRoot: String): Seq[Long] = {
    val f = fs(spark, indexRoot)
    val root = new org.apache.hadoop.fs.Path(indexRoot)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("tick-"))
          name.stripPrefix("tick-").toLongOption
            .filter(_ => f.exists(
              new org.apache.hadoop.fs.Path(st.getPath, Marker)))
        else None
      }
      .sorted
  }

  /** The newest COMMITTED tick dir, if any. */
  def currentDir(spark: SparkSession, indexRoot: String): Option[String] =
    committed(spark, indexRoot).lastOption.map(n => s"$indexRoot/tick-$n")

  /** Clear a crashed half-tick at `dir` if present. */
  def clearHalfTick(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Commit `dir` by writing the marker. */
  def commit(spark: SparkSession, dir: String): Unit =
    fs(spark, dir).create(
      new org.apache.hadoop.fs.Path(dir, Marker)).close()

  /** The ONE effectively-once tick skeleton every maintainer runs
    * (review finding: it was copy-pasted four times, and a fix to the
    * replay protocol had to land in each). Per micro-batch:
    *   1. intra-batch dedupe on `idCol` (at-least-once sources can
    *      redeliver WITHIN a batch; the appends need unique ids);
    *   2. clear a crashed half-tick at the next dir;
    *   3. bootstrap via `build` on the first non-empty batch — an
    *      EMPTY (or all-null-id) bootstrap batch is a no-op returning
    *      `indexRoot`, not a stream crash (the builders need at least
    *      one row for their anchors; an UNDERSIZED batch still fails
    *      loudly inside `build`, by design);
    *   4. otherwise drop ids the index already holds (`seenIds` over
    *      the current committed dir — a crash between tick commit and
    *      checkpoint commit replays the batch), skip the tick when
    *      nothing is fresh, else `append` and commit.
    */
  def effectivelyOnceTick(
      batch: DataFrame,
      idCol: String,
      indexRoot: String,
      build: (DataFrame, String) => Unit,
      append: (DataFrame, String, String) => Unit,
      seenIds: String => DataFrame): String = {
    val spark = batch.sparkSession
    val uniq = batch.filter(col(idCol).isNotNull).dropDuplicates(idCol)
      .localCheckpoint(true)
    val current = committed(spark, indexRoot).lastOption
    val nextN = current.map(_ + 1).getOrElse(0L)
    val nextDir = s"$indexRoot/tick-$nextN"
    clearHalfTick(spark, nextDir)
    current match {
      case None if uniq.isEmpty =>
        indexRoot
      case None =>
        build(uniq, nextDir)
        commit(spark, nextDir)
        nextDir
      case Some(cur) =>
        val curDir = s"$indexRoot/tick-$cur"
        val fresh = uniq.join(seenIds(curDir), Seq(idCol), "left_anti")
          .localCheckpoint(true)
        if (fresh.isEmpty) curDir
        else {
          append(fresh, curDir, nextDir)
          commit(spark, nextDir)
          nextDir
        }
    }
  }
}
