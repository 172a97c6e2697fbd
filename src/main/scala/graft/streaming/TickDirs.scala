package graft.streaming

import org.apache.spark.sql.SparkSession

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
}
