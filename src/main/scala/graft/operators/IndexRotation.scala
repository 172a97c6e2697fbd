package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-free rotation for persisted incremental indexes.
  *
  * The incremental operators ([[IncrementalDedup]],
  * [[IncrementalCuration]]) rotate `indexDir → outDir` per append so a
  * tick never overwrites the frames its own readers (or a concurrent
  * bench rep re-appending to the same base) still depend on. Through
  * round 6 that rotation COPIED every frame in full — a ~corpus-sized
  * narrow-column rewrite per tick, the one linear term left in the
  * append cost. This module makes the untouched part of the rotation
  * O(metadata):
  *
  *   - append-only frames (docs, shingles, signals) carry their
  *     existing part-files into `outDir` as HARDLINKS and append only
  *     the delta's new files;
  *   - rewritable frames (pairs, labels, decisions) are PARTITIONED BY
  *     a stable id-hash bucket (`bkt = pmod(xxhash64(key), B)`); an
  *     append hardlinks the untouched bucket directories and writes
  *     only the buckets that hold changed rows.
  *
  * A hardlink shares the source inode: the carried bytes are never
  * read, never rewritten, and deleting either name later leaves the
  * other intact. This is the local/shared-FS analog of what a table
  * format does with manifest reuse at cluster scale; on a filesystem
  * without hardlinks the carry degrades to a copy, and on a non-local
  * URI (`hdfs://`, `s3://`) callers fall back to the full rewrite
  * (`isLocal` gates it) — at that scale the right tool is in-place
  * dynamic partition overwrite between read barriers or a real table
  * format, not rotation.
  *
  * Commit markers (`_SUCCESS`, `.…` temp files) are never linked:
  * Spark recreates them on the follow-up write, and truncating a
  * hardlinked marker in place would reach through the inode into the
  * source directory.
  */
object IndexRotation {

  /** Stable bucket of an id column for partitioned index frames —
    * `xxhash64` is deterministic across sessions and partitionings, so
    * a bucket assignment persisted in one job is reproducible in every
    * later append.
    */
  def bucketOf(c: org.apache.spark.sql.Column, numBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(c), lit(numBuckets.toLong)).cast("int")

  /** Only scheme-less paths take the hardlink fast path; URIs fall
    * back to the Spark rewrite.
    */
  def isLocal(dir: String): Boolean = !dir.contains("://")

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
  }

  /** Hardlink every data file under `src` into `dst` (same relative
    * layout), skipping commit markers and any immediate child
    * directory named in `skipDirs`. Falls back to a byte copy on
    * filesystems without link support.
    */
  private def carry(src: Path, dst: Path, skipDirs: Set[String]): Unit = {
    if (!Files.isDirectory(src)) return
    Files.createDirectories(dst)
    val s = Files.list(src)
    try s.iterator().asScala.foreach { child =>
      val name = child.getFileName.toString
      if (Files.isDirectory(child)) {
        if (!skipDirs(name)) carry(child, dst.resolve(name), Set.empty)
      } else if (!name.startsWith("_") && !name.startsWith(".")) {
        val target = dst.resolve(name)
        try Files.createLink(target, child)
        catch {
          case _: UnsupportedOperationException =>
            Files.copy(child, target, StandardCopyOption.REPLACE_EXISTING)
        }
      }
    } finally s.close()
  }

  /** Rotate an APPEND-ONLY frame: carry `srcDir`'s files into a clean
    * `dstDir` and append `extra`'s rows as new part-files. Returns the
    * rotated frame. Non-local paths rewrite in full.
    */
  def rotateAppendOnly(spark: SparkSession, srcDir: String, dstDir: String,
      extra: DataFrame): DataFrame = {
    require(srcDir != dstDir, "rotation requires distinct directories")
    if (isLocal(srcDir) && isLocal(dstDir)) {
      val dst = Paths.get(dstDir)
      deleteRecursively(dst)
      carry(Paths.get(srcDir), dst, Set.empty)
      extra.write.mode("append").parquet(dstDir)
    } else {
      spark.read.parquet(srcDir).unionByName(extra)
        .write.mode("overwrite").parquet(dstDir)
    }
    spark.read.parquet(dstDir)
  }

  /** Compact a frame into `dstDir`: plain frames rewrite at session
    * parallelism; bucketed frames (non-empty `partitionCol`) rewrite
    * to one file per bucket. Multi-append deployments accumulate one
    * file per touched bucket per tick plus one delta file per tick in
    * the append-only frames — a periodic compaction pass restores
    * one-file-per-bucket reads without touching semantics (same rows,
    * same layout contract).
    */
  def compactFrame(spark: SparkSession, srcDir: String, dstDir: String,
      schema: Option[org.apache.spark.sql.types.StructType],
      partitionCol: Option[String]): Unit = {
    require(srcDir != dstDir, "compaction requires distinct directories")
    val reader = schema.fold(spark.read)(s => spark.read.schema(s))
    val df = reader.parquet(srcDir)
    partitionCol match {
      case Some(c) =>
        df.repartition(col(c))
          .write.partitionBy(c).mode("overwrite").parquet(dstDir)
      case None =>
        // size the output at ~128 MB files from an exact count
        // (Catalyst estimates are unusable here — see
        // ScaleOps.autoRangeParts); a plain rewrite would keep the
        // accumulated input file count, defeating the compaction
        val rowWidth =
          8L + df.schema.fields.map(_.dataType.defaultSize.toLong).sum
        val target = 128L << 20
        val n = ((BigInt(df.count()) * rowWidth + target - 1) / target)
          .max(1).min(131072).toInt
        df.repartition(n).write.mode("overwrite").parquet(dstDir)
    }
  }

  /** Rotate a FROZEN frame (pure carry, no new rows). */
  def rotateFrozen(spark: SparkSession, srcDir: String, dstDir: String): DataFrame = {
    require(srcDir != dstDir, "rotation requires distinct directories")
    if (isLocal(srcDir) && isLocal(dstDir)) {
      val dst = Paths.get(dstDir)
      deleteRecursively(dst)
      carry(Paths.get(srcDir), dst, Set.empty)
    } else {
      spark.read.parquet(srcDir).write.mode("overwrite").parquet(dstDir)
    }
    spark.read.parquet(dstDir)
  }

  /** Rotate a BUCKET-PARTITIONED frame: carry every `bkt=…` directory
    * except the touched ones, then write `replacement`, which must
    * carry a `bkt` column and consist of (a) the touched buckets'
    * FULL new content plus (b) optionally, INSERT-ONLY rows landing
    * in untouched buckets — those append as new part-files alongside
    * the hardlinked old files (the dynamic-partition `append` write
    * never deletes). The insert path is what lets callers rewrite
    * only buckets with DELETIONS: a bucket that merely gains rows
    * keeps its old files inode-identical. Returns the rotated frame
    * (with `bkt`). Non-local paths rewrite in full.
    */
  def rotateBucketed(spark: SparkSession, srcDir: String, dstDir: String,
      touched: Seq[Int], replacement: DataFrame,
      partCol: String = "bkt"): DataFrame = {
    require(srcDir != dstDir, "rotation requires distinct directories")
    // a partitionBy write of an EMPTY frame emits zero files, so every
    // read of a bucketed index dir carries the explicit schema (the
    // replacement frame always has it) instead of relying on inference
    val sch = replacement.schema
    // repartition on the partition column before the dynamic write:
    // without it every task emits a file into every bucket it holds a
    // row for — tasks × buckets small files whose per-file listing and
    // footer reads dominate every later scan (measured 2.5× on the
    // 30× fixture). One exchange of the replacement rows buys
    // one-file-per-bucket output.
    if (isLocal(srcDir) && isLocal(dstDir)) {
      val dst = Paths.get(dstDir)
      deleteRecursively(dst)
      carry(Paths.get(srcDir), dst,
        touched.map(k => s"$partCol=$k").toSet)
      replacement.repartition(col(partCol))
        .write.partitionBy(partCol).mode("append").parquet(dstDir)
    } else {
      val kept = spark.read.schema(sch).parquet(srcDir)
        .filter(if (touched.isEmpty) lit(true)
          else !col(partCol).isin(touched: _*))
      kept.unionByName(replacement.select(kept.columns.map(col).toSeq: _*))
        .repartition(col(partCol))
        .write.partitionBy(partCol).mode("overwrite").parquet(dstDir)
    }
    spark.read.schema(sch).parquet(dstDir)
  }
}
