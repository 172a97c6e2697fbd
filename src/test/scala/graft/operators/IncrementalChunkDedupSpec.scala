package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.Tables

/** The persisted chunk-dedup index must land on EXACTLY the
  * full-corpus [[Dedup.chunkDedup]] result through any chain of
  * id-monotone appends, with insert-only rotations (old winner files
  * inode-identical) and a loud failure on out-of-order ids.
  */
class IncrementalChunkDedupSpec extends SparkSuiteBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("chunkidx").toString

  private def outMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("chained appends == full re-mine; winner rotation is insert-only") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val (c1, c2) = (maxId / 3, maxId * 2 / 3)
    val dir = tmp()
    IncrementalChunkDedup.buildIndex(
      docs.filter(col("doc_id") <= c1), "doc_id", "text", 3, s"$dir/g0")
    val a1 = IncrementalChunkDedup.append(
      docs.filter(col("doc_id") > c1 && col("doc_id") <= c2),
      "doc_id", "text", s"$dir/g0", s"$dir/g1")
    // every winner file of g0 carries into g1 inode-identical: the
    // append inserted, never rewrote
    val g0Files = HardlinkProbe.dataFiles(s"$dir/g0/winners")
    val g1Files = HardlinkProbe.dataFiles(s"$dir/g1/winners")
    assert(g0Files.nonEmpty)
    g0Files.foreach { case (rel, ino) =>
      assert(g1Files.get(rel).contains(ino),
        s"winner file $rel was rewritten, not carried")
    }
    val a2 = IncrementalChunkDedup.append(
      docs.filter(col("doc_id") > c2),
      "doc_id", "text", s"$dir/g1", s"$dir/g2")
    val expected = outMap(Dedup.chunkDedup(docs, "doc_id", "text", 3)
      .select(col("doc_id"), col("text_dedup"), col("n_kept"),
        col("n_dropped")))
    val got = outMap(a2.outputs)
    assert(got == expected)
    // intermediate generation was already exact over its own corpus
    val mid = outMap(Dedup.chunkDedup(docs.filter(col("doc_id") <= c2),
      "doc_id", "text", 3).select(col("doc_id"), col("text_dedup"),
      col("n_kept"), col("n_dropped")))
    assert(outMap(a1.outputs) == mid)
    // compaction preserves rows and the append keeps working after it
    IncrementalChunkDedup.compact(spark, s"$dir/g1", s"$dir/g1c")
    val a2c = IncrementalChunkDedup.append(
      docs.filter(col("doc_id") > c2),
      "doc_id", "text", s"$dir/g1c", s"$dir/g2c")
    assert(outMap(a2c.outputs) == expected)
  }

  test("id-monotonicity violations fail loudly; empty delta refused") {
    import spark.implicits._
    val dir = tmp()
    val base = Seq((10L, "a b c d e f"), (11L, "g h i")).toDF("doc_id", "text")
    IncrementalChunkDedup.buildIndex(base, "doc_id", "text", 3, s"$dir/g0")
    val stale = Seq((5L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      IncrementalChunkDedup.append(stale, "doc_id", "text",
        s"$dir/g0", s"$dir/g1")
    }
    assert(e.getMessage.contains("id-monotonicity"))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      IncrementalChunkDedup.append(empty, "doc_id", "text",
        s"$dir/g0", s"$dir/g1")
    }
  }

  test("a delta sharing chunks with the index keeps nothing new for them") {
    import spark.implicits._
    val dir = tmp()
    val base = Seq((1L, "a b c u1 u2 u3")).toDF("doc_id", "text")
    IncrementalChunkDedup.buildIndex(base, "doc_id", "text", 3, s"$dir/g0")
    // delta doc repeats the indexed chunk "a b c" plus a new one
    val delta = Seq((2L, "a b c x y z")).toDF("doc_id", "text")
    val out = IncrementalChunkDedup.append(delta, "doc_id", "text",
      s"$dir/g0", s"$dir/g1")
    val m = outMap(out.outputs)
    assert(m(1L) == (("a b c u1 u2 u3", 2L, 0L)), "indexed output immutable")
    assert(m(2L) == (("x y z", 1L, 1L)), s"got ${m(2L)}")
    // the winner frame gained exactly one row ("x y z")
    val winners = out.winners.select("chunk").collect().map(_.getString(0)).toSet
    assert(winners == Set("a b c", "u1 u2 u3", "x y z"))
  }
}
