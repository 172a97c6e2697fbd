package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.Tables

/** R-19 exact-substring dedup (Lee et al. 2021 ExactSubstr):
  * [[Dedup.repeatedSpans]] must flag EXACTLY the planted cross-document
  * token spans — correct 1-based positions, correct island merge — and
  * nothing else (no within-doc-only repeats, no spans under the gram
  * length).
  */
class SubstringDedupSpec extends SparkSuiteBase {

  private val L = 20

  /** Docs assembled from per-doc-unique filler (`u<doc>x<i>`, which can
    * never form a cross-doc repeated gram) around shared runs.
    */
  private def doc(id: Long, parts: Seq[Seq[String]]): (Long, String) =
    (id, parts.flatten.mkString(" "))

  private def filler(id: Long, n: Int, tag: String): Seq[String] =
    (0 until n).map(i => s"u${id}${tag}x$i")

  private def spansOf(rows: Seq[(Long, String)]): Map[(Long, Long, Long), Long] = {
    import spark.implicits._
    Dedup.repeatedSpans(rows.toDF("doc_id", "text"), "doc_id", "text",
        gramLen = L, minDocs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
  }

  test("a planted 200-token shared span is recovered at exact positions") {
    val shared = (0 until 200).map(i => s"shared$i")
    val rows = Seq(
      doc(1L, Seq(filler(1L, 50, "a"), shared, filler(1L, 30, "b"))),
      doc(2L, Seq(filler(2L, 10, "a"), shared, filler(2L, 5, "b"))))
    // fully-inside windows only: 200 - L + 1 = 181 per doc, merged to
    // one maximal span covering exactly the shared run
    assert(spansOf(rows) === Map(
      (1L, 51L, 250L) -> 181L,
      (2L, 11L, 210L) -> 181L))
  }

  test("a span repeated only WITHIN one doc is not flagged") {
    val rep = (0 until 40).map(i => s"rep$i")
    val rows = Seq(
      doc(1L, Seq(filler(1L, 5, "a"), rep, filler(1L, 5, "b"), rep)),
      doc(2L, Seq(filler(2L, 60, "a"))))
    assert(spansOf(rows).isEmpty)
  }

  test("a shared run shorter than the gram length is invisible") {
    val short = (0 until L - 1).map(i => s"short$i")
    val rows = Seq(
      doc(1L, Seq(filler(1L, 8, "a"), short, filler(1L, 8, "b"))),
      doc(2L, Seq(filler(2L, 3, "a"), short, filler(2L, 3, "b"))))
    assert(spansOf(rows).isEmpty)
  }

  test("two disjoint shared runs in one doc merge into two islands") {
    val s1 = (0 until 30).map(i => s"one$i")
    val s2 = (0 until 25).map(i => s"two$i")
    val rows = Seq(
      doc(1L, Seq(s1, filler(1L, 40, "gap"), s2)),
      doc(2L, Seq(filler(2L, 7, "a"), s1, filler(2L, 9, "b"))),
      doc(3L, Seq(filler(3L, 4, "a"), s2)))
    val got = spansOf(rows)
    // doc 1: [1,30] (11 windows) and [71,95] (6 windows); the 40-token
    // unique gap is > L so the islands stay separate
    assert(got === Map(
      (1L, 1L, 30L) -> 11L,
      (1L, 71L, 95L) -> 6L,
      (2L, 8L, 37L) -> 11L,
      (3L, 5L, 29L) -> 6L))
  }

  test("stripRepeatedSpans removes exactly the flagged spans") {
    import spark.implicits._
    val shared = (0 until 200).map(i => s"shared$i")
    val f1a = filler(1L, 50, "a"); val f1b = filler(1L, 30, "b")
    val f2a = filler(2L, 10, "a"); val f2b = filler(2L, 5, "b")
    val rows = Seq(
      doc(1L, Seq(f1a, shared, f1b)),
      doc(2L, Seq(f2a, shared, f2b)),
      doc(3L, Seq(filler(3L, 40, "solo"))))
    val got = Dedup.stripRepeatedSpans(rows.toDF("doc_id", "text"),
        "doc_id", "text", gramLen = L, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    // the shared run vanishes from BOTH holders; unique filler stays
    assert(got(1L) === (((f1a ++ f1b).mkString(" "), 200L)))
    assert(got(2L) === (((f2a ++ f2b).mkString(" "), 200L)))
    // a doc with no flagged span keeps its token stream verbatim
    assert(got(3L) === ((filler(3L, 40, "solo").mkString(" "), 0L)))
  }

  test("the sf fixture's planted near-dups carry repeated spans") {
    val spans = Dedup.repeatedSpans(Tables.documents(spark, sfDir),
      "doc_id", "text", gramLen = L, minDocs = 2)
    assert(spans.count() > 0)
    // spans are well-formed: start >= 1, end >= start + L - 1, and the
    // window count is positive and at most the solid-span bound
    // (span_len - L + 1; merged-but-gappy spans sit below it)
    val bad = spans.filter(col("span_start") < 1 ||
      col("span_end") < col("span_start") + (L - 1) ||
      col("n_windows") < 1 ||
      col("n_windows") > col("span_end") - col("span_start") - (L - 2))
    assert(bad.count() === 0)
  }

  test("chunkDedup: a shared chunk survives only at its first occurrence") {
    import spark.implicits._
    // doc 1 and doc 5 share the chunk "a b c"; everything else is
    // per-doc unique so only that chunk can collide
    val docs = Seq(
      (1L, "a b c u1x0 u1x1 u1x2"),
      (5L, "u5x0 u5x1 u5x2 a b c"),
      (9L, "u9x0 u9x1 u9x2")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "doc_id", "text", chunkWords = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("a b c u1x0 u1x1 u1x2", 2L, 0L)))
    assert(out(5L) == (("u5x0 u5x1 u5x2", 1L, 1L)), s"got ${out(5L)}")
    assert(out(9L) == (("u9x0 u9x1 u9x2", 1L, 0L)))
  }

  test("chunkDedup: within-doc repeats keep first, partial tails and empty text survive") {
    import spark.implicits._
    val docs = Seq(
      (2L, "x y z x y z w"), // repeated chunk within one doc + 1-word tail
      (3L, ""),              // zero chunks
      (4L, "p q")            // single partial chunk
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "doc_id", "text", chunkWords = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(2L) == (("x y z w", 2L, 1L)), s"got ${out(2L)}")
    assert(out(3L) == (("", 0L, 0L)))
    assert(out(4L) == (("p q", 1L, 0L)))
  }

  test("chunkDedup: the fixture's planted near-dups actually lose chunks") {
    val docs = Tables.documents(spark, sfDir)
    val out = Dedup.chunkDedup(docs, "doc_id", "text", chunkWords = 3)
    assert(out.count() == docs.count(), "output stays total over documents")
    val dropped = out.agg(sum(col("n_dropped"))).collect()(0).getLong(0)
    assert(dropped > 0, "fixture near-dups must produce chunk drops")
    // no chunk value survives twice corpus-wide: re-chunking the
    // deduped text yields all-distinct chunks
    val rechunk = Dedup.chunkDedup(
      out.select(col("doc_id"), col("text_dedup").as("text")),
      "doc_id", "text", chunkWords = 3)
    // note: reassembly can create NEW chunks across former boundaries,
    // so assert on the weaker invariant that a second pass drops less
    val dropped2 = rechunk.agg(sum(col("n_dropped"))).collect()(0).getLong(0)
    assert(dropped2 < dropped, s"second pass dropped $dropped2 >= $dropped")
  }
}
