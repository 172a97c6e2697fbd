package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.functions.{PortableHash, TextFns}
import graft.operators.TextAnalysis

/** Winnowing fingerprint contract: the MOSS selection guarantee, the
  * short-doc/empty edge rules, and bit-identity of the O(m) deque
  * implementation against a naive O(m·w) reference.
  */
class WinnowExprSpec extends SparkSuiteBase {

  private val K = 3
  private val W = 4

  private def fps(texts: Seq[(Long, String)]): Map[Long, Seq[Long]] = {
    import spark.implicits._
    TextAnalysis.winnowFingerprints(
        texts.toDF("doc_id", "text"), "doc_id", "text", K, W)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
  }

  test("guarantee: docs sharing a run of >= w+k-1 tokens share a fingerprint") {
    // shared run of exactly w+k-1 = 6 tokens, embedded in different
    // surroundings on each side
    val shared = "lorem ipsum dolor sit amet consectetur"
    val out = fps(Seq(
      1L -> s"alpha beta $shared gamma delta",
      2L -> s"one two three $shared nine ten eleven twelve"))
    assert(out(1L).toSet.intersect(out(2L).toSet).nonEmpty,
      s"shared 6-token run must yield a shared fingerprint: $out")
  }

  test("edges: empty text -> no fingerprints; short doc -> the single min") {
    val out = fps(Seq(
      1L -> "",
      2L -> "only two", // no 3-gram at all
      3L -> "four tokens right here", // 2 shingles < w: one window
      4L -> (null: String)))
    assert(out(1L).isEmpty)
    assert(out(2L).isEmpty)
    val shingles = Seq("four tokens right", "tokens right here")
    val expectMin = shingles
      .map(s => PortableHash.md5Long60Jvm(s.getBytes("UTF-8"))).min
    assert(out(3L) == Seq(expectMin))
    assert(out(4L).isEmpty, "null text behaves like empty")
  }

  test("deque implementation is bit-identical to the naive window-min reference; density drops") {
    val rnd = new scala.util.Random(3)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    (1 to 20).foreach { _ =>
      val tokens = Seq.fill(3 + rnd.nextInt(120))(words(rnd.nextInt(words.size)))
      val text = tokens.mkString(" ")
      val shingles = tokens.sliding(K).filter(_.size == K).map(_.mkString(" ")).toSeq
      val h = shingles.map(s => PortableHash.md5Long60Jvm(s.getBytes("UTF-8")))
      val expect =
        if (h.isEmpty) Seq.empty[Long]
        else if (h.size <= W) Seq(h.min)
        else h.sliding(W).map(_.min).toSeq.distinct.sorted
      val got = fps(Seq(1L -> text))(1L)
      assert(got == expect, s"mismatch for ${tokens.size} tokens")
      // selection actually thins: never more fingerprints than windows,
      // and on long docs far fewer than shingles
      if (h.size > 20) assert(got.size < h.size / 2,
        s"winnowing kept ${got.size} of ${h.size} hashes — no thinning")
    }
  }

  test("fingerprints survive local edits away from the shared region") {
    val core = "the quick brown fox jumps over the lazy dog tonight"
    val a = fps(Seq(1L -> s"intro words here $core and some trailing content",
                    2L -> s"completely different opening $core closing differently"))
    assert(a(1L).toSet.intersect(a(2L).toSet).nonEmpty,
      "a long shared passage must survive winnowing on both sides")
  }

  test("column form agrees with TextFns shingling end to end") {
    // the operator must fingerprint EXACTLY the shingles the rest of
    // the dedup family uses (same tokenizer, same k-gram expression)
    val docs = graft.Tables.documents(spark, sfDir).limit(50)
    val viaOp = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", K, W)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val viaCols = docs.select(col("doc_id"),
        WinnowExpr.winnow(spark, TextFns.textShingles(col("text"), K), W)
          .as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(viaOp == viaCols)
    assert(viaOp.values.exists(_.nonEmpty))
  }
}
