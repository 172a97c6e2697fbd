package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** Optimal DP segmentation must maximize Σ len(piece)² with the
  * documented tie-break, beat greedy longest-match where greedy
  * strands the tail, and match a brute-force enumeration.
  */
class SegmentSpec extends SparkSuiteBase {

  import spark.implicits._

  private def vocabOf(pieces: Seq[String]): WordPiece.TrainedWordPiece =
    WordPiece.TrainedWordPiece(
      pieces.sorted.zipWithIndex
        .map { case (p, i) => (p, i.toLong, 100L) }
        .toDF("piece", "id", "freq"))

  private def docsOf(texts: String*): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  /** All segmentations of `word` under marked pieces, best by
    * (Σ len², then the DP's local tie-break: at every cell prefer the
    * longer final piece).
    */
  private def bruteBest(
      word: String, vocab: Set[String], maxP: Int): Option[(Long, List[String])] = {
    def mark(pos: Int, s: String) = if (pos == 0) s else "##" + s
    def segs(pos: Int): List[List[String]] =
      if (pos == word.length) List(Nil)
      else (1 to math.min(maxP, word.length - pos)).toList.flatMap { l =>
        val p = mark(pos, word.substring(pos, pos + l))
        if (vocab(p)) segs(pos + l).map(p :: _) else Nil
      }
    val all = segs(0)
    if (all.isEmpty) None
    else {
      def plen(p: String) = if (p.startsWith("##")) p.length - 2 else p.length
      def score(s: List[String]) = s.map(p => plen(p).toLong * plen(p)).sum
      // DP tie-break replayed globally: score first, then prefer the
      // longer FINAL piece, then the longer piece before it, … —
      // i.e. the reversed length sequence, lexicographically. Encoded
      // as a digit string with '9' - len so ascending sort prefers
      // longer pieces (piece lengths are single digits <= 8).
      def revKey(s: List[String]) =
        s.reverse.map(p => ('9' - plen(p)).toChar).mkString
      val best = all.map(s => (score(s), s))
        .sortBy { case (sc, s) => (-sc, revKey(s)) }.head
      Some(best)
    }
  }

  test("DP beats greedy longest-match where greedy strands the tail") {
    val pieces = Seq("a", "##b", "##c", "##d", "##e", "ab", "abc", "##cde")
    val trained = vocabOf(pieces)
    val docs = docsOf("abcde")
    val greedy = WordPiece.encode(docs, "doc_id", "text", trained)
      .select("ids").head().getSeq[Long](0)
    val dp = Segment.encode(docs, "doc_id", "text", trained)
    val row = dp.head()
    val ids = row.getSeq[Long](2)
    val idOf = pieces.sorted.zipWithIndex.map { case (p, i) => p -> i.toLong }
      .toMap
    // greedy: abc + ##d + ##e (score 11); optimal: ab + ##cde (13)
    assert(greedy === Seq(idOf("abc"), idOf("##d"), idOf("##e")))
    assert(ids === Seq(idOf("ab"), idOf("##cde")))
    assert(row.getLong(3) === 13L)
  }

  test("matches brute-force enumeration over assorted words") {
    val pieces = Seq("a", "b", "c", "##a", "##b", "##c", "ab", "##ab",
      "##bc", "abc", "##abc", "aba", "##cab")
    val vocab = pieces.toSet
    val trained = vocabOf(pieces)
    val words = Seq("abcab", "ababa", "cab", "abcabc", "aa", "bca")
    val docs = docsOf(words.mkString(" "))
    val out = Segment.encode(docs, "doc_id", "text", trained).head()
    val expect = words.map(w => bruteBest(w, vocab, 8).get)
    val expIds = expect.flatMap(_._2.map(p =>
      pieces.sorted.indexOf(p).toLong))
    assert(out.getSeq[Long](2) === expIds)
    assert(out.getLong(3) === expect.map(_._1).sum)
  }

  test("unreachable word takes UNK id -1 with zero score") {
    val trained = vocabOf(Seq("a", "##b"))
    val out = Segment.encode(docsOf("ab xz ab"), "doc_id", "text", trained)
      .head()
    val aId = 0L // "##b" < "a"? lexicographic: '#'<'a' so ##b=0, a=1
    assert(out.getSeq[Long](2) === Seq(1L, 0L, -1L, 1L, 0L))
    assert(out.getInt(1) === 5)
    assert(out.getLong(3) === 4L, "two reachable words x score 2, UNK adds 0")
    assert(aId === 0L)
  }

  test("deterministic under repartitioning") {
    val pieces = Seq("a", "b", "##a", "##b", "ab", "##ab", "##ba")
    val trained = vocabOf(pieces)
    val docs = docsOf("abab baba abba baab")
    val a = Segment.encode(docs, "doc_id", "text", trained)
      .head().getSeq[Long](2)
    val b = Segment.encode(docs.repartition(5), "doc_id", "text", trained)
      .head().getSeq[Long](2)
    assert(a === b)
  }

  test("adversarial: null/empty/whitespace docs emit no rows, mixed doc total") {
    val trained = vocabOf(Seq("a", "##b"))
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "),
      (4L, "ab")).toDF("doc_id", "text")
    val out = Segment.encode(docs, "doc_id", "text", trained)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(4L -> 2))
  }
}
