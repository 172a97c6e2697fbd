package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** WordPiece must honor greedy longest-match-first semantics, the
  * single-char fallback (no UNK on self-encoding), whole-word UNK on
  * foreign characters, and piece-perfect word reconstruction.
  */
class WordPieceSpec extends SparkSuiteBase {

  import spark.implicits._

  private def vocabOf(pieces: String*): WordPiece.TrainedWordPiece =
    WordPiece.TrainedWordPiece(
      pieces.sorted.zipWithIndex
        .map { case (p, i) => (p, i.toLong, 1L) }
        .toDF("piece", "id", "freq"))

  test("greedy longest-match-first, not best-segmentation") {
    // "abcd": greedy takes "abc" then needs "##d"; the alternative
    // "ab" + "##cd" would also cover but greedy must not choose it
    val trained = vocabOf("abc", "ab", "##cd", "##d", "a")
    val docs = Seq((1L, "abcd")).toDF("doc_id", "text")
    val out = WordPiece.encode(docs, "doc_id", "text", trained).collect()(0)
    val vocab = trained.vocab.collect()
      .map(r => r.getLong(1) -> r.getString(0)).toMap
    val pieces = out.getSeq[Long](2).map(vocab)
    assert(pieces == Seq("abc", "##d"), s"got $pieces")
  }

  test("stuck mid-word -> whole-word UNK even when pieces matched earlier") {
    // "abxz": "ab" matches, then no piece covers x at a continuation
    // position -> the WHOLE word is one -1 (BERT's [UNK] convention)
    val trained = vocabOf("ab", "##z", "a")
    val docs = Seq((1L, "abxz ab")).toDF("doc_id", "text")
    val out = WordPiece.encode(docs, "doc_id", "text", trained).collect()(0)
    val ids = out.getSeq[Long](2)
    assert(ids.count(_ == -1L) == 1, s"one UNK word expected: $ids")
    assert(out.getInt(1) == 2, s"UNK word is ONE id, 'ab' one more: $out")
  }

  test("self-encoding the training corpus never produces UNK and reconstructs words") {
    val docs = graft.Tables.documents(spark, sfDir)
    val trained = WordPiece.train(docs, "text", maxPieceLen = 8, minCount = 20L)
    val enc = WordPiece.encode(docs, "doc_id", "text", trained)
    assert(enc.filter(array_contains(col("ids"), -1L)).count() == 0,
      "single-char fallback must make self-encoding total")
    // piece-perfect reconstruction: join ids back to pieces, strip
    // the ## markers, and compare against the tokenized text
    val words = docs
      .filter(size(graft.functions.TextFns.tokens(col("text"))) > 0)
      .select(col("doc_id"),
        concat_ws("", graft.functions.TextFns.tokens(col("text"))).as("glued"))
    val vocabMap = trained.vocab.collect()
      .map(r => r.getLong(1) -> r.getString(0)).toMap
    val rebuilt = enc.collect().map { r =>
      r.getLong(0) -> r.getSeq[Long](2)
        .map(vocabMap).map(p => if (p.startsWith("##")) p.drop(2) else p)
        .mkString("")
    }.toMap
    words.collect().foreach { r =>
      assert(rebuilt(r.getLong(0)) == r.getString(1),
        s"doc ${r.getLong(0)} reconstruction mismatch")
    }
  }

  test("vocabulary: single chars always qualify; rare long pieces do not") {
    val docs = Seq((1L, "zz zz zz qqqqq")).toDF("doc_id", "text")
    val trained = WordPiece.train(docs, "text", maxPieceLen = 8, minCount = 3L)
    val pieces = trained.vocab.collect().map(_.getString(0)).toSet
    // 'zz' occurs 3 times (>= minCount); 'qqqqq' once (< minCount)
    assert(pieces.contains("zz"))
    assert(!pieces.contains("qqqqq"))
    // single chars of both classes always present
    assert(pieces.contains("z") && pieces.contains("##z"))
    assert(pieces.contains("q") && pieces.contains("##q"))
    // ids are the 0-based lexicographic rank of the marked string
    val ranked = trained.vocab.orderBy("id").collect().map(_.getString(0))
    assert(ranked.toSeq == ranked.toSeq.sorted)
  }

  test("encode is deterministic under repartitioning") {
    val docs = graft.Tables.documents(spark, sfDir)
    val trained = WordPiece.train(docs, "text", 8, 20L)
    def run(df: org.apache.spark.sql.DataFrame) =
      WordPiece.encode(df, "doc_id", "text", trained)
        .select(col("doc_id"), array_join(col("ids"), ",").as("csv"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run(docs) == run(docs.repartition(7)))
  }
}
