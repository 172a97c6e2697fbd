package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** The unigram-LM hard-EM round on planted corpora: whole-word
  * pieces beat split paths under learned ln-probs, out-of-vocab
  * words fall back to the always-kept single-char alphabet, and the
  * whole round is reshuffle-deterministic.
  */
class UnigramLmSpec extends SparkSuiteBase {

  test("emRound: dominant word keeps itself whole; rare word falls to chars") {
    import spark.implicits._
    // "food" × 60 clears minCount for every substring; "zq" × 3 keeps
    // only its single chars. Viterbi pays one ln term for the whole
    // word vs two for any split — the whole piece wins.
    val docs = (Seq.fill(60)("food") ++ Seq.fill(3)("zq"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val out = UnigramLm.emRound(docs, "text", maxPieceLen = 4,
      minCount = 50L, topK = 50).collect()
    val byPiece = out.map(r => r.getString(0) ->
      (r.getAs[Long]("seed_count"), r.getAs[Long]("usage"))).toMap
    assert(byPiece.keySet == Set("food", "z", "q"), s"got $byPiece")
    assert(byPiece("food")._2 == 60L)
    assert(byPiece("z")._2 == 3L && byPiece("q")._2 == 3L)
    // ranked by usage desc, the whole word leads
    assert(out.head.getString(0) == "food")
    // scores are ln(usage/U) on the 1e-6 grid and negative
    out.foreach { r =>
      val s = r.getAs[Double]("score6")
      assert(s < 0 && s == math.floor(s * 1e6 + 0.5) / 1e6)
    }
  }

  test("emRound: deterministic across partitionings; topK truncates") {
    import spark.implicits._
    val docs = (0 until 120).map(i =>
      (i.toLong, Seq("alpha", "beta", "gamma", "alphabet")(i % 4)))
      .toDF("doc_id", "text")
    val a = UnigramLm.emRound(docs, "text", 4, 20L, 50).collect().toSeq
    val b = UnigramLm.emRound(docs.repartition(7), "text", 4, 20L, 50)
      .collect().toSeq
    assert(a == b)
    val top3 = UnigramLm.emRound(docs, "text", 4, 20L, 3).collect()
    assert(top3.length == 3 && top3.map(_.getString(0)).toSeq ==
      a.take(3).map(_.getString(0)))
  }
}
