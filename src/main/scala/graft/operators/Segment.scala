package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Optimal (DP) subword segmentation — the third member of the
  * tokenizer family: BPE (q77–q79) merges bottom-up, WordPiece
  * (q127–q129) matches greedily left-to-right, and this operator
  * segments each word into the GLOBALLY best piece sequence under an
  * integer objective, the unigram-LM/Viterbi shape with a
  * deterministic integer score standing in for log-probabilities:
  *
  *   maximize   Σ len(piece)²     (favors few, long pieces)
  *   tie-break  prefer the longer FINAL piece at each DP cell
  *              (score DESC, split point ASC — total, so the
  *              segmentation is unique and oracle-replayable)
  *
  * Greedy longest-match is NOT optimal under this objective —
  * SegmentSpec plants a vocab where greedy commits to a long first
  * piece and strands the remainder; the DP takes the shorter first
  * piece and wins. That divergence is the reason this operator
  * exists separately from WordPiece.
  *
  * Scale shape: the DP runs ONCE PER DISTINCT WORD as a row-local
  * fold (O(len · maxPieceLen) per word, no shuffle, no recursion in
  * the plan); valid-piece candidates come from one vocab-sized
  * broadcast join; document re-assembly is the WordPiece encode
  * discipline (distinct-word-sized tables broadcast into the corpus
  * scan).
  *
  * Vocabulary: any [[WordPiece.TrainedWordPiece]] (marked `##`
  * continuation pieces; single characters always present, so every
  * in-alphabet word is segmentable).
  */
object Segment {

  private def pieceExpr(word: Column, pos: Column, l: Column): Column =
    when(pos === 1, word.substr(pos, l))
      .otherwise(concat(lit("##"), word.substr(pos, l)))

  /** (word, pieces) for every distinct word — pieces null only when
    * some character is outside the vocab alphabet.
    */
  private[operators] def optimalTable(
      docs: DataFrame,
      textCol: String,
      trained: WordPiece.TrainedWordPiece,
      maxPieceLen: Int): DataFrame = {
    val words = docs
      .select(explode(TextFns.tokens(col(textCol))).as("word"))
      .distinct()
    // valid pieces (word, pos 1-based, l) under the vocab → for the
    // DP over prefix lengths: candidates ending at i are (j = pos-1,
    // i = pos+l-1); endsAt maps i → ascending j list
    val occ = words
      .select(col("word"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("pos"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("pos") + 1)))
          .as("l"))
      .select(col("word"), col("pos"), col("l"),
        pieceExpr(col("word"), col("pos"), col("l")).as("piece"))
    val endsAt = occ
      .join(broadcast(trained.vocab.select(col("piece"))), Seq("piece"))
      .select(col("word"), (col("pos") + col("l") - 1).as("end"),
        (col("pos") - 1).as("j"))
      .groupBy(col("word"), col("end"))
      .agg(array_sort(collect_list(col("j"))).as("js"))
      .groupBy(col("word"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("end"), col("js")))))
        .as("endsAt"))

    // DP fold over prefix lengths: acc.scores(i) = best Σ len² for
    // the first i chars (−1 unreachable), acc.js(i) = its split
    val emptyJs = array().cast("array<int>")
    val zero = struct(
      array(lit(0L)).as("scores"), array(lit(-1)).as("js"))
    val dp = aggregate(
      sequence(lit(1), length(col("word"))), zero,
      (acc, i) => {
        val scores = acc.getField("scores")
        val cands = transform(
          filter(coalesce(element_at(col("endsAt"), i), emptyJs),
            j => element_at(scores, j + 1) >= 0),
          j => struct(
            (element_at(scores, j + 1) + ((i - j) * (i - j)).cast("long"))
              .as("s"),
            (-j).as("nj")))
        val best = array_max(cands)
        struct(
          concat(scores, array(coalesce(best.getField("s"), lit(-1L))))
            .as("scores"),
          concat(acc.getField("js"),
            array(coalesce(-best.getField("nj"), lit(-1)))).as("js"))
      })
    // backtrack fold: walk stored splits from i = len down to 0
    val backtrack = (dpCol: Column) => aggregate(
      sequence(lit(1), length(col("word"))),
      struct(length(col("word")).as("i"),
        array().cast("array<string>").as("out")),
      (acc, _) => {
        val i = acc.getField("i")
        val j = element_at(dpCol.getField("js"), i + 1)
        when(i <= 0, acc).otherwise(struct(
          j.as("i"),
          concat(array(pieceExpr(col("word"), j + 1, i - j)),
            acc.getField("out")).as("out")))
      },
      acc => acc.getField("out"))
    words
      .join(endsAt, Seq("word"), "left")
      .withColumn("__dp", dp)
      .select(col("word"),
        when(element_at(col("__dp").getField("scores"),
          length(col("word")) + 1) < 0, lit(null).cast("array<string>"))
          .otherwise(backtrack(col("__dp"))).as("pieces"),
        element_at(col("__dp").getField("scores"),
          length(col("word")) + 1).as("score"))
      .localCheckpoint(true)
  }

  /** Encode documents under the optimal segmentation: tokens → DP
    * pieces → vocab ids in (word, piece) position order; unreachable
    * words emit the single id −1 (the WordPiece UNK convention).
    * Output: (idCol, n_ids, ids, score_sum — Σ per-token DP scores,
    * the optimality witness).
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      trained: WordPiece.TrainedWordPiece,
      maxPieceLen: Int = 8): DataFrame = {
    val table = optimalTable(docs, textCol, trained, maxPieceLen)
      .select(col("word"),
        coalesce(col("pieces"), array(lit("[UNK]"))).as("pieces"),
        greatest(col("score"), lit(0L)).as("score"))
    docs
      .select(col(idCol),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("wpos", "word")))
      .join(broadcast(table), "word")
      .select(col(idCol), col("wpos"), col("score"),
        posexplode(col("pieces")).as(Seq("spos", "piece")))
      .join(broadcast(trained.vocab.select(col("piece"), col("id"))),
        Seq("piece"), "left")
      .select(col(idCol), col("wpos"), col("spos"), col("score"),
        coalesce(col("id"), lit(-1L)).as("id"))
      .groupBy(col(idCol))
      .agg(
        transform(
          array_sort(collect_list(struct(col("wpos"), col("spos"),
            col("id")))),
          x => x.getField("id")).as("ids"),
        sum(when(col("spos") === 0, col("score")).otherwise(lit(0L)))
          .as("score_sum"))
      .select(col(idCol), size(col("ids")).as("n_ids"), col("ids"),
        col("score_sum"))
  }
}
