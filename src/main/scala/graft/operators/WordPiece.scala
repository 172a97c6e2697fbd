package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT-family
  * subword scheme, Devlin et al. 2019) — the greedy
  * LONGEST-MATCH-FIRST complement to [[Tokenize]]'s merge-replay BPE.
  * Pieces are position-classed: a piece matching at a word's start is
  * stored raw ("un"), a continuation piece carries the `##` marker
  * ("##able") — two disjoint sub-vocabularies keyed by one marked
  * string.
  *
  * Vocabulary (deterministic frequency construction, SQL-replayable —
  * the counting recipe, not the likelihood-training variant): every
  * (class, substring ≤ `maxPieceLen`) occurrence in the corpus'
  * distinct-word table counts `cnt(word)` per occurrence POSITION;
  * pieces with total frequency ≥ `minCount` qualify, plus every
  * observed single-character piece of either class unconditionally —
  * the fallback that makes greedy matching total on the training
  * corpus (every pos-1 char is init-observed, every pos>1 char
  * cont-observed, so self-encoding can never hit UNK; foreign text
  * can, and maps the whole word to id −1, BERT's [UNK] convention).
  * Ids are the 0-based lexicographic rank of the marked string.
  *
  * Encoding needs ONLY the vocabulary (no trained word table): for
  * each distinct word, the longest vocab match at every position is
  * ONE aggregate over the (pos, len) candidate explode
  * (`lm(word, pos)`), and the greedy walk is then a pure successor
  * chase — realized row-locally as a bounded fold over
  * `sequence(1, len(word))` carrying (pos, pieces) through the
  * per-word `pos → len` map. The DuckDB oracle replays the same walk
  * as a WITH RECURSIVE pointer chase over the same precomputed
  * longest-match table — aggregate-free recursion, which is the form
  * recursive SQL actually permits.
  *
  * Scale shape: everything up to reassembly is DISTINCT-WORD-sized
  * (the [[Tokenize]] discipline): the candidate explode is
  * Σ len(word)·maxPieceLen rows over distinct words, the vocab join
  * broadcasts, the walk fold runs once per distinct word. The corpus
  * stream is touched exactly twice: one tokenize-explode joined to
  * the word→pieces table, one per-doc reassembly aggregate.
  */
object WordPiece {

  /** Trained state: (piece, id, freq) — marked strings, lexicographic
    * 0-based ids, corpus frequencies.
    */
  final case class TrainedWordPiece(vocab: DataFrame)

  /** Marked-piece expression for a (word, pos, l) occurrence. */
  private def pieceExpr(word: Column, pos: Column, l: Column): Column =
    when(pos === 1, word.substr(pos, l))
      .otherwise(concat(lit("##"), word.substr(pos, l)))

  /** All (word, cnt, pos, l, piece) substring occurrences of the
    * distinct-word table, lengths capped at `maxPieceLen`.
    */
  private def occurrences(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("cnt"), col("pos"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("pos") + 1)))
          .as("l"))
      .select(col("word"), col("cnt"), col("pos"), col("l"),
        pieceExpr(col("word"), col("pos"), col("l")).as("piece"))

  private def distinctWords(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Build the frequency vocabulary. */
  def train(
      docs: DataFrame,
      textCol: String,
      maxPieceLen: Int = 8,
      minCount: Long = 20L): TrainedWordPiece = {
    require(maxPieceLen >= 1 && minCount >= 1, "bad wordpiece params")
    val words = distinctWords(docs, textCol).localCheckpoint(true)
    val isSingleChar =
      when(col("piece").startsWith("##"), length(col("piece")) === 3)
        .otherwise(length(col("piece")) === 1)
    val vocab = occurrences(words, maxPieceLen)
      .groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
      .filter(col("freq") >= minCount || isSingleChar)
      // vocabulary-sized by definition — the single-task rank window
      // is safe (the Tokenize.train convention)
      .withColumn("id",
        (row_number().over(Window.orderBy(col("piece"))) - 1).cast("long"))
      .select(col("piece"), col("id"), col("freq"))
      .localCheckpoint(true)
    TrainedWordPiece(vocab)
  }

  /** Greedy longest-match pieces for every distinct word of `docs`
    * under the trained vocab: (word, pieces array — null when the
    * walk gets stuck, the whole-word-UNK convention).
    */
  private[operators] def wordPieceTable(
      docs: DataFrame,
      textCol: String,
      trained: TrainedWordPiece,
      maxPieceLen: Int): DataFrame = {
    val words = distinctWords(docs, textCol)
    val lm = occurrences(words, maxPieceLen)
      .join(broadcast(trained.vocab.select(col("piece"))), Seq("piece"))
      .groupBy(col("word"), col("pos")).agg(max(col("l")).as("len"))
    val lenAt = lm.groupBy(col("word"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("pos"), col("len")))))
        .as("lenAt"))
    // the greedy walk: fold over an iteration budget of len(word)
    // steps (each step consumes >= 1 char or flags stuck, so the
    // budget always suffices); acc = (pos, out, stuck)
    val zero = struct(lit(1).as("pos"),
      array().cast("array<string>").as("out"), lit(false).as("stuck"))
    val walk = aggregate(
      sequence(lit(1), length(col("word"))),
      zero,
      (acc, _) => {
        val pos = acc.getField("pos")
        val l = element_at(col("lenAt"), pos)
        val doneOrStuck = acc.getField("stuck") || pos > length(col("word"))
        when(doneOrStuck, acc)
          .when(l.isNull,
            struct(pos.as("pos"), acc.getField("out").as("out"),
              lit(true).as("stuck")))
          .otherwise(struct((pos + l).as("pos"),
            concat(acc.getField("out"),
              array(pieceExpr(col("word"), pos, l))).as("out"),
            lit(false).as("stuck")))
      },
      acc => when(acc.getField("stuck"), lit(null).cast("array<string>"))
        .otherwise(acc.getField("out")))
    // left join: a word whose FIRST char is unseen has no lm rows at
    // all — null lenAt folds to stuck on step 1, as it must
    words.select(col("word"))
      .join(lenAt, Seq("word"), "left")
      .select(col("word"), walk.as("pieces"))
      .localCheckpoint(true)
  }

  /** Encode every document: tokens → greedy pieces → vocabulary ids,
    * reassembled in (word, piece) position order. Stuck (UNK) words
    * contribute the single id −1. Output: (idCol, n_ids, ids);
    * zero-token documents produce no row.
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      trained: TrainedWordPiece,
      maxPieceLen: Int = 8): DataFrame = {
    val table = wordPieceTable(docs, textCol, trained, maxPieceLen)
      .select(col("word"),
        coalesce(col("pieces"), array(lit("[UNK]"))).as("pieces"))
    docs
      .select(col(idCol),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("wpos", "word")))
      .join(broadcast(table), "word")
      .select(col(idCol), col("wpos"),
        posexplode(col("pieces")).as(Seq("spos", "piece")))
      .join(broadcast(trained.vocab.select(col("piece"), col("id"))),
        Seq("piece"), "left")
      .select(col(idCol), col("wpos"), col("spos"),
        coalesce(col("id"), lit(-1L)).as("id"))
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("wpos"), col("spos"), col("id")))),
        x => x.getField("id")).as("ids"))
      .select(col(idCol), size(col("ids")).as("n_ids"), col("ids"))
  }
}
