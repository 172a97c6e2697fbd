package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deterministic BPE (byte-pair-encoding) tokenizer over DataFrames —
  * training AND encoding as pure integer/string relational work, so a
  * SQL oracle replays both bit-for-bit (q77/q78). This upgrades the
  * token-count surface from q42's heuristic ESTIMATE to real subword
  * ids: chunking/packing can consume actual token counts (q79), the
  * missing piece a training-data pipeline needs before packing.
  *
  * Semantics (classic word-level BPE, no end-of-word marker, no
  * byte-fallback — the deterministic core, not a GPT-compatible
  * artifact):
  *   - words = lowercase whitespace tokens ([[TextFns.tokens]]);
  *     merges never cross a word boundary;
  *   - training: `numMerges` rounds; each round counts adjacent
  *     symbol pairs weighted by word frequency, picks the max-count
  *     pair (ties broken lexicographically on (left, right) — the
  *     determinism pin), and merges all its non-overlapping
  *     occurrences left-to-right in every word;
  *   - vocabulary: every distinct final symbol, id = 0-based
  *     lexicographic rank (collision-free by construction: ids key on
  *     the symbol STRING, so two merge paths producing one string
  *     share one id);
  *   - encoding: per-word symbol sequences come from the trained
  *     word table (merges were already applied there), so encoding a
  *     corpus is two equi-joins — no per-occurrence merge replay.
  *
  * Scale shape: every training round aggregates over the DISTINCT
  * word table (vocabulary-sized, orders of magnitude below corpus
  * rows), with one (l, r) best-pair row collected per round; the
  * interpreted fold HOF that applies a merge runs once per distinct
  * word, never per corpus occurrence. Encoding streams the corpus
  * through two equi-joins (word → symbols → ids; both right sides
  * vocabulary-sized — AQE broadcasts them) and one per-doc
  * aggregation. The vocab id ranking is one window over the distinct
  * symbol set — vocabulary-sized by definition, safe as a single
  * task.
  */
object Tokenize {

  /** Trained state: the merge table (rank order), the per-word final
    * symbol sequences, and the symbol → id vocabulary.
    */
  final case class TrainedBpe(
      merges: Seq[(String, String, Long)],
      wordSyms: DataFrame,
      vocab: DataFrame)

  private def chars(c: Column): Column =
    regexp_extract_all(c, lit("."), lit(0))

  /** One merge application: fold the symbol array left-to-right,
    * merging every non-overlapping (l, r) adjacency. The fold's
    * just-merged symbol (`l+r`) can itself be the left of a later
    * match in the same pass — exactly the textbook greedy pass
    * ("aaaa" + (a,a) → [aa, aa]).
    */
  private def applyMerge(s: Column, l: String, r: String): Column =
    aggregate(s, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0
          && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Train `numMerges` merges over the corpus text. Stops early if the
    * corpus runs out of adjacent pairs (merge table then carries fewer
    * rows). Each round's word table is checkpointed so the loop's
    * lineage stays flat.
    */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int): TrainedBpe = {
    require(numMerges >= 1, "need at least one merge round")
    var state = docs
      .select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"), chars(col("word")).as("s"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // adjacent pairs of the CURRENT symbol sequences, weighted by
      // word frequency; sequence(1, 0) would count DOWN, so 1-symbol
      // words are excluded before the transform
      val best = state
        .filter(size(col("s")) >= 2)
        .select(col("cnt"),
          explode(transform(sequence(lit(1), size(col("s")) - 1),
            i => struct(element_at(col("s"), i).as("l"),
              element_at(col("s"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((l, r, c))
        state = state
          .select(col("word"), col("cnt"), applyMerge(col("s"), l, r).as("s"))
          .localCheckpoint(true)
        round += 1
      }
    }
    val wordSyms = state.select(col("word"), col("s"))
    // checkpointed: the id ranking is a single-task window (vocab-
    // sized by definition) — materialize it once at train time
    // instead of re-running it inside every encode consumer
    val vocab = wordSyms
      .select(explode(col("s")).as("sym")).distinct()
      .withColumn("id",
        (row_number().over(Window.orderBy(col("sym"))) - 1).cast("long"))
      .localCheckpoint(true)
    TrainedBpe(merges.toSeq, wordSyms, vocab)
  }

  /** Encode every document to its id array: tokens → trained symbol
    * sequences → vocabulary ids, reassembled in (word, symbol)
    * position order. Output: (idCol, n_ids, ids). Documents with zero
    * tokens produce no row.
    *
    * FOREIGN text (a frozen tokenizer encoding a corpus it was not
    * trained on) loses nothing: words absent from the training word
    * table fall back to their character sequence with the trained
    * merge list replayed in rank order — exactly what training would
    * have produced had the word been present (on training words the
    * word-table join IS that replay, memoized). Symbols outside the
    * trained alphabet map to the UNK id -1 (the classic no-byte-
    * fallback BPE convention), so every input token contributes its
    * full symbol sequence and token counts are conserved.
    *
    * Scale shape: the merge replay (numMerges nested row-local folds)
    * runs once per DISTINCT OOV word, never per occurrence; both
    * vocabulary joins stay vocabulary-sized broadcasts.
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      trained: TrainedBpe): DataFrame = {
    // distinct OOV words get the trained merges replayed over their
    // chars (rank order — the same greedy pass training applied).
    // Derived at the DISTINCT-WORD level so the corpus occurrence
    // stream is exploded and joined exactly ONCE below (an earlier
    // revision split occurrences into known/OOV branches, recomputing
    // the explode per branch).
    val oovSyms = trained.merges.foldLeft(chars(col("word"))) {
      case (s, (l, r, _)) => applyMerge(s, l, r)
    }
    // materialized: the replay is a `numMerges`-deep nested HOF
    // expression, and left in the lineage Catalyst's projection
    // collapse substitutes it into every downstream reference of `s`
    // (measured: +10s of optimizer/codegen per encode at sf0.1, with
    // sub-second actual execution). The checkpoint evaluates it once
    // over the vocab-sized OOV set and hands downstream a plain array
    // column.
    val oovWords = docs
      .select(explode(TextFns.tokens(col(textCol))).as("word")).distinct()
      .join(trained.wordSyms.select(col("word")), Seq("word"), "left_anti")
      .select(col("word"), oovSyms.as("s"))
      .localCheckpoint(true)
    val wordTable = trained.wordSyms.select(col("word"), col("s"))
      .unionByName(oovWords)
    // both join right sides are vocabulary-sized — broadcast them
    // EXPLICITLY: their array-of-symbols columns inflate Catalyst's
    // size estimate past the auto-broadcast threshold, and a
    // sort-merge fallback would shuffle the per-occurrence stream
    // (measured: the q78 encode spent its time in exactly that)
    docs
      .select(col(idCol),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("wpos", "word")))
      .join(broadcast(wordTable), "word")
      .select(col(idCol), col("wpos"),
        posexplode(col("s")).as(Seq("spos", "sym")))
      .join(broadcast(trained.vocab), Seq("sym"), "left")
      .select(col(idCol), col("wpos"), col("spos"),
        coalesce(col("id"), lit(-1L)).as("id"))
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("wpos"), col("spos"), col("id")))),
        x => x.getField("id")).as("ids"))
      .select(col(idCol), size(col("ids")).as("n_ids"), col("ids"))
  }
}
