package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Unigram-LM subword tokenizer, one hard-EM round (the
  * SentencePiece training shape, Kudo 2018) — the FOURTH tokenizer
  * discipline: BPE merges bottom-up (q77), WordPiece matches greedily
  * (q127), q139's DP segments under a fixed integer objective; this
  * one LEARNS the objective — piece log-probabilities — from the
  * corpus and re-estimates them through a Viterbi E-step:
  *
  *   seed:   count every ≤maxPieceLen substring occurrence of every
  *           word (× word frequency); keep count ≥ minCount pieces +
  *           the full single-char alphabet; score = ln(c/T)
  *   E-step: Viterbi-segment every DISTINCT word under the integer
  *           MICRO-snapped scores (hard EM — the max-path assignment,
  *           not the lattice expectation; one round of it is the
  *           deterministic, oracle-replayable core of the loop)
  *   M-step: usage(p) = Σ word-freq over the chosen segmentations;
  *           new score = ln(usage/U)
  *
  * Determinism contract: piece scores snap to int64 micro BEFORE the
  * DP, so every DP cell compares exact integers (the q139 play, with
  * learned scores in place of len²); cell ties break (score DESC,
  * split ASC) — total, so the segmentation is unique and the oracle
  * replays it layer by layer. The only floats are the two ln(·/·)
  * readouts, each 6dp-snapped.
  *
  * Scale shape: two corpus-token aggregates (word freq, seed
  * counts), one vocab broadcast into the occurrence join, the DP as
  * a row-local fold ONCE PER DISTINCT WORD (O(len·maxPieceLen), no
  * shuffle), one piece-grain usage aggregate. Nothing is ever
  * corpus² and the corpus text is read once.
  *
  * Output: the top `topK` re-estimated pieces by
  * (usage DESC, piece): (piece, seed_count, usage, score6).
  */
object UnigramLm {

  private def pr6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  def emRound(
      docs: DataFrame,
      textCol: String,
      maxPieceLen: Int = 4,
      minCount: Long = 50L,
      topK: Int = 50): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 12,
      s"maxPieceLen must be in [1,12], got $maxPieceLen")
    require(topK >= 1, "topK must be >= 1")
    val words = docs
      .select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .localCheckpoint(true) // distinct-word frame; seeds + E-step
    // seed piece counts: every (pos, l) substring occurrence × wf
    val occ = words
      .select(col("word"), col("wf"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("wf"), col("pos"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("pos") + 1)))
          .as("l"))
      .select(col("word"), col("wf"), col("pos"), col("l"),
        col("word").substr(col("pos"), col("l")).as("piece"))
    val seed = occ.groupBy(col("piece")).agg(sum(col("wf")).as("c"))
      .filter(col("c") >= minCount || length(col("piece")) === 1)
      .localCheckpoint(true) // vocab-sized; scored + joined below
    val tot = seed.agg(sum(col("c")).as("__t"))
    val scored = seed.crossJoin(broadcast(tot))
      .select(col("piece"), col("c").as("seed_count"),
        floor(log(col("c").cast("double") / col("__t").cast("double")) *
          lit(1e6) + lit(0.5)).cast("long").as("__sc"))
      .localCheckpoint(true)
    // E-step: Viterbi per distinct word over the scored candidates.
    // endsAt: prefix end i → ascending-j list of (split j, piece score)
    val endsAt = occ
      .join(broadcast(scored.select(col("piece"), col("__sc"))),
        Seq("piece"))
      .select(col("word"), (col("pos") + col("l") - 1).as("end"),
        struct((col("pos") - 1).as("j"), col("__sc").as("sc")).as("e"))
      .groupBy(col("word"), col("end"))
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .groupBy(col("word"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("end"), col("es")))))
        .as("endsAt"))
    val minS = Long.MinValue / 4 // unreachable sentinel, sum-safe
    val emptyEs = array().cast("array<struct<j:int,sc:bigint>>")
    val zero = struct(array(lit(0L)).as("scores"),
      array(lit(-1)).as("js"))
    val dp = aggregate(
      sequence(lit(1), length(col("word"))), zero,
      (acc, i) => {
        val scores = acc.getField("scores")
        val cands = transform(
          filter(coalesce(element_at(col("endsAt"), i), emptyEs),
            e => element_at(scores, e.getField("j") + 1) > lit(minS)),
          e => struct(
            (element_at(scores, e.getField("j") + 1) + e.getField("sc"))
              .as("s"),
            (-e.getField("j")).as("nj")))
        val best = array_max(cands)
        struct(
          concat(scores,
            array(coalesce(best.getField("s"), lit(minS)))).as("scores"),
          concat(acc.getField("js"),
            array(coalesce(-best.getField("nj"), lit(-1)))).as("js"))
      })
    val backtrack = (dpCol: Column) => aggregate(
      sequence(lit(1), length(col("word"))),
      struct(length(col("word")).as("i"),
        array().cast("array<string>").as("out")),
      (acc, _) => {
        val i = acc.getField("i")
        val j = element_at(dpCol.getField("js"), i + 1)
        when(i <= 0, acc).otherwise(struct(
          j.as("i"),
          concat(array(col("word").substr(j + 1, i - j)),
            acc.getField("out")).as("out")))
      },
      acc => acc.getField("out"))
    val segmented = words
      .join(endsAt, Seq("word"), "left")
      .withColumn("__dp", dp)
      .select(col("word"), col("wf"), backtrack(col("__dp")).as("pieces"))
    // M-step: usage-weighted re-estimation over the Viterbi paths
    val usage = segmented
      .select(col("wf"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wf")).as("usage"))
      .localCheckpoint(true)
    val uTot = usage.agg(sum(col("usage")).as("__u"))
    usage.join(scored.select(col("piece"), col("seed_count")),
        Seq("piece"))
      .crossJoin(broadcast(uTot))
      .select(col("piece"), col("seed_count"), col("usage"),
        pr6(log(col("usage").cast("double") / col("__u").cast("double")))
          .as("score6"))
      .orderBy(col("usage").desc, col("piece"))
      .limit(topK)
  }
}
