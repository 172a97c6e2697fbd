package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank-fusion retrieval (Cormack, Clarke & Buettcher 2009,
  * "Reciprocal Rank Fusion outperforms Condorcet and individual rank
  * learning methods"): combine any number of ranked candidate lists —
  * sparse BM25 ([[TextAnalysis.bm25]]), dense ANN
  * ([[Similarity.bruteForceTopK]] / the IVF paths), fingerprint
  * matches — into one list by summing reciprocal ranks:
  *
  *   rrf(d) = Σ_lists 1 / (k₀ + rank_list(d)),   absent ⇒ 0
  *
  * RRF is rank-only, so heterogeneous scores (BM25 log-weights vs
  * cosines) fuse without calibration — the reason it is the standard
  * hybrid-retrieval combiner.
  *
  * Determinism/portability: each contribution is the single division
  * `1.0 / (k₀ + rank)` on integer-valued operands (IEEE-identical in
  * any engine), the cross-list sum is a FIXED-ORDER coalesce chain
  * (list order = argument order — never an aggregate whose addend
  * order floats), rounded at 6dp before the final ordering with id
  * tie-break.
  *
  * Scale shape: the inputs are top-k lists (k rows each, produced by
  * TakeOrdered upstream), so the fusion is full-outer joins of k-row
  * frames — broadcast-sized by construction. Nothing here touches the
  * corpus.
  */
object Retrieval {

  /** Fuse ranked lists, each a (idCol, rankCol) frame with 1-based
    * ranks. Output: (idCol, rrf) — top `topK` by fused score, score
    * descending with id tie-break.
    */
  def rrfFuse(
      lists: Seq[DataFrame],
      idCol: String,
      rankCol: String = "rank",
      k0: Int = 60,
      topK: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k0 >= 0 && topK > 0, "k0 must be >= 0 and topK positive")
    val contribs = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol),
        (lit(1.0) / (lit(k0.toLong) + col(rankCol).cast("long"))).as(s"__c$i"))
    }
    val joined = contribs.reduceLeft((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score: Column = contribs.indices
      .map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduceLeft(_ + _)
    joined
      .select(col(idCol), (floor(score * lit(1e6) + lit(0.5)) / lit(1e6)).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }

  /** Attach 1-based ranks to a scored list: rank = position in
    * (scoreCol DESC, idCol) order. The input is a top-k list (k rows),
    * so the single-partition window is k-row bounded — NOT a corpus
    * window (callers rank AFTER their TakeOrdered, never before).
    */
  def withRank(list: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    list.withColumn("rank",
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol))))
  }

  /** nDCG@k (Järvelin & Kekäläinen 2002) of a ranked list against a
    * graded relevance table:
    *
    *   DCG@k  = Σ_{i=1..k} (2^rel_i − 1) / log₂(i + 1)
    *   IDCG@k = the same over the ideal ordering (rel DESC, id)
    *   nDCG@k = DCG / IDCG
    *
    * Output: ONE row (dcg, idcg, ndcg), 6dp-rounded.
    *
    * Determinism/portability: log₂ is spelled ln(i+1)/ln(2) on both
    * engines (their native log2 implementations need not agree to the
    * ulp); each per-rank term is 6dp-rounded, and the k-term sums are
    * FIXED-ORDER chains (rank 1 first) via a max(CASE rank) pivot —
    * the rrfFuse discipline, never a float aggregate whose addend
    * order floats.
    *
    * Scale shape: `ranked` is a top-k list; the ideal list is a
    * TakeOrdered over the relevance table (never a global window);
    * everything after is k-row frames.
    */
  def ndcgAtK(
      ranked: DataFrame,
      rels: DataFrame,
      idCol: String,
      relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    def pr6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    def term: Column = pr6((pow(lit(2.0), col(relCol).cast("double")) - lit(1.0)) /
      (log(col("rank").cast("double") + lit(1.0)) / log(lit(2.0))))
    def chainSum(df: DataFrame, out: String): DataFrame = {
      val pivoted = df.agg(
        max(when(col("rank") === 1, col("term"))).as("t1"),
        (2 to k).map(i =>
          max(when(col("rank") === i, col("term"))).as(s"t$i")): _*)
      pivoted.select(pr6((1 to k).map(i => coalesce(col(s"t$i"), lit(0.0)))
        .reduceLeft(_ + _)).as(out))
    }
    val actual = ranked.where(col("rank") <= k)
      .join(rels.select(col(idCol), col(relCol)), Seq(idCol))
      .select(col("rank"), term.as("term"))
    val ideal = withRank(
      rels.select(col(idCol), col(relCol).cast("double").as("__r"))
        .orderBy(col("__r").desc, col(idCol)).limit(k)
        .withColumnRenamed("__r", relCol),
      idCol, relCol)
      .select(col("rank"), term.as("term"))
    // all-zero / empty relevance ⇒ idcg = 0: null the ratio instead
    // of emitting NaN (the joinCardinality zero-denominator
    // convention)
    chainSum(actual, "dcg").crossJoin(chainSum(ideal, "idcg"))
      .select(col("dcg"), col("idcg"),
        when(col("idcg") === 0, lit(null).cast("double"))
          .otherwise(pr6(col("dcg") / col("idcg"))).as("ndcg"))
  }

  /** Mean reciprocal rank at k (Voorhees 1999): per query, 1/rank of
    * the FIRST relevant document inside the top-k (0 when none), and
    * the mean over queries — the "how fast does the ranker surface
    * one good answer" readout next to [[ndcgAtK]]'s graded-quality
    * one.
    *
    * RELEVANCE CONTRACT: `rels` is DOC-GLOBAL — a document is
    * relevant (or not) for EVERY query, joined on `idCol` alone.
    * This matches the corpus-label evaluations in this repo (one
    * quality label per doc); it is NOT TREC-style per-(query, doc)
    * qrels — a caller with per-query judgments must pre-filter or
    * pre-join `rels` per query before calling, or first_rank will
    * credit hits relevant to a different query.
    *
    * Determinism: first_rank is an integer min; each query's
    * reciprocal is micro-snapped (floor(1e6/rank + 0.5)) so the MRR
    * mean is an exact int64 micro sum over queries — the
    * [[RankStats.prCurve]] per-term-snap discipline.
    *
    * Scale shape: everything runs on the (queries × k)-sized ranked
    * frame — one relevance semi-join, one query-grain min, one 1-row
    * broadcast total. Queries with no relevant doc in the top-k
    * count as 0 in the mean (the standard convention), via the
    * distinct-query left join.
    *
    * Output: (queryCol, first_rank — null when no hit, rr6, mrr6 —
    * constant across rows); callers order.
    */
  def mrrAtK(
      ranked: DataFrame,
      rels: DataFrame,
      queryCol: String,
      idCol: String,
      rankCol: String,
      relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val firsts = ranked.filter(col(rankCol) <= k)
      .join(rels.filter(col(relCol)).select(col(idCol)), Seq(idCol),
        "left_semi")
      .groupBy(col(queryCol))
      .agg(min(col(rankCol)).cast("long").as("first_rank"))
    val perQ = ranked.select(col(queryCol)).distinct()
      .join(firsts, Seq(queryCol), "left")
      .withColumn("__rrm", when(col("first_rank").isNotNull,
        floor(lit(1e6) / col("first_rank").cast("double") + lit(0.5))
          .cast("long")).otherwise(0L))
    val tot = perQ.agg(count(lit(1)).as("__nq"),
      coalesce(sum(col("__rrm")), lit(0L)).as("__srrm"))
    perQ.crossJoin(broadcast(tot))
      .select(col(queryCol), col("first_rank"),
        (col("__rrm").cast("double") / lit(1e6)).as("rr6"),
        when(col("__nq") > 0,
          floor(col("__srrm").cast("double") / col("__nq").cast("double")
            + lit(0.5)) / lit(1e6))
          .otherwise(lit(null).cast("double")).as("mrr6"))
  }
}
