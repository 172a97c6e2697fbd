package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Model-based quality scoring: a multinomial Naive Bayes classifier
  * over whitespace tokens — the relational twin of the fastText-style
  * quality filters LLM pretraining pipelines run after the cheap
  * rule-based pass (CCNet's wiki-vs-crawl LM filter, GPT-3's
  * quality classifier). A deterministic heuristic labels a SEED
  * split; the trained token model generalizes that judgment to the
  * whole corpus, scoring documents the rules never saw by the company
  * their tokens keep.
  *
  * Everything is DataFrame aggregates and equi-joins, so both train
  * and inference are SQL-expressible and oracle-checked end-to-end
  * (q85): no driver-side model object beyond five scalars, no UDF.
  *
  * Scale shape:
  *   - train: ONE explode of the seed split + one hash aggregate
  *     (map-side combined) to (token, c0, c1); the class priors and
  *     token totals are model-sized aggregates. Seed-split-sized, not
  *     corpus-sized.
  *   - score: one explode + (doc, token) hash aggregate, one
  *     equi-join against the token-count frame shuffled on `token`
  *     (the vocabulary grows with the seed corpus — a forced
  *     broadcast would hit the ceiling; AQE still broadcasts small
  *     models at runtime), one per-doc partial-aggregated sum. No
  *     windows, no driver loops.
  */
object QualityModel {

  /** A trained multinomial NB model. `tokenCounts` is (token, c0, c1)
    * occurrence counts per class over the seed split — vocabulary-
    * sized, kept distributed; the five scalars are class/total counts
    * (n = labeled docs, t = token occurrences, v = vocabulary size).
    */
  final case class NaiveBayes(
      tokenCounts: DataFrame,
      n0: Long, n1: Long,
      t0: Long, t1: Long,
      v: Long)

  /** Train on `labeled` (a boolean `labelCol` marks the positive
    * class). Fails loudly if either class is absent — a one-class
    * "model" would silently score everything with the prior.
    */
  def trainNaiveBayes(
      labeled: DataFrame,
      textCol: String,
      labelCol: String): NaiveBayes = {
    val toks = labeled.select(col(labelCol).cast("boolean").as("__y"),
      explode(TextFns.tokens(col(textCol))).as("token"))
    val counts = toks.groupBy(col("token"))
      .agg(sum(when(col("__y"), 0L).otherwise(1L)).as("c0"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("c1"))
      .localCheckpoint(true) // several scalar actions + the scoring join read it
    val Array(t0, t1, v) = counts
      .agg(sum(col("c0")), sum(col("c1")), count(lit(1)))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val pri = labeled.select(col(labelCol).cast("boolean").as("__y"))
      .groupBy(col("__y")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val (n0, n1) = (pri.getOrElse(false, 0L), pri.getOrElse(true, 0L))
    require(n0 > 0 && n1 > 0,
      s"trainNaiveBayes needs both classes in the seed split (n0=$n0, n1=$n1)")
    NaiveBayes(counts, n0, n1, t0, t1, v)
  }

  /** Score `docs`: per document the Laplace-smoothed log-odds
    *
    *   log(n1/n0) + Σ_tokens tf · [ln((c1+1)/(t1+V)) − ln((c0+1)/(t0+V))]
    *
    * with out-of-vocabulary tokens contributing the smoothing floor
    * (c0 = c1 = 0 via the left join). `log_odds` is 6-dp
    * floor-rounded (the q51/q81 discipline — confines libm and
    * summation-order differences vs the oracle) and `pred` compares
    * the ROUNDED value to zero so both engines threshold the same
    * number. Documents with zero tokens emit no row (explode
    * semantics, same as [[TextAnalysis.bigramLmScore]]).
    */
  def scoreNaiveBayes(
      m: NaiveBayes,
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val tf = docs.select(col(idCol).as("doc"),
        explode(TextFns.tokens(col(textCol))).as("token"))
      .groupBy(col("doc"), col("token")).agg(count(lit(1)).as("tf"))
    val perToken =
      log((coalesce(col("c1"), lit(0L)) + lit(1.0)) /
        lit((m.t1 + m.v).toDouble)) -
      log((coalesce(col("c0"), lit(0L)) + lit(1.0)) /
        lit((m.t0 + m.v).toDouble))
    val prior = math.log(m.n1.toDouble / m.n0.toDouble)
    tf.join(m.tokenCounts, Seq("token"), "left")
      .groupBy(col("doc"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * perToken).as("__raw"))
      .select(col("doc"), col("n_tokens"),
        (floor((col("__raw") + lit(prior)) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("log_odds"))
      .withColumn("pred", col("log_odds") > 0)
  }

  /** Train on the heuristic-labeled seed split and score the whole
    * corpus in one call — the composed pipeline step. The seed is the
    * deterministic md5-free modulus split `id % seedMod < seedKeep`
    * (ids are stable, so the split is reproducible), labeled by
    * [[TextAnalysis.qualityFilter]]'s composite `keep` rule.
    */
  def heuristicSeededScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String],
      seedMod: Int = 10,
      seedKeep: Int = 3): DataFrame = {
    val seed = docs.filter(pmod(col(idCol), lit(seedMod)) < seedKeep)
    val labeled = TextAnalysis.qualityFilter(seed, idCol, textCol, stopwords)
      .select(col(idCol), col("keep"))
      .join(seed.select(col(idCol), col(textCol)), Seq(idCol))
    val model = trainNaiveBayes(labeled, textCol, "keep")
    scoreNaiveBayes(model, docs, idCol, textCol)
  }

  /** Reliability (calibration) bins for the seeded NB scorer: rank
    * the whole corpus by log-odds, cut into `bins` equal-count
    * score deciles (integer arithmetic — bin = r0·bins div n), and
    * report each bin's observed positive rate under the heuristic
    * rule next to its mean score. A well-behaved classifier shows a
    * MONOTONE pos_rate across bins; a flat curve says the scores
    * carry no signal — the check run before trusting a quality
    * model's threshold (Guo et al. 2017's reliability-diagram shape,
    * rank-binned so no sigmoid/temperature floats enter the gate).
    *
    * Scale shape: scoring is [[heuristicSeededScores]]; the global
    * rank is ONE range-partitioned prefix sum
    * ([[graft.operators.ScaleOps.prefixSumByRange]], never a
    * single-task window); binning and both means are one combinable
    * bins-sized aggregate.
    *
    * Output: (bin, n_docs, mean_log_odds6, pos_rate6), bin ascending
    * by score.
    */
  def calibrationBins(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String],
      bins: Int = 10): DataFrame = {
    val scored = heuristicSeededScores(docs, idCol, textCol, stopwords)
      .select(col("doc").as(idCol), col("log_odds"))
    val labels = TextAnalysis.qualityFilter(docs, idCol, textCol, stopwords)
      .select(col(idCol), col("keep"))
    calibrationBinsFrom(scored.join(labels, Seq(idCol)), idCol, bins)
  }

  /** [[calibrationBins]] over an ALREADY scored+labeled frame
    * (idCol, log_odds, keep) — the entry point when the NB-scored
    * corpus is shared with the other readouts (ROC, PR, kappa, lift):
    * score once, bin here. Rank/bin/aggregate only; same output.
    */
  def calibrationBinsFrom(
      joined: DataFrame,
      idCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"calibration needs >= 2 bins, got $bins")
    val ranked = ScaleOps.prefixSumByRange(
      joined.select(col(idCol), col("log_odds"), col("keep")),
      Seq("log_odds", idCol), lit(1L), "__r0")
    val nRow = ranked.agg(max(col("__r0"))).head()
    require(!nRow.isNullAt(0), "calibration needs a non-empty corpus")
    val n = nRow.getLong(0) + 1
    def pr6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    ranked
      .withColumn("bin", expr(s"(__r0 * ${bins}L) div ${n}L").cast("int"))
      // mean over INTEGER MICRO-UNITS of the 6dp scores (the q163
      // lesson: avg() over rounded doubles can flip the final 6dp
      // rounding by an ulp depending on partition add order); the
      // pos rate is a 0/1 sum — exact in any order already
      .select(col("bin"),
        floor(col("log_odds") * lit(1e6) + lit(0.5)).cast("long")
          .as("__lom"),
        col("keep").cast("double").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__lom")).as("__sm"),
        pr6(avg(col("__y"))).as("pos_rate6"))
      .select(col("bin"), col("n_docs"),
        (floor(col("__sm").cast("double") / col("n_docs").cast("double")
          + lit(0.5)) / lit(1e6)).as("mean_log_odds6"),
        col("pos_rate6"))
  }
}
