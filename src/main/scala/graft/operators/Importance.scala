package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextFns}

/** Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169 "DSIR") — select raw-corpus documents whose
  * hashed-n-gram distribution looks like a small TARGET sample (the
  * published recipe for "give me web documents that look like
  * Wikipedia"). The reference's curation surface has rate- and
  * budget-based mixing ([[Curation.mixSample]]/[[Curation.budgetSample]]);
  * DSIR is the LEARNED complement: per-document importance weights
  * from a pair of bag-of-hashed-ngrams unigram models, then
  * Gumbel-top-k resampling without replacement with probability
  * proportional to the weight.
  *
  * Model: token w hashes to bucket b(w) = md5₆₀(w) mod B ([[PortableHash]]
  * — oracle-replayable, unlike a library feature hasher). With
  * add-one smoothing, p_t(b) = (c_t(b)+1)/(N_t+B) and p_r(b) likewise,
  * so a bucket's log-ratio is
  *
  *   lr(b) = ln( (c_t(b)+1)·(N_r+B) / ((c_r(b)+1)·(N_t+B)) )
  *
  * — one `ln` of a ratio of EXACT integer products (counts are int64;
  * the products stay under 2^53 for corpora to ~10^8 tokens per side,
  * beyond which the factored ln-sum form below applies; `ln` follows
  * the q51/q85/q115 libm precedent, final sums rounded at 6dp). A
  * document's log-weight is Σ_b c_d(b)·lr(b) over its OWN bucket
  * counts — buckets unseen in both corpora cannot occur for documents
  * drawn from them; documents from elsewhere fall back to the
  * all-unseen ratio ln((N_r+B)/(N_t+B)).
  *
  * Scale shape: the ratio table is ≤ B rows however large either
  * corpus (two map-side-combined aggregates over 8-byte bucket keys),
  * and it BROADCASTS into the per-document scoring join — scoring is
  * one row-local tokenize + one (doc, bucket) partial aggregate +
  * one broadcast join + one per-doc sum. Nothing vocabulary-sized
  * ever shuffles. Gumbel-top-k is a `TakeOrdered` (per-partition
  * top-k, then a k-row driver merge), never a global sort.
  */
object Importance {

  /** Hashed-unigram bucket counts: (b, c) with b = md5₆₀(token) mod
    * `buckets` — at most `buckets` rows out regardless of corpus size.
    */
  def bucketCounts(docs: DataFrame, textCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    docs
      .select(explode(TextFns.tokens(col(textCol))).as("__w"))
      .select((PortableHash.md5Long60(col("__w")) % lit(buckets.toLong))
        .as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** The per-bucket log-ratio table (b, lr) for `target` vs `raw`,
    * plus the smoothed totals needed for unseen-bucket fallback:
    * returns (ratios ≤ buckets rows, ln((N_r+B)/(N_t+B))).
    */
  def logRatios(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      buckets: Int): (DataFrame, Double) = {
    val tc = bucketCounts(target, textCol, buckets)
      .withColumnRenamed("c", "__ct")
    val rc = bucketCounts(raw, textCol, buckets)
      .withColumnRenamed("c", "__cr")
    // totals are exact longs; collected once (two scalars) so the
    // ratio frame carries no cross join and the fallback is a literal
    val Array(nt, nr) = Seq(tc.agg(sum(col("__ct"))), rc.agg(sum(col("__cr"))))
      .map(_.collect()(0))
      .map(r => if (r.isNullAt(0)) 0L else r.getLong(0))
      .toArray
    val ratios = tc.join(rc, Seq("b"), "full_outer")
      .select(col("b"),
        log((coalesce(col("__ct"), lit(0L)) + lit(1.0)) * lit((nr + buckets).toDouble)
          / ((coalesce(col("__cr"), lit(0L)) + lit(1.0)) * lit((nt + buckets).toDouble)))
          .as("lr"))
    (ratios, math.log((nr + buckets).toDouble / (nt + buckets).toDouble))
  }

  /** Per-document DSIR importance log-weights for `docs` under a
    * prebuilt ratio table: (idCol, n_tokens, logw). Documents with
    * zero tokens are absent (they have no evidence either way).
    */
  def logWeightsWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ratios: DataFrame,
      buckets: Int,
      unseenLr: Double): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val db = docs
      .select(col(idCol).as("__doc"),
        explode(TextFns.tokens(col(textCol))).as("__w"))
      .select(col("__doc"),
        (PortableHash.md5Long60(col("__w")) % lit(buckets.toLong)).as("b"))
      .groupBy(col("__doc"), col("b"))
      .agg(count(lit(1)).as("__c"))
    db.join(broadcast(ratios), Seq("b"), "left")
      .groupBy(col("__doc"))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c") * coalesce(col("lr"), lit(unseenLr))).as("__raw"))
      .select(col("__doc").as(idCol), col("n_tokens"),
        (floor(col("__raw") * lit(1e6) + lit(0.5)) / lit(1e6)).as("logw"))
  }

  /** End-to-end weights: fit the ratio table on (target, raw), score
    * `docs`.
    */
  def logWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      raw: DataFrame,
      buckets: Int): DataFrame = {
    val (ratios, unseen) = logRatios(target, raw, textCol, buckets)
    logWeightsWith(docs, idCol, textCol, ratios, buckets, unseen)
  }

  /** Gumbel-top-k resampling over a log-weight frame: key(d) =
    * logw(d) − ln(−ln(u(d))) with u(d) the md5-uniform in (0,1)
    * ((md5₆₀(id) mod 10⁶ + 0.5)/10⁶ — the +0.5 keeps u off both
    * endpoints). The Gumbel-max trick makes the k largest keys a
    * sample WITHOUT replacement with inclusion ∝ exp(logw), yet fully
    * deterministic in the ids — re-runs, re-partitions, and engines
    * agree (keys round at 6dp before ranking so a last-ulp libm
    * difference cannot flip an order; ties break by id).
    * Output: (idCol, key) — the k selected documents, highest first.
    */
  def gumbelTopK(
      weights: DataFrame,
      idCol: String,
      logwCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (PortableHash.md5Long60(col(idCol).cast("string")) % lit(1000000L)
      + lit(0.5)) / lit(1e6)
    val key = col(logwCol) - log(-log(u))
    weights
      .select(col(idCol),
        (floor(key * lit(1e6) + lit(0.5)) / lit(1e6)).as("key"))
      .orderBy(col("key").desc, col(idCol))
      .limit(k)
  }

  /** Effective sample size of an importance-weighted corpus (Kong
    * 1992's ESS = (Σw)²/Σw², the standard importance-sampling
    * diagnostic): how many EQUALLY-weighted documents this weighted
    * corpus is worth — an ESS far below n means a few huge weights
    * dominate and the resample (q118) is about to collapse onto them.
    * The go/no-go readout a DSIR pipeline checks before trusting its
    * weights.
    *
    * Determinism: ESS is scale-invariant, so weights normalize by the
    * MAX log-weight (an exact 6dp-value max) before exp — bounding
    * every normalized weight in (0, 1] so the micro-snap
    * wᵢ = floor(exp(logwᵢ − max)·1e6 + 0.5) is exact int64 whatever
    * the log-weight range; Σw rides int64, Σw² rides decimal(38,0)
    * (n·1e12 per row — int64 dies near 9e6 rows); the final ratio is
    * one row-local double chain, 6dp-snapped. exp() is libm-vs-JVM
    * 1-ulp territory — the micro-snap absorbs it except at exact .5
    * boundaries, the accepted q51/q81 float-discipline class.
    *
    * Scale shape: one 1-row max broadcast + ONE map-side-combinable
    * aggregate. Output: ONE row (n_docs, ess6, ess_ratio6).
    */
  def effectiveSampleSize(
      weights: DataFrame,
      logwCol: String): DataFrame = {
    // NULL log-weights carry no weight information: they are dropped
    // BEFORE any aggregate, so n_docs counts only weighted rows and
    // ess_ratio6 is not silently deflated by null-weight rows.
    val live = weights.filter(col(logwCol).isNotNull)
    val mx = live.agg(max(col(logwCol)).as("__mx"))
    val wm = floor(exp(col(logwCol) - col("__mx")) * lit(1e6) + lit(0.5))
      .cast("long")
    val dec = "decimal(38,0)"
    val agg = live.crossJoin(broadcast(mx))
      .select(wm.as("__wm"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("__wm")), lit(0L)).as("__sw"),
        coalesce(sum(col("__wm").cast(dec) * col("__wm").cast(dec)),
          lit(0L).cast(dec)).as("__sww"))
    def p6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val ess = col("__sw").cast("double") * col("__sw").cast("double") /
      col("__sww").cast("double")
    agg.select(col("n_docs"),
      when(col("__sww") > 0, p6(ess))
        .otherwise(lit(null).cast("double")).as("ess6"),
      when(col("__sww") > 0,
        p6(ess / col("n_docs").cast("double")))
        .otherwise(lit(null).cast("double")).as("ess_ratio6"))
  }
}
