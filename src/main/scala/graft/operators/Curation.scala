package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the single call a pipeline
  * user makes per corpus snapshot, composing the individually-gated
  * stages into one keep/drop decision per document —
  *
  *   1. QUALITY   — Gopher-style composite filter
  *                  ([[TextAnalysis.qualityFilter]], one codegen scan);
  *   2. DECONTAMINATION — eval-set n-gram overlap
  *                  ([[Dedup.decontaminate]], broadcast semi-join);
  *   3. DEDUP     — staged pairs → clusters → best-quality survivor
  *                  ([[Dedup.Stage]] + [[Dedup.clusterSurvivors]],
  *                  one mined pair frame, pointer-jumped components).
  *
  * Signals are computed INDEPENDENTLY and AND-ed (`keep` =
  * quality ∧ ¬contaminated ∧ dedup-survivor): the survivor argmax runs
  * over the full training corpus, not the post-filter subset, so a
  * cluster whose best copy fails quality still keeps exactly one
  * representative row flagged — every drop is diagnosable from its
  * three booleans. Every row with a NON-NULL id is preserved: the
  * final assembly equi-joins the three signal frames on the id, and
  * null keys never equi-match (a null-safe `<=>` join would be worse —
  * two null-id rows would cross-match). Callers with null ids must
  * assign surrogate keys first; the component operators
  * ([[Dedup.decontaminate]], [[Dedup.clusterSurvivors]]) individually
  * pass null-id rows through.
  *
  * Scale shape: stage 1 and the contamination flag are row-local or
  * broadcast work; the dedup stage owns the only corpus self-join;
  * the final assembly is three id-keyed equi-joins of narrow signal
  * frames. `checkpointDir` flows to the stage for cluster-scale runs.
  */
object Curation {

  def curate(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      stopwords: Seq[String],
      shingleN: Int = 3,
      jaccardThreshold: Double = 0.8,
      decontamN: Int = 5,
      minOverlap: Int = 1,
      checkpointDir: Option[String] = None): DataFrame = {
    val quality = TextAnalysis.qualityFilter(train, idCol, textCol, stopwords)
      .select(col(idCol),
        (col("ok_len").cast("int") + col("ok_word_len").cast("int")
          + col("ok_stopwords").cast("int") + col("ok_digits").cast("int")
          + col("ok_repetition").cast("int")).as("passes"),
        col("keep").as("ok_quality"))
    val contam = Dedup.decontaminate(train, eval, idCol, textCol,
        decontamN, minOverlap)
      .select(col(idCol), col("contaminated"))
    val stage = Dedup.stageWith(train, idCol,
      () => Dedup.ngramJaccardPairs(train, idCol, textCol, blockCol,
        shingleN, jaccardThreshold),
      checkpointDir)
    val surv = stage.survivors(quality.select(col(idCol), col("passes")),
        "passes")
      .select(col(idCol), col("cluster"), col("keep").as("keep_dedup"))
    quality
      .join(contam, idCol)
      .join(surv, idCol)
      .withColumn("keep",
        col("ok_quality") && !col("contaminated") && col("keep_dedup"))
      .select(col(idCol), col("cluster"), col("passes"), col("ok_quality"),
        col("contaminated"), col("keep_dedup"), col("keep"))
  }

  /** Deterministic source-mixing: downsample each group to its target
    * rate — the data-mixing step between curation and packing (hit a
    * 50/25/… source distribution without a PRNG). A row survives when
    * its md5-derived uniform `u(id) = md5Long60(id) mod 10^6 / 10^6`
    * falls under the group's rate: reproducible across engines,
    * re-runs and repartitioning (the property `df.sample`'s
    * partition-seeded PRNG lacks), and NESTED rates compose — the
    * rows kept at rate 0.25 are a subset of those kept at 0.5,
    * because the same u(id) is compared in both. Groups absent from
    * `rates` keep `defaultRate`. Rows with a NULL id pass through
    * unconditionally — no deterministic uniform exists for them, and
    * silently dropping data would be worse; pre-filter if exclusion
    * is wanted. Row-local filter, no shuffle; rate-1.0 rows
    * short-circuit before the md5 is evaluated.
    */
  /** Deterministic train/val/test assignment: each non-null-id doc
    * lands in exactly one named split by its md5-uniform u(id)
    * against the CUMULATIVE ppm thresholds of `splits` (name →
    * fraction, must sum to 1 within ppm rounding). The standard
    * dataset-versioning contract: membership is a pure function of
    * the id — re-runs, re-partitions and corpus growth never move an
    * existing doc between splits, and any subset of the corpus can be
    * assigned independently (no global shuffle, no count, one
    * row-local scan).
    */
  /** The md5-uniform ppm draw + cumulative-threshold arm fold shared
    * by [[deterministicSplit]] and [[clusterSafeSplit]] — the last
    * split is the unconditional tail arm: cumulative rounding can
    * land a hair under 1e6 and no doc may fall through unsplit.
    */
  private def splitArms(keyCol: org.apache.spark.sql.Column,
      splits: Seq[(String, Double)])
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0),
      "splits must be non-negative fractions")
    val ppms = splits.map { case (nm, f) => (nm, math.round(f * 1e6)) }
    require(math.abs(ppms.map(_._2).sum - 1000000L) <= splits.size,
      s"split fractions must sum to 1 (got ${splits.map(_._2).sum})")
    val cum = ppms.scanLeft(0L)(_ + _._2).tail
    val u = graft.functions.PortableHash.md5Long60(keyCol.cast("string")) %
      lit(1000000L)
    val split = ppms.init.zip(cum.init).reverse
      .foldLeft(lit(ppms.last._1)) { case (acc, ((nm, _), c)) =>
        when(u < lit(c), lit(nm)).otherwise(acc)
      }
    (u, split)
  }

  def deterministicSplit(docs: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    val (u, split) = splitArms(col(idCol), splits)
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol), u.as("u"), split.as("split"))
  }

  /** LEAKAGE-SAFE train/val/test split: membership is the
    * [[deterministicSplit]] draw of the near-dup CLUSTER label, not
    * the document id — every member of a near-dup cluster lands on
    * the SAME side by construction, so an eval split can never hold a
    * near-copy of a training document (the split-level complement of
    * dedup: surviving one copy is a choice, but letting the copies
    * straddle the split is a measurement bug). Input is the cluster
    * frame (idCol, clusterCol — e.g. [[Dedup]] stage clusters, where
    * singletons carry their own id as the label, so non-duplicated
    * docs split exactly like [[deterministicSplit]] of the cluster
    * id). Row-local hash arithmetic — no shuffle, no global state;
    * re-runs and corpus growth never move an existing cluster.
    */
  def clusterSafeSplit(clusters: DataFrame, idCol: String,
      clusterCol: String, splits: Seq[(String, Double)]): DataFrame = {
    val (u, split) = splitArms(col(clusterCol), splits)
    clusters.filter(col(idCol).isNotNull && col(clusterCol).isNotNull)
      .select(col(idCol), col(clusterCol), u.as("u"), split.as("split"))
  }

  /** Deterministic STRATIFIED k-fold assignment: within every
    * stratum, rows rank under the md5-uniform (u, id) total order
    * (the [[deterministicSplit]] key — reshuffle-stable, data-blind)
    * and fold = rank mod k — so every (stratum, fold) cell holds
    * ⌊n_s/k⌋ or ⌈n_s/k⌉ rows EXACTLY. The cross-validation splitter:
    * [[deterministicSplit]]'s proportional membership can leave a
    * small stratum's folds ±√n unbalanced; ranked assignment cannot.
    *
    * Exhaustive + exclusive + balanced by construction (one fold per
    * row, |cells| differ by ≤ 1 within a stratum) — all spec'd.
    *
    * Scale shape: ONE range-partitioned prefix sum over
    * (stratum, u, id) ([[ScaleOps.prefixSumByRange]]) + a
    * strata-sized min-offset join — per-stratum ranks are the global
    * prefix minus the stratum's first prefix (the q214 shared-pass
    * idiom), so a giant stratum never funnels into one window task.
    *
    * Output: (idCol, strataCol, u, fold ∈ [0, k)); callers order.
    */
  def stratifiedKFold(
      docs: DataFrame,
      idCol: String,
      strataCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 1000, s"k must be in [2,1000], got $k")
    val u = graft.functions.PortableHash.md5Long60(col(idCol).cast("string")) %
      lit(1000000L)
    val keyed = docs.filter(col(idCol).isNotNull)
      .select(col(strataCol).as("__s"), u.as("u"), col(idCol))
    val p = ScaleOps.prefixSumByRange(keyed, Seq("__s", "u", idCol),
      lit(1L), "__gb", targetPartBytes = 1L << 20)
    val offs = p.groupBy(col("__s")).agg(min(col("__gb")).as("__off"))
    p.join(offs, Seq("__s"))
      .select(col(idCol), col("__s").as(strataCol), col("u"),
        ((col("__gb") - col("__off")) % lit(k.toLong)).as("fold"))
  }

  def mixSample(docs: DataFrame, idCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    // math.round, NOT toLong truncation: (0.0157 * 1e6).toLong is
    // 15699 — ~1.2% of ppm-expressible rates truncate down by one,
    // and an oracle written with the natural threshold literal would
    // hash-mismatch by exactly the boundary row
    def ppm(r: Double): Long = math.round(r * 1e6)
    val u = graft.functions.PortableHash.md5Long60(col(idCol).cast("string")) %
      lit(1000000L)
    val thresh = rates.foldLeft(lit(ppm(defaultRate))) {
      case (acc, (g, r)) =>
        when(col(groupCol) === g, lit(ppm(r))).otherwise(acc)
    }
    // order matters: the full-rate and null-id arms are checked first
    // so those rows never evaluate the md5
    docs.filter(thresh === lit(1000000L) || col(idCol).isNull || u < thresh)
  }

  /** Token-BUDGET sampling: per group, admit documents in the
    * md5-uniform deterministic order until the group's token budget is
    * reached — the mixture step when targets are absolute token counts
    * ("50 B tokens of web, 5 B of code") rather than [[mixSample]]'s
    * rates. The crossing document is admitted (strictly-before sum
    * < budget — the same one-document boundary tolerance as
    * [[TextAnalysis.packScan]]), so a group always reaches its budget
    * when it has the tokens. Groups absent from `budgets` keep
    * everything. Returns every NON-NULL-id input row with `keep`
    * (the same id contract as [[curate]]).
    *
    * Scale shape: NOT a per-group window (that sorts an entire group
    * — corpus/\#groups rows — in one task). The within-group prefix
    * decomposes over the GLOBAL (group, u, id) order, where a group's
    * rows are contiguous: global strictly-before sum minus the
    * group's first-row sum IS the within-group prefix. So it runs as
    * ONE [[ScaleOps.prefixSumByRange]] (auto-sized range partitions)
    * plus a per-group min + an id-keyed join back — no single task
    * ever holds a group.
    *
    * Determinism: the admission order is u(id) = md5-uniform with id
    * tie-break — reproducible across engines, re-runs, partitionings,
    * and stable under corpus growth (a new doc displaces only docs
    * ordered after it within its group).
    */
  def budgetSample(docs: DataFrame, idCol: String, groupCol: String,
      tokenCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val u = graft.functions.PortableHash.md5Long60(col(idCol).cast("string")) %
      lit(1000000L)
    val keyed = docs.select(col(idCol), col(groupCol), col(tokenCol),
      u.as("__u"))
    val prefixed = ScaleOps.prefixSumByRange(
      keyed, Seq(groupCol, "__u", idCol), col(tokenCol).cast("long"), "__g")
    val starts = prefixed.groupBy(col(groupCol))
      .agg(min(col("__g")).as("__g0"))
    val budget = budgets.foldLeft(lit(Long.MaxValue)) {
      case (acc, (g, b)) => when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    docs.join(
      prefixed.join(starts, Seq(groupCol))
        .select(col(idCol),
          ((col("__g") - col("__g0")) < budget).as("keep")),
      Seq(idCol))
  }

  /** Deterministic global shuffle + shard assignment — the training
    * EXPORT step: a reproducible random order over the corpus (so
    * training batches are shuffled, yet every re-run sees the same
    * sequence) plus a shard id for writing `numShards` equal-size
    * (±1) output files. The order is u(id) = md5-uniform with id
    * tie-break; the global position comes from ONE
    * [[ScaleOps.prefixSumByRange]] rank over auto-sized range
    * partitions — never a single-task global window. `shard` = pos
    * mod numShards ROUND-ROBINS the shuffled order, so every shard is
    * an unbiased corpus sample — the property contiguous block
    * splitting loses whenever anything upstream correlates with the
    * order. Null-id rows are excluded (no deterministic uniform
    * exists for them; pre-assign ids if they must ship).
    */
  def shuffleShard(docs: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val u = graft.functions.PortableHash.md5Long60(col(idCol).cast("string")) %
      lit(1000000L)
    val keyed = docs.filter(col(idCol).isNotNull)
      .select(col(idCol), u.as("__u"))
    ScaleOps.prefixSumByRange(keyed, Seq("__u", idCol), lit(1L), "pos")
      .select(col(idCol), col("pos"),
        pmod(col("pos"), lit(numShards.toLong)).as("shard"))
  }

  /** Temperature-weighted source mixing: per-source sampling rates
    * derived from the source SIZE distribution — rate_s scales the
    * source toward q_s ∝ c_s^alpha (alpha < 1 flattens: small sources
    * are upweighted relative to their share, the published mixture
    * recipe for multi-source pretraining corpora) under a total
    * document budget. rate_s = min(1, budget·q_s/c_s), quantized to
    * ppm, and a document survives when its md5-uniform u(id) falls
    * under its source's ppm threshold — [[mixSample]]'s determinism
    * with LEARNED rates instead of hand-set ones. Returns every
    * non-null-id row with its source `rate` and `keep`.
    *
    * The per-source counts are a group-count aggregate collected to
    * the driver — source cardinality is catalog-sized by definition
    * (tens, not millions); the weight normalization happens over that
    * tiny list. Thresholds ship back as a literal CASE column while
    * the source count stays at catalog size (the corpus pass is one
    * row-local scan, no join); above `maxLiteralGroups` the CASE
    * chain would become a thousands-deep expression tree (quadratic
    * to analyze, hostile to codegen), so thresholds ship as a
    * BROADCAST-joined table instead — same size-routing discipline as
    * the dedup family, same results (spec-asserted equal). The ppm
    * quantization confines libm pow/summation-order differences vs
    * the oracle to a <1e-9 rounding boundary (the q51/q81 float
    * discipline).
    */
  def temperatureMix(docs: DataFrame, idCol: String, groupCol: String,
      alpha: Double, budgetDocs: Long,
      maxLiteralGroups: Int = 64): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(budgetDocs >= 0, "budgetDocs must be non-negative")
    val counts = docs.filter(col(idCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("c"))
      .collect().map(r => r.get(0) -> r.getLong(1))
      // fixed summation order for the normalizer; String.valueOf so a
      // null source flows through to the null-safe <=> threshold arm
      // below instead of NPE-ing the sort
      .sortBy { case (g, _) => String.valueOf(g) }
    val sumW = counts.map { case (_, c) => math.pow(c.toDouble, alpha) }.sum
    val ppm: Seq[(Any, Long)] = counts.map { case (g, c) =>
      val q = math.pow(c.toDouble, alpha) / sumW
      g -> math.min(1e6,
        math.floor(budgetDocs * q / c * 1e6 + 0.5)).toLong
    }.toSeq
    val u = graft.functions.PortableHash.md5Long60(col(idCol).cast("string")) %
      lit(1000000L)
    val base = docs.filter(col(idCol).isNotNull)
    if (ppm.size <= maxLiteralGroups) {
      // unseen groups (impossible when thresholds come from this
      // corpus, possible if callers reuse the frame after an upstream
      // filter) keep everything rather than silently dropping
      val thresh = ppm.foldLeft(lit(1000000L)) { case (acc, (g, t)) =>
        when(col(groupCol) <=> lit(g), lit(t)).otherwise(acc)
      }
      base.select(col(idCol), col(groupCol),
        (thresh / lit(1e6)).as("rate"),
        (u < thresh).as("keep"))
    } else {
      // broadcast path: one null-safe-keyed hash join against the
      // catalog-sized threshold table; coalesce is the same
      // keep-unseen-groups default as the CASE chain's initial value
      val spark = docs.sparkSession
      val gType = docs.schema(groupCol).dataType
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__tm_g", gType, nullable = true),
        org.apache.spark.sql.types.StructField("__tm_thr",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row](ppm.size)
      ppm.foreach { case (g, t) =>
        rows.add(org.apache.spark.sql.Row(g, t))
      }
      val tdf = spark.createDataFrame(rows, schema)
      val thr = coalesce(col("__tm_thr"), lit(1000000L))
      base.join(broadcast(tdf), col(groupCol) <=> col("__tm_g"), "left")
        .select(col(idCol), col(groupCol),
          (thr / lit(1e6)).as("rate"),
          (u < thr).as("keep"))
    }
  }

  /** Quantile-threshold filtering: keep documents whose score clears
    * the corpus's own empirical q-quantile — the distribution-derived
    * cut real pipelines apply where no absolute threshold exists
    * (drop the shortest 10%, the worst-perplexity 20%, …). The
    * threshold is the ORDER STATISTIC at rank ⌊q·N⌋ of the global
    * (score, id) order — an integer-defined selection both engines
    * reproduce exactly, with none of interpolated-percentile's float
    * seams — and `keep` is the value comparison `score >= thr`, so
    * score plateaus crossing the rank keep ALL their members (the
    * threshold is a value, not a row count).
    *
    * Scale shape: one exact count, one range-partitioned prefix-sum
    * rank ([[ScaleOps.prefixSumByRange]] — never a global single-task
    * window), a one-row rank lookup collected to the driver, and a
    * row-local comparison shipped back as a literal. Contrast
    * `percentile()` (exact but holds each group's values in one
    * task's memory) and `approx_percentile` (distributed but
    * sketch-approximate, unusable under an exactness oracle).
    * Null-id rows are excluded (the prefix sum needs a total order).
    * The score keeps its NATIVE numeric type end-to-end — order
    * statistics need ordering, not integers, so fractional scores
    * (perplexities, probabilities) cut at their true quantile.
    */
  def quantileCutoff(docs: DataFrame, idCol: String, scoreCol: String,
      q: Double): DataFrame = {
    require(q >= 0 && q < 1, "q must be in [0, 1)")
    require(docs.schema(scoreCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"score column $scoreCol must be numeric")
    val keyed = docs.filter(col(idCol).isNotNull)
      .select(col(idCol), col(scoreCol))
    val n = keyed.count()
    require(n > 0, "quantileCutoff needs a non-empty corpus")
    val k = math.floor(q * n).toLong
    val ranked = ScaleOps.prefixSumByRange(
      keyed, Seq(scoreCol, idCol), lit(1L), "__rank")
    val thr = ranked.filter(col("__rank") === k)
      .select(col(scoreCol)).head().get(0)
    keyed.select(col(idCol), col(scoreCol),
      (col(scoreCol) >= lit(thr)).as("keep"))
  }

  /** Per-group NTILE bucketing over a score — the CCNet head/middle/
    * tail split (Wenzek et al. 2020): within each group (language),
    * rank documents by score (best first) and deal them into k
    * equal-size (±1) buckets; bucket 1 is "head". Exact ANSI ntile
    * semantics (the first n mod k buckets get ⌈n/k⌉ rows), so the
    * result replays bit-identically against a window-function oracle.
    *
    * Scale shape: the within-group rank decomposes over the GLOBAL
    * (group, -score, id) order exactly as [[budgetSample]]'s prefix
    * does — ONE [[ScaleOps.prefixSumByRange]] + a per-group min/count
    * aggregate joined back on the group key. Never a per-group window
    * (a language is most of a corpus; one task must not sort it). The
    * bucket is then a row-local closed form of (rank, n): with
    * q = n div k and rem = n mod k, bucket = ⌈r/(q+1)⌉ while
    * r ≤ rem·(q+1), else rem + ⌈(r − rem·(q+1))/q⌉.
    *
    * Rows with a NULL id or NULL score are excluded (no deterministic
    * order exists for them). A NULL GROUP key is kept and buckets as
    * its own partition — the window-ntile oracle semantics (PARTITION
    * BY group treats NULL as a partition); the stats join is null-safe
    * for exactly this. Ties break by id ascending — stable across
    * engines, re-runs, and partitionings.
    *
    * Output: (id, group, score, rank, n_group, bucket).
    */
  def ntileBuckets(docs: DataFrame, idCol: String, groupCol: String,
      scoreCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(docs.schema(scoreCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"score column $scoreCol must be numeric")
    val keyed = docs
      .filter(col(idCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(idCol), col(groupCol), col(scoreCol),
        negate(col(scoreCol).cast("double")).as("__ord"))
    val prefixed = ScaleOps.prefixSumByRange(
      keyed, Seq(groupCol, "__ord", idCol), lit(1L), "__r0")
    val stats = prefixed.groupBy(col(groupCol))
      .agg(min(col("__r0")).as("__g0"), count(lit(1)).as("n_group"))
    // exact long floor-div: subtract the remainder first so the double
    // division is of an exactly-divisible pair (exact below 2^53 —
    // corpus ranks, not token counts)
    def fdiv(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ((a - pmod(a, b)) / b).cast("long")
    val r = col("__r0") - col("__g0") + lit(1L)
    val q = fdiv(col("n_group"), lit(k.toLong))
    val rem = pmod(col("n_group"), lit(k.toLong))
    val cut = rem * (q + lit(1L))
    val bucket = when(r <= cut, fdiv(r + q, q + lit(1L)))
      .otherwise(rem + fdiv(r - cut + q - lit(1L), q))
    // null-SAFE equality on the group key: a window-ntile oracle
    // (PARTITION BY group) buckets a NULL partition like any other,
    // and a plain USING join would silently drop those rows (r15
    // ADVICE). stats is group-count-sized — broadcast it.
    prefixed.join(broadcast(stats.withColumnRenamed(groupCol, "__g")),
        col(groupCol) <=> col("__g"))
      .select(col(idCol), col(groupCol), col(scoreCol),
        r.as("rank"), col("n_group"), bucket.as("bucket"))
  }

  /** One-row corpus summary over [[curate]]'s output — the data-card
    * numbers a pipeline logs per snapshot. Drop-reason counts are
    * NON-exclusive (a doc can fail quality AND be a dup; each count
    * answers "how many docs trip this signal", and `n_kept` is the
    * conjunction). One partial-aggregated scan of the decision frame.
    */
  def report(curated: DataFrame): DataFrame =
    curated.agg(
      count(lit(1)).as("n_docs"),
      sum(col("keep").cast("long")).as("n_kept"),
      sum((!col("ok_quality")).cast("long")).as("n_quality_fail"),
      sum(col("contaminated").cast("long")).as("n_contaminated"),
      sum((!col("keep_dedup")).cast("long")).as("n_dup_dropped"),
      countDistinct(col("cluster")).as("n_clusters"))

  /** Deterministic MULTINOMIAL sampling with replacement, probability
    * ∝ an integer weight column (size-proportional document draws —
    * the "sample epochs by token count" step; the WITHOUT-replacement
    * ∝-weight complement is [[Importance.gumbelTopK]]). Inverse-CDF
    * over EXACT integer cumulative weights: doc i owns the interval
    * [g_i, g_i + w_i) of [0, W); draw j lands at u_j = md5₆₀("draw:j")
    * mod W. Every quantity is int64 — no float anywhere — so the
    * assignment is bit-deterministic across engines, re-runs and
    * partitionings (and the q123 oracle replays it exactly).
    *
    * Scale shape: one range-partitioned prefix sum
    * ([[ScaleOps.prefixSumByRange]] — never a single-task window),
    * one exact total (one long to the driver), and the draw frame —
    * `draws` rows — broadcast into an interval-containment join
    * (BroadcastNestedLoopJoin: each corpus row evaluates `draws`
    * comparisons; fine to ~10⁴ draws. Beyond that, route each draw to
    * its range partition by binary-searching the collected partition
    * offsets and equi-join on the partition id — same frame, no new
    * machinery). Zero-weight docs own an empty interval and are never
    * drawn; weights must be non-negative (checked).
    *
    * Output: (draw, idCol, u) — one row per draw, `draw` = 0-based
    * draw index.
    */
  def multinomialSample(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      draws: Int): DataFrame = {
    require(draws > 0, "draws must be positive")
    val keyed = docs.filter(col(idCol).isNotNull)
      .select(col(idCol), col(weightCol).cast("long").as("__w"))
    val neg = keyed.filter(col("__w") < 0).limit(1).count()
    require(neg == 0, s"$weightCol must be non-negative")
    val prefixed = ScaleOps.prefixSumByRange(keyed, Seq(idCol), col("__w"), "__g")
    val totRow = keyed.agg(sum(col("__w"))).collect()(0)
    require(!totRow.isNullAt(0) && totRow.getLong(0) > 0,
      "multinomialSample needs positive total weight")
    val total = totRow.getLong(0)
    val spark = docs.sparkSession
    val drawFrame = spark.range(draws.toLong)
      .select(col("id").as("draw"),
        (graft.functions.PortableHash.md5Long60(
          concat(lit("draw:"), col("id").cast("string"))) % lit(total))
          .as("u"))
    prefixed.join(broadcast(drawFrame),
        col("u") >= col("__g") && col("u") < col("__g") + col("__w"))
      .select(col("draw"), col(idCol), col("u"))
  }

  /** Dispersion-allocated stratified sampling (the Neyman-allocation
    * shape — Neyman 1934 allocates ∝ N_h·σ_h; this ships the
    * VARIANCE-proportional variant, weight V_h = n_h·Σx² − (Σx)²,
    * because V_h is an EXACT INTEGER for integer-valued columns, so
    * the quota arithmetic `greatest(1, budget·V_h div ΣV)` is
    * bit-deterministic cross-engine — the classic √V weight would put
    * a float sum in the denominator and an engine-order ulp could
    * flip a floor). Strata with more internal spread get more of the
    * budget; within a stratum the kept rows are the md5-ranked prefix
    * (deterministic uniform order, q96 discipline).
    *
    * Scale shape: one combinable stats aggregate (strata-sized
    * output), one integer total, one per-stratum window whose
    * rank≤quota filter compiles to WindowGroupLimit. Integer overflow
    * bound: n·Σx² must fit int64 — at ~10¹¹ rows of ~10³-sized values
    * move the stats to DECIMAL(38).
    *
    * Output: (groupCol, quota, rk, idCol) — the kept rows. All-zero
    * total variance splits the budget evenly across strata.
    */
  def dispersionAllocatedSample(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      valueCol: String,
      budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val st = docs.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("long")).as("sx"),
        sum(col(valueCol).cast("long") * col(valueCol).cast("long"))
          .as("sxx"))
      .select(col("g"), (col("n") * col("sxx") - col("sx") * col("sx"))
        .as("v"))
    val tot = st.agg(sum(col("v")).as("vw"), count(lit(1)).as("ng"))
    val quotas = st.crossJoin(tot)
      .select(col("g"),
        greatest(lit(1L),
          when(col("vw") > 0, expr(s"($budget * v) div vw"))
            .otherwise(expr(s"$budget div ng"))).as("quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("__r"), col(idCol))
    docs
      .withColumn("__r", graft.functions.PortableHash.md5Long60(
        col(idCol).cast("string")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(quotas.withColumnRenamed("g", groupCol), Seq(groupCol))
      .filter(col("rk") <= col("quota"))
      .select(col(groupCol), col("quota"), col("rk"), col(idCol))
  }

  /** Cluster-balanced diversity sampling over an embedding column:
    * assign every vector to its nearest of `numCells` centroid cells
    * (the q46/q163 smallest-id centroid convention — swap in
    * [[Similarity.trainIvfCentroids]] for trained cells) and keep an
    * EQUAL quota of `ceil(budget / numCells)` per cell, ranked by the
    * portable md5 of the id — the deterministic stand-in for uniform
    * within-cell sampling. This is the curation move that keeps the
    * selected set spread across the embedding space where a global
    * uniform sample reproduces the corpus's cluster skew (the
    * cluster-balanced selection step of prototypicality-based
    * curation, SemDeDup/DataComp lineage).
    *
    * Scale shape: assignment is ROW-LOCAL (the
    * [[graft.plans.NearestCellExpr]] codegen argmin against literal
    * centroids — no join); the only exchange is the per-cell window,
    * and the rank≤quota filter compiles to WindowGroupLimit, so each
    * cell contributes at most `quota` rows to the final gather
    * (plan-asserted). Output: (cell, rk, id) — cells smaller than the
    * quota contribute all their members.
    */
  def cellBalancedSample(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int,
      budget: Int): DataFrame = {
    require(numCells >= 1, s"numCells must be >= 1, got $numCells")
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = corpus.sparkSession
    val quota = (budget + numCells - 1) / numCells
    val cents = Similarity.smallestIdCentroids(corpus, idCol, vecCol, numCells)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
      .orderBy(col("__r"), col(idCol))
    corpus
      .select(col(idCol),
        Similarity.cellAssign(spark, cents, col(vecCol)).as("cell"))
      .withColumn("__r", graft.functions.PortableHash.md5Long60(
        col(idCol).cast("string")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= quota)
      .select(col("cell"), col("rk"), col(idCol))
  }

  /** Token-budget WATER-FILLING across sources — the max-min-fair
    * data-mixing allocation (the classic water-filling level of
    * Bertsekas & Gallager 1992, applied to corpus mixing): find the
    * unique integer level L with Σᵢ min(nᵢ, L) ≤ budget <
    * Σᵢ min(nᵢ, L+1) and allocate allocᵢ = min(nᵢ, L) — small
    * sources keep everything, large sources are capped at one common
    * level, the fairest cap under a hard token budget (contrast
    * [[temperatureMix]], which RESHAPES the distribution; water-fill
    * CAPS it). budget ≥ Σ nᵢ reads a NULL level and full funding.
    *
    * Determinism/exactness: pure int64 end to end — per-source sums,
    * a strictly-before prefix over the (n, source) total order, and
    * the level solve by integer division: the FIRST rank r where
    * (budget − prefix_{r−1}) div (k − r + 1) < n_r names the level
    * (before r every source is fully funded by the invariant
    * level ≥ n_{r−1}). No floats anywhere; any engine replays it.
    *
    * Scale shape: ONE map-side-combinable corpus aggregate to the
    * source-sized count frame; the prefix/level solve runs on that
    * k-row frame under a single-task window — the catalog-sized
    * bounded-frame carve-out (sources are a catalog, not a corpus);
    * the 1-row level broadcast-joins back. The corpus itself is
    * never re-shuffled.
    *
    * Output: (sourceCol, n_tokens, level — NULL when fully funded,
    * alloc, funded = alloc == n_tokens); callers order.
    */
  def waterFill(
      docs: DataFrame,
      sourceCol: String,
      weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    import org.apache.spark.sql.expressions.Window
    // coalesce: a source whose weights are ALL NULL sums to NULL, and
    // least() skips nulls downstream — it would read the level as its
    // alloc (tokens granted to an empty source) with funded = NULL.
    // An all-null source holds 0 tokens: alloc 0, funded true.
    val g = docs.groupBy(col(sourceCol))
      .agg(coalesce(sum(col(weightCol).cast("long")), lit(0L))
        .as("n_tokens"))
    val ord = Window.orderBy(col("n_tokens"), col(sourceCol))
    val ranked = g
      .withColumn("__r", row_number().over(ord).cast("long"))
      .withColumn("__pb", coalesce(sum(col("n_tokens"))
        .over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__k", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).cast("long"))
    val lvl = expr(s"($budget - __pb) div (__k - __r + 1)")
    val cand = ranked.withColumn("__lvl", lvl)
    val pick = cand
      .agg(min(when(col("__lvl") < col("n_tokens"),
        struct(col("__r"), col("__lvl").as("level")))).as("__m"))
      .select(col("__m.level").as("level"))
    cand.crossJoin(broadcast(pick))
      .select(col(sourceCol), col("n_tokens"), col("level"),
        when(col("level").isNull, col("n_tokens"))
          .otherwise(least(col("n_tokens"), col("level"))).as("alloc"),
        (when(col("level").isNull, col("n_tokens"))
          .otherwise(least(col("n_tokens"), col("level"))) ===
          col("n_tokens")).as("funded"))
  }
}
