package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextFns}

/** Fixed-memory frequency sketching (Cormode & Muthukrishnan's
  * Count-Min, 2005) over the token stream — the 100 TB alternative to
  * an exact token `groupBy`: the exact count shuffles every distinct
  * token through an exchange (vocabulary-sized state), while the
  * sketch is a `lanes × width` counter TABLE whose shuffle volume is
  * `tasks × lanes × width` REGARDLESS of corpus or vocabulary size —
  * map-side combine collapses each task's contribution to at most one
  * row per counter before anything moves.
  *
  * Relational formulation, no UDAF: a token occurrence contributes
  * one row per lane keyed (lane, bucket = (aᵢ·h + bᵢ) mod P mod
  * width) with h the oracle-portable md5-derived 60-bit hash
  * ([[PortableHash]] — the q97 Bloom filter's lane family, same
  * coefficients discipline: generated on the driver, shipped as
  * literals into both the plan and the oracle SQL).
  *
  * Estimates carry the standard one-sided guarantee: est(t) ≥
  * count(t) always (collisions only ADD), and with width w the
  * overestimate exceeds ε·N with probability ≤ (1/w·ε)^lanes — so a
  * heavy-hitter report (`est ≥ minCount`) has NO false negatives
  * (spec-asserted against exact counts).
  */
object Sketches {

  /** The Count-Min counter table: (lane, bucket, c) — lanes × width
    * rows at most, regardless of input size.
    */
  def countMinTable(
      docs: DataFrame,
      textCol: String,
      lanes: Int,
      width: Int): DataFrame =
    countMinFromTokens(
      docs.select(explode(TextFns.tokens(col(textCol))).as("__t")),
      lanes, width)

  /** [[countMinTable]] over an already-token-grain frame (column
    * `__t`) — the seam the streaming twin
    * ([[graft.streaming.StreamingHeavyHitters]]) shares: a streaming
    * aggregation over this exact projection keeps the same
    * lanes × width state.
    */
  def countMinFromTokens(
      toks: DataFrame,
      lanes: Int,
      width: Int): DataFrame = {
    require(lanes > 0 && width > 0, "count-min needs positive lanes and width")
    val (a, b) = PortableHash.laneCoeffs(lanes)
    val p = PortableHash.P
    toks
      .select((PortableHash.md5Long60(col("__t")) % lit(p)).as("__h"))
      .select(posexplode(array((0 until lanes).map(i =>
        (((lit(a(i)) * col("__h") + lit(b(i))) % lit(p)) % lit(width.toLong))
          .cast("long")): _*)).as(Seq("lane", "bucket")))
      .groupBy(col("lane"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Heavy hitters by sketch estimate: every candidate token (the
    * corpus's distinct tokens) whose Count-Min estimate
    * `min over lanes of c(lane, bucket(t))` reaches `minCount`.
    * Output: (token, est), est ≥ the token's exact count. The sketch
    * side broadcasts (lanes × width rows by construction); the
    * candidate side is one distinct over tokens — the only
    * vocabulary-sized term, and the one any candidate-set source
    * (e.g. yesterday's report) can replace.
    */
  def heavyHitters(
      docs: DataFrame,
      textCol: String,
      lanes: Int,
      width: Int,
      minCount: Long): DataFrame =
    heavyHittersFrom(
      countMinTable(docs, textCol, lanes, width),
      docs.select(explode(TextFns.tokens(col(textCol))).as("token"))
        .distinct(),
      lanes, width, minCount)

  /** [[heavyHitters]]' readout half: estimate every candidate token
    * against an existing counter table — the seam that lets ANY
    * candidate source (yesterday's report, a streaming vocabulary
    * aggregate) probe ANY sketch snapshot (a streaming counter
    * state). `cm` must carry (lane, bucket, c) built with the same
    * lanes/width; `candidates` a `token` column.
    */
  def heavyHittersFrom(
      cm: DataFrame,
      candidates: DataFrame,
      lanes: Int,
      width: Int,
      minCount: Long): DataFrame = {
    require(minCount >= 1, "minCount must be positive")
    val (a, b) = PortableHash.laneCoeffs(lanes)
    val p = PortableHash.P
    val cand = candidates
      .select(col("token"),
        (PortableHash.md5Long60(col("token")) % lit(p)).as("__h"))
    val candLanes = cand.select(col("token"),
      posexplode(array((0 until lanes).map(i =>
        (((lit(a(i)) * col("__h") + lit(b(i))) % lit(p)) % lit(width.toLong))
          .cast("long")): _*)).as(Seq("lane", "bucket")))
    // a candidate's buckets each hold at least its own occurrences, so
    // the join is total over candidates (inner join loses nothing)
    candLanes.join(broadcast(cm), Seq("lane", "bucket"))
      .groupBy(col("token"))
      .agg(min(col("c")).as("est"))
      .filter(col("est") >= minCount)
  }

  /** Oracle-portable HyperLogLog distinct estimate (q114, Flajolet et
    * al. 2007) over the document n-gram stream — the third member of
    * the exact-replay sketch family next to the q97 Bloom filter and
    * q103 Count-Min: state is m registers however large the corpus,
    * and REPEATS NEVER TOUCH THE ANSWER (register max is idempotent),
    * so no distinct precedes the sketch.
    *
    * Portability: bucket/rank come from md5 bit arithmetic
    * (`h & (m-1)`, trailing-zero rank of `h >> log2(m)` via the
    * `bit_count((rest & -rest) - 1)` isolate-lowest-bit trick), and
    * the harmonic sum Σ 2^(-reg) is computed EXACTLY as the integer
    * Σ 2^(maxReg - reg) — dyadic sums in double round depending on
    * ADD ORDER, which neither engine guarantees; the scaled-integer
    * sum cannot (register ranks cap at maxReg=50, so the sum stays
    * under 2^58 for m ≤ 256). The raw estimator applies as-is: the
    * small-range (LinearCounting, ln) branch is deliberately out of
    * scope and documented — callers with n ≲ 2.5m want an exact
    * count anyway.
    *
    * Output row: n_buckets (touched registers), est (2-dp), exact
    * (the true distinct count, carried for accuracy evidence — the
    * one vocabulary-sized term, and precisely what the sketch
    * replaces at scale).
    */
  def hllDistinct(
      docs: DataFrame,
      textCol: String,
      shingleN: Int,
      m: Int): DataFrame = {
    val sh = docs.select(
      explode(TextFns.textShingles(col(textCol), shingleN)).as("s"))
    val exact = sh.agg(countDistinct(col("s")).as("exact"))
    hllEstimate(hllRegisters(sh, "s", m), m).crossJoin(exact)
  }

  /** The HLL register table of an item column: (bucket, reg), at most
    * m rows. MERGEABLE by construction: the union of two register
    * tables re-aggregated with `max` is exactly the whole-input table
    * (max is associative/commutative/idempotent) — the property that
    * lets 10k partitions sketch independently and merge in one
    * m-sized reduce (spec-asserted).
    */
  def hllRegisters(items: DataFrame, itemCol: String, m: Int): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0 && m <= 256,
      s"m must be a power of two in [16, 256], got $m")
    val logM = java.lang.Integer.numberOfTrailingZeros(m)
    items
      .select(PortableHash.md5Long60(col(itemCol)).as("h"))
      .select((col("h").bitwiseAND(lit((m - 1).toLong))).as("bucket"),
        shiftrightunsigned(col("h"), logM).as("rest"))
      .select(col("bucket"),
        least(
          when(col("rest") === 0, lit(MaxReg + 3))
            .otherwise(bit_count(
              (col("rest").bitwiseAND(lit(0L) - col("rest"))) - lit(1L))
              + lit(1)),
          lit(MaxReg)).as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("reg"))
  }

  /** The raw-HLL estimate row (n_buckets, est) from a register table
    * — the exact scaled-integer harmonic sum described on
    * [[hllDistinct]].
    */
  def hllEstimate(regs: DataFrame, m: Int): DataFrame = {
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val scale = lit((1L << MaxReg).toDouble)
    regs.agg(
      sum(expr(s"shiftleft(cast(1 as bigint), cast($MaxReg - reg as int))"))
        .as("sp"),
      count(lit(1)).as("np"))
      .select(col("np").as("n_buckets"),
        (floor(alpha * lit((m.toDouble * m)) /
          ((col("sp") + (lit(m.toLong) - col("np")) * lit(1L << MaxReg))
            .cast("double") / scale) * lit(100.0) + lit(0.5)) / lit(100.0))
          .as("est"))
  }

  /** Register-rank cap: keeps the scaled-integer harmonic sum under
    * 2^58 for m ≤ 256 (the oracle replays the same cap).
    */
  val MaxReg = 50

  /** Fixed-bin histogram quantile estimates (q113): the bounded-state
    * alternative to q89's exact global-rank quantile — state is
    * exactly `bins` counters however large the input, the shape
    * behind `approx_percentile`-class estimators when the oracle must
    * replay every bit. Equal-width bins over the exact min/max (one
    * aggregate, two doubles to the driver); the estimate for
    * probability q is the RIGHT EDGE of the first bin whose
    * cumulative count reaches `ceil(q*N)` — within one bin width of
    * the exact quantile by construction.
    *
    * Scale shape: one map-side-combined aggregate to `bins` rows;
    * the cumulative walk is a window over the bin table (state =
    * `bins` rows by construction, never the data); the probe joins a
    * literal probability frame. All arithmetic is fixed-order IEEE
    * double, replayed verbatim by the DuckDB oracle.
    */
  def histogramQuantiles(
      df: DataFrame,
      valueCol: String,
      bins: Int,
      probs: Seq[Double]): DataFrame =
    // ONE copy of the IEEE-sensitive bin/threshold/est formulas: the
    // global form is the grouped form under a constant key (review
    // finding — two drifting copies of oracle-replayed arithmetic).
    // This also removes the old driver-side bounds collect; nulls are
    // ignored and an empty/all-null input yields an empty frame.
    groupedHistogramQuantiles(
      df.withColumn("__g", lit(0)), "__g", valueCol, bins, probs)
      .drop("__g")

  /** Per-GROUP fixed-bin histogram quantiles — [[histogramQuantiles]]
    * generalized to grouped form (per-source latency percentiles, the
    * dashboard staple), fully distributed: per-group bounds are a
    * group-space-sized aggregate broadcast back into the binning scan
    * (no driver collect, unlike the global form's two-row probe), the
    * cumulative pass windows WITHIN a group (≤ bins rows each), and
    * the quantile probe is a bins×probs-sized join. State per group
    * is `bins` counters — the q113 bounded-sketch contract, per key.
    *
    * Degenerate groups (hi == lo) collapse to bin 0 with est = lo,
    * guarded identically in the oracle.
    */
  def groupedHistogramQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      bins: Int,
      probs: Seq[Double]): DataFrame = {
    require(bins > 1, s"bins must be > 1, got $bins")
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      "probabilities must lie in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val v = col(valueCol).cast("double")
    // NULL values are ignored (and excluded from n): Spark's window
    // sorts a null bin FIRST while DuckDB sorts it LAST, so letting
    // nulls into the bin table would silently shift every cumulative
    // count between engine and oracle
    val df0 = df.where(col(valueCol).isNotNull)
    val mm = df0.groupBy(col(groupCol))
      .agg(min(v).as("__lo"), max(v).as("__hi"), count(lit(1)).as("__n"))
    val width = (col("__hi") - col("__lo")) / lit(bins.toDouble)
    val binned = df0.join(broadcast(mm), Seq(groupCol))
      .select(col(groupCol), col("__lo"), col("__hi"), col("__n"),
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(floor((v - col("__lo")) / width).cast("long"),
            lit((bins - 1).toLong))).as("bin"))
    val counts = binned
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("c")).over(w))
    import spark.implicits._
    val probe = probs.toDF("q")
    cum.join(broadcast(mm), Seq(groupCol))
      .crossJoin(broadcast(probe))
      .filter(col("cum") >=
        ceil(col("q") * col("__n").cast("double")).cast("long"))
      .groupBy(col(groupCol), col("q"))
      .agg(min(col("bin")).as("bin"),
        first(col("__lo")).as("__lo"), first(col("__hi")).as("__hi"))
      .select(col(groupCol), col("q"), col("bin"),
        (floor((col("__lo") + (col("bin") + lit(1L)).cast("double") *
          ((col("__hi") - col("__lo")) / lit(bins.toDouble))) * lit(1e6) +
          lit(0.5)) / lit(1e6)).as("est"))
  }

  /** Count-Min counter table over an arbitrary KEY column (the
    * [[countMinTable]] token form generalized): keys are stringified
    * before the portable md5 hash so the oracle replays the exact
    * bits. (lane, bucket, c) — lanes × width rows at most.
    */
  def countMinKeyed(
      df: DataFrame,
      keyCol: String,
      lanes: Int,
      width: Int): DataFrame = {
    require(lanes > 0 && width > 0, "count-min needs positive lanes and width")
    val (a, b) = PortableHash.laneCoeffs(lanes)
    val p = PortableHash.P
    df
      .select((PortableHash.md5Long60(col(keyCol).cast("string")) % lit(p))
        .as("__h"))
      .select(posexplode(array((0 until lanes).map(i =>
        (((lit(a(i)) * col("__h") + lit(b(i))) % lit(p)) % lit(width.toLong))
          .cast("long")): _*)).as(Seq("lane", "bucket")))
      .groupBy(col("lane"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Equi-join cardinality estimation by Count-Min inner product
    * (Cormode & Muthukrishnan 2005 §4.2): for sketches of the two key
    * multisets with the SAME lane family,
    *
    *   est = min over lanes of  Σ_buckets cA(lane, w) · cB(lane, w)
    *
    * which is ≥ |A ⋈ B| always (collisions only add — the one-sided
    * guarantee, spec-asserted), and tight when hot keys dominate.
    * This is the join-size planning primitive: at 100 TB the inputs
    * never move — each side folds to a lanes × width counter frame
    * under map-side combine, and the estimate is a (lanes × width)-
    * sized equi-join, so deciding broadcast-vs-shuffle-vs-salt costs
    * two scans and no exchange of data rows.
    *
    * Output: ONE row (exact, est, ratio6) — `exact` = Σ_k cA(k)·cB(k)
    * computed the efficient exact way (two count aggregates joined on
    * the key space, never a row-level join), carried as the accuracy
    * witness the oracle checks both sides of.
    */
  def joinCardinality(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String,
      lanes: Int,
      width: Int): DataFrame = {
    val cmA = countMinKeyed(left, leftKey, lanes, width)
    val cmB = countMinKeyed(right, rightKey, lanes, width)
    val est = cmA.as("a")
      .join(cmB.as("b"), Seq("lane", "bucket"))
      .groupBy(col("lane"))
      .agg(sum(col("a.c") * col("b.c")).as("ip"))
      .agg(min(col("ip")).as("est"))
    val exact = left.groupBy(col(leftKey).cast("string").as("__k"))
      .agg(count(lit(1)).as("ca"))
      .join(right.groupBy(col(rightKey).cast("string").as("__k"))
        .agg(count(lit(1)).as("cb")), Seq("__k"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact"))
    exact.crossJoin(est)
      .select(col("exact"), col("est"),
        when(col("exact") === 0, lit(null).cast("double"))
          .otherwise(floor(col("est").cast("double") / col("exact") *
            lit(1e6) + lit(0.5)) / lit(1e6)).as("ratio6"))
  }

  /** Distinct md5-hash frame of an item column — the value space every
    * KMV ([[kmvSketch]]) computation runs over. One map-side-combined
    * distinct; at 100 TB this is the only pass that sees the data.
    */
  def kmvHashes(items: DataFrame, itemCol: String): DataFrame =
    items.select(PortableHash.md5Long60(col(itemCol)).as("h")).distinct()

  /** Bottom-k ("k minimum values", Bar-Yossef et al. 2002 / the theta
    * sketch of Dasgupta et al. 2016) distinct sketch: the k SMALLEST
    * distinct md5 hash values of the item column. The member of the
    * cardinality-sketch family that supports SET OPERATIONS — HLL
    * (q114) unions but cannot intersect; a KMV pair estimates
    * `|A ∪ B|`, `|A ∩ B|` and Jaccard ([[kmvSetOps]]) because the
    * bottom-k of a union is computable from the two bottom-k's alone:
    *
    *   bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B))
    *
    * (a union member below the merged threshold is below both sides'
    * thresholds, so it is IN one of the sketches — spec-asserted
    * against a partition-split corpus).
    *
    * Scale shape: `distinct → orderBy(h) → limit(k)` plans as a
    * map-side-combined aggregate feeding TakeOrderedAndProject —
    * per-partition bottom-k then one k-sized merge, never a global
    * sort (plan-asserted). State is k longs regardless of input size.
    */
  def kmvSketch(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    kmvHashes(items, itemCol).orderBy(col("h")).limit(k)
  }

  /** KMV set-operation cardinalities of two item sets: ONE row
    *
    *   (k, n_merged, exact_union, exact_inter,
    *    union_est, inter_est, jaccard_est)
    *
    * Estimators (all deterministic integer/double arithmetic the
    * oracle replays verbatim):
    *   - `union_est = (k-1) · 2^60 / τ` with τ the k-th smallest
    *     merged hash (hashes ~ uniform on [0, 2^60)); when the merged
    *     sketch holds fewer than k values both sets fit entirely and
    *     the count is EXACT;
    *   - `jaccard_est = |merged ∩ sketchA ∩ sketchB| / n_merged` —
    *     membership in the k-sketch equals membership in the full set
    *     for every merged member (τ_merged ≤ both side thresholds),
    *     so this is the classic bottom-k Jaccard estimator;
    *   - `inter_est = jaccard_est · union_est` (inclusion via the
    *     union estimate, the theta-sketch intersection recipe).
    *
    * Exact counts ride along as the accuracy witness (q114/q141
    * discipline). Error is O(1/√k): k=512 gives ~4.4% standard error
    * on the union — 4 KB of state however large the corpus.
    */
  def kmvSetOps(
      a: DataFrame,
      b: DataFrame,
      itemCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val ha = kmvHashes(a, itemCol)
    val hb = kmvHashes(b, itemCol)
    val sa = ha.orderBy(col("h")).limit(k)
    val sb = hb.orderBy(col("h")).limit(k)
    val merged = sa.union(sb).distinct().orderBy(col("h")).limit(k)
    val ms = merged.agg(count(lit(1)).as("n_merged"), max(col("h")).as("tau"))
    val nBoth = merged
      .join(sa, Seq("h"), "left_semi")
      .join(sb, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    val exactU = ha.union(hb).distinct().agg(count(lit(1)).as("exact_union"))
    val exactI = ha.join(hb, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("exact_inter"))
    val uRaw = when(col("n_merged") < k, col("n_merged").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(1.152921504606846976e18) /
        col("tau").cast("double"))
    val jRaw = when(col("n_merged") === 0, lit(0.0))
      .otherwise(col("n_both").cast("double") / col("n_merged").cast("double"))
    ms.crossJoin(nBoth).crossJoin(exactU).crossJoin(exactI)
      .select(lit(k).as("k"), col("n_merged"),
        col("exact_union"), col("exact_inter"),
        (floor(uRaw * lit(1e2) + lit(0.5)) / lit(1e2)).as("union_est"),
        (floor(jRaw * uRaw * lit(1e2) + lit(0.5)) / lit(1e2)).as("inter_est"),
        (floor(jRaw * lit(1e6) + lit(0.5)) / lit(1e6)).as("jaccard_est"))
  }

  /** Per-group KMV sketch: the k smallest distinct hashes of each
    * group's item set — (g, h), at most k rows per group (the rank
    * filter compiles to WindowGroupLimit, so no group ever shuffles
    * more than its bottom-k out of the partial aggregate).
    */
  /** Bottom-k per group over a prehashed distinct (g, h) frame — the
    * shared core of [[kmvGroupedSketch]] and [[kmvOverlapMatrix]].
    */
  private def bottomKPerGroup(hx: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("h"))
    hx.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("g"), col("h"))
  }

  def kmvGroupedSketch(
      items: DataFrame,
      groupCol: String,
      itemCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    bottomKPerGroup(
      items.select(col(groupCol).as("g"),
        PortableHash.md5Long60(col(itemCol)).as("h")).distinct(), k)
  }

  /** ALL-PAIRS set-overlap matrix from ONE sketch per group — the
    * reason bottom-k beats exact counting at scale: S sources yield
    * S·k sketch rows, and every one of the S·(S−1)/2 pairwise
    * union/intersection/Jaccard estimates is computed from those
    * k-sized frames alone ([[kmvSetOps]]' estimators per pair) —
    * never S² passes over the data. Exact counts ride along as the
    * accuracy witness (one hash self-join answers every pair at
    * once).
    *
    * Output per (ga < gb) pair: (ga, gb, n_merged, exact_union,
    * exact_inter, union_est, inter_est, jaccard_est). Pairs with no
    * shared sketch hash read 0 estimates (not null — the empty
    * intersection is a measurement).
    */
  def kmvOverlapMatrix(
      items: DataFrame,
      groupCol: String,
      itemCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val hx = items.select(col(groupCol).as("g"),
        PortableHash.md5Long60(col(itemCol)).as("h"))
      .distinct()
    val sk = bottomKPerGroup(hx, k)
    val groups = sk.select(col("g")).distinct()
    val gp = groups.select(col("g").as("ga"))
      .crossJoin(groups.select(col("g").as("gb")))
      .filter(col("ga") < col("gb"))
    val uni = gp.join(sk.select(col("g").as("ga"), col("h")), Seq("ga"))
      .select(col("ga"), col("gb"), col("h"))
      .union(gp.join(sk.select(col("g").as("gb"), col("h")), Seq("gb"))
        .select(col("ga"), col("gb"), col("h")))
      .distinct()
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val merged = uni.withColumn("__rk", row_number().over(wp))
      .filter(col("__rk") <= k)
      .select(col("ga"), col("gb"), col("h"))
    val ms = merged.groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_merged"), max(col("h")).as("tau"))
    val nBoth = merged
      .join(sk.select(col("g").as("ga"), col("h")), Seq("ga", "h"), "left_semi")
      .join(sk.select(col("g").as("gb"), col("h")), Seq("gb", "h"), "left_semi")
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_both"))
    val sz = hx.groupBy(col("g")).agg(count(lit(1)).as("sz"))
    val exInter = hx.select(col("g").as("ga"), col("h"))
      .join(hx.select(col("g").as("gb"), col("h")), Seq("h"))
      .filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("exact_inter"))
    val uRaw = when(col("n_merged") < k, col("n_merged").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(1.152921504606846976e18) /
        col("tau").cast("double"))
    val jRaw = coalesce(col("n_both"), lit(0L)).cast("double") /
      col("n_merged").cast("double")
    ms.join(nBoth, Seq("ga", "gb"), "left")
      .join(sz.select(col("g").as("ga"), col("sz").as("__sza")), Seq("ga"))
      .join(sz.select(col("g").as("gb"), col("sz").as("__szb")), Seq("gb"))
      .join(exInter, Seq("ga", "gb"), "left")
      .select(col("ga"), col("gb"), col("n_merged"),
        (col("__sza") + col("__szb") - coalesce(col("exact_inter"), lit(0L)))
          .as("exact_union"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
        (floor(uRaw * lit(1e2) + lit(0.5)) / lit(1e2)).as("union_est"),
        (floor(jRaw * uRaw * lit(1e2) + lit(0.5)) / lit(1e2)).as("inter_est"),
        (floor(jRaw * lit(1e6) + lit(0.5)) / lit(1e6)).as("jaccard_est"))
  }
}
