package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deduplication operators for the LLM-data-pipeline surface
  * (SURVEY §2B R-18/R-19 + north star): exact, n-gram Jaccard,
  * MinHash-LSH, SimHash. All deterministic — survivors and pair sets
  * are pinned by explicit tie-break rules, never "whichever row came
  * first in the shuffle".
  */
object Dedup {

  /** Exact dedup on a key subset: keeps the row with the smallest
    * `tieBreak` per key (the deterministic version of dropDuplicates;
    * same rule as the reference's cursor/position set, SURVEY §2A A19).
    * One shuffle on `keys`; at 100 TB prefer this over
    * `dropDuplicates` precisely because re-runs produce identical
    * survivors.
    *
    * Determinism when `tieBreak` is not unique within a key group: the
    * sort order is suffixed with every remaining ORDERABLE column, so
    * ties are broken deterministically whenever the tied rows differ
    * on any orderable column. Residual caveat: rows identical on every
    * orderable column but differing in a non-orderable one (e.g. a
    * map) still have an arbitrary survivor — Spark cannot sort on
    * those types; pass a unique tieBreak if such payloads must be
    * pinned.
    */
  def exact(df: DataFrame, keys: Seq[String], tieBreak: String): DataFrame = {
    val suffix = df.schema.fields
      .filter(f => f.name != tieBreak && !keys.contains(f.name) &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
      .map(f => col(f.name))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tieBreak) +: suffix.toSeq: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Chunk-granularity exact dedup with document reassembly (q108) —
    * the RefinedWeb line-dedup pass adapted to a corpus without line
    * structure: split each document into disjoint `chunkWords`-token
    * windows, keep every chunk ONLY at its first occurrence corpus-
    * wide (smallest (doc, position)), and re-assemble what survives in
    * position order. Output per input document: `text_dedup` (possibly
    * empty), `n_kept`, `n_dropped` — so boilerplate shared across
    * documents is stripped while each document keeps its own prose.
    *
    * Scale shape: chunking is row-local (one explode over a sequence,
    * no self-join); the keep-first decision is one window keyed on
    * the chunk value (cardinality ~ corpus chunks — the partition is
    * the dedup key, never a global sort); reassembly is a doc-keyed
    * aggregate whose `sort_array(collect_list)` is bounded by a
    * single document's chunk count. Three shuffles total, each on a
    * key that grows with the data, none driver-side.
    */
  def chunkDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkWords: Int): DataFrame = {
    val chunks = chunkFrame(docs, idCol, textCol, chunkWords)
    reassembleChunks(docs.select(col(idCol)), idCol,
      chunks, chunkWinners(chunks))
  }

  /** Shared reassembly step for [[chunkDedup]] and the incremental
    * index ([[IncrementalChunkDedup]]): per-document position-ordered
    * re-concatenation of the `kept` chunk occurrences, made TOTAL over
    * `ids` (documents with nothing kept emit "" / 0 / n_dropped). ONE
    * copy of the reassembly semantics — the batch operator and the
    * index must never diverge, because q116's oracle gate asserts
    * their equivalence.
    */
  private[operators] def reassembleChunks(
      ids: DataFrame,
      idCol: String,
      chunks: DataFrame,
      kept: DataFrame): DataFrame = {
    val keptAgg = kept.groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ",
          transform(sort_array(collect_list(struct(col("pos"), col("chunk")))),
            s => s.getField("chunk"))).as("text_dedup"))
    val totals = chunks.groupBy(col("__doc"))
      .agg(count(lit(1)).as("__n_chunks"))
    ids
      .join(totals, col(idCol) === totals("__doc"), "left").drop("__doc")
      .join(keptAgg, col(idCol) === keptAgg("__doc"), "left").drop("__doc")
      .select(col(idCol),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("__n_chunks"), lit(0L)) -
          coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** The (doc, position, chunk) frame [[chunkDedup]] mines: disjoint
    * `chunkWords`-token windows, row-local (one explode, no
    * self-join). Pure projection — applies unchanged to a STREAMING
    * frame, which is how the streaming chunk-dedup twin feeds
    * `dropDuplicates("chunk")` (StreamingSemanticsSpec).
    */
  def chunkFrame(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkWords: Int): DataFrame = {
    require(chunkWords > 0, s"chunkWords must be positive, got $chunkWords")
    docs.select(col(idCol).as("__doc"), TextFns.tokens(col(textCol)).as("__l"))
      // Spark's sequence(0, -1) counts DOWN — the n==0 guard is load-bearing
      .withColumn("__n",
        ceil(size(col("__l")).cast("double") / lit(chunkWords.toDouble))
          .cast("int"))
      .withColumn("pos",
        explode(when(col("__n") > 0, sequence(lit(0), col("__n") - 1))
          .otherwise(array().cast("array<int>"))))
      .withColumn("chunk",
        concat_ws(" ",
          slice(col("__l"), col("pos") * chunkWords + 1, lit(chunkWords))))
      .select(col("__doc"), col("pos"), col("chunk"))
  }

  /** Keep-first selection over a [[chunkFrame]]: one row per distinct
    * chunk value — the occurrence with the smallest (doc, position).
    * One window keyed on the chunk value; the batch semantics the
    * streaming `dropDuplicates("chunk")` state must reproduce under
    * an id-ordered feed.
    */
  def chunkWinners(chunks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("chunk")).orderBy(col("__doc"), col("pos"))
    chunks.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Quality-aware survivor selection over near-dup clusters: among
    * each cluster's members keep the row maximizing `scoreCol`, ties
    * broken by smallest `idCol` — the final step of a training-data
    * dedup stage (drop every near-duplicate EXCEPT the best copy,
    * rather than [[clusters]]' min-id convention).
    *
    * `labeled` is a frame carrying (idCol, cluster, scoreCol) — e.g.
    * [[clusters]] output joined with a quality score. The argmax is
    * ONE partial-aggregated hash aggregate (`min(struct(-score, id))`
    * — struct ordering encodes the tie-break), NOT a per-cluster
    * window: no per-partition sort of the corpus, and the join back
    * reuses the cluster hash partitioning. Adds a `keep` boolean;
    * every input row is preserved so drops stay diagnosable.
    *
    * Null handling (the operator is public, so `labeled` need not come
    * from [[clusters]], which emits neither): a NULL score loses to
    * every non-null score (the struct leads with an isNull flag —
    * without it a null `-score` would sort FIRST under min's ascending
    * struct order and the worst row would win); a NULL cluster is its
    * own group and survives the join null-safely, so those rows are
    * preserved too, not silently dropped by inner-join semantics.
    */
  def clusterSurvivors(labeled: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    val best = labeled.groupBy(col("cluster"))
      .agg(min(struct(col(scoreCol).isNull.as("nul"),
        (-col(scoreCol)).as("ns"), col(idCol).as("id")))
        .as("__b"))
      .select(col("cluster").as("__c"), col("__b.id").as("__survivor"))
    labeled.join(best, col("cluster") <=> col("__c"))
      .withColumn("keep", coalesce(col(idCol) === col("__survivor"), lit(false)))
      .drop("__c", "__survivor")
  }

  /** All-pairs n-gram (word shingle) Jaccard over a document table,
    * blocked by `blockCol` (pairs are only formed inside a block —
    * e.g. language — which is what bounds the shuffle at scale).
    * Returns (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard >= threshold.
    *
    * Plan shape: explode shingles → distinct → self-equi-join on
    * (block, shingle) → count = |∩| → join per-doc set sizes →
    * |∪| = |a|+|b|-|∩|. The join key is the shingle, so co-occurrence
    * is an equi-shuffle, not a cartesian product.
    *
    * Skew guard: a shingle shared by k documents emits ~k²/2 candidate
    * rows out of the self-join, so one stop-phrase shingle with
    * document frequency 10⁶ would emit 5·10¹¹ rows from a single hot
    * key. `maxShingleDocFreq` drops shingles above that document
    * frequency (within a block) from the WHOLE computation — both the
    * intersection and the per-doc set sizes, so the result is exactly
    * the Jaccard over the surviving shingle sets (standard hot-shard
    * pruning for near-dup mining; high-DF shingles carry no dedup
    * signal anyway).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int,
      threshold: Double,
      maxShingleDocFreq: Int = 1000): DataFrame =
    pairsFromShingles(shingleFrame(docs, idCol, textCol, blockCol, n),
      threshold, maxShingleDocFreq)

  /** The (doc, blk, shingle) frame [[ngramJaccardPairs]] mines over —
    * exposed separately so [[IncrementalDedup]] can persist it as the
    * fingerprint index (appending a delta then shingles ONLY the delta
    * text; the old corpus is re-read as this narrow int64 frame).
    *
    * The explicit not-null pre-filter is LOAD-BEARING for plan reuse:
    * downstream branches (hot-shingle anti-join on (blk, shingle),
    * size join on doc) each infer different IsNotNull constraints
    * from their join keys, and Catalyst pushes them into each
    * branch's scan — making the otherwise-identical explode+distinct
    * subtrees differ and defeating ReusedExchange, so the expensive
    * shingling ran up to 4x. With the filters applied once here,
    * every branch shares ONE exchange (asserted in PlanSpec).
    * Shingles are hashed to int64 (xxhash64) IMMEDIATELY after the
    * explode, so the n-gram STRINGS never leave the scan stage: the
    * distinct, the DF cap, the per-doc sizes and the self-join all
    * shuffle fixed-width 8-byte keys instead of ~20-40 byte strings
    * (3-5x less exchange traffic, and fixed-width keys take the
    * UnsafeRow fast path in the hash aggregate). Set semantics are
    * preserved up to xxhash64 collisions: for a corpus with S
    * distinct shingles per block the expected collision count is
    * ~S²/2^65 — at S = 10^9 that is ~5x10^-8 expected collisions, and
    * a collision only perturbs one intersection count by 1.
    */
  private[operators] def shingleFrame(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int): DataFrame =
    docs
      .filter(col(idCol).isNotNull && col(blockCol).isNotNull)
      .select(col(idCol).as("doc"), col(blockCol).as("blk"),
        explode(TextFns.textShingles(col(textCol), n)).as("__s"))
      .select(col("doc"), col("blk"), xxhash64(col("__s")).as("shingle"))
      .distinct()

  /** Jaccard pair mining over a prepared (doc, blk, shingle) frame —
    * the body of [[ngramJaccardPairs]], reusable against a PERSISTED
    * shingle frame (incremental dedup re-mines from the index without
    * touching corpus text).
    */
  private[operators] def pairsFromShingles(
      shAll: DataFrame,
      threshold: Double,
      maxShingleDocFreq: Int,
      precomputedHot: Option[DataFrame] = None,
      precomputedSizes: Option[DataFrame] = None,
      // "jaccard" (inter/union) or "containment" (inter/min) — the
      // score column is NAMED after the mode
      score: String = "jaccard"): DataFrame = {
    // The DF cap and the per-doc set size are HASH aggregates joined
    // back (the oracle's own shape), not window passes: a window here
    // is a full sort of the exploded frame per pass, and those two
    // sorts were the round-2 bench's variance source (one gate run
    // recorded a 9x q33 outlier from a sort spill). No broadcast
    // HINTS on the joins: the hot-shingle list is near-empty by
    // construction and `sz` is one row per doc, so AQE broadcasts
    // them at every realistic size — but `sizes` grows with the
    // corpus (one row per document), and a forced broadcast would hit
    // the 8 GB broadcast ceiling at ~10^8 docs where a shuffle join
    // is the right plan.
    val hot = precomputedHot.getOrElse(
      shAll.groupBy(col("blk"), col("shingle"))
        .agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxShingleDocFreq)
        .select(col("blk"), col("shingle")))
    val surviving = shAll.join(hot, Seq("blk", "shingle"), "left_anti")
    val sizes = precomputedSizes.getOrElse(
      surviving.groupBy(col("doc")).agg(count(lit(1)).as("sz")))
    // set sizes attach to the AGGREGATED pair list, not to the frame
    // entering the self-join: the pair aggregate's output is orders of
    // magnitude smaller than the candidate rows, so two joins there
    // beat widening every self-join row with a carried `sz` (and the
    // self-join inputs stay identical subtrees → one ReusedExchange)
    val a = surviving.alias("a")
    val b = surviving.alias("b")
    val pairCounts = a.join(b,
        col("a.shingle") === col("b.shingle")
          && col("a.blk") === col("b.blk")
          && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    val denom = score match {
      case "containment" => least(col("sz_a"), col("sz_b")).cast("double")
      case "jaccard" =>
        (col("sz_a") + col("sz_b") - col("inter")).cast("double")
      case other => throw new IllegalArgumentException(
        s"unknown pair score '$other' (jaccard | containment)")
    }
    pairCounts
      .join(sizes.select(col("doc").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("doc").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn(score, col("inter").cast("double") / denom)
      .filter(col(score) >= threshold)
      .select(col("id_a"), col("id_b"), col(score))
  }

  /** [[pairsFromShingles]] restricted to pairs with AT LEAST ONE
    * endpoint in `restrict` (a one-column `doc` frame) — the
    * incremental-append miner: candidates come from
    * restrict-side × full-side on (blk, shingle) instead of the full
    * self-join, so old×old pairs are never re-derived. The DF cap,
    * set sizes and Jaccard are computed over the FULL `shAll` frame,
    * so every emitted pair scores exactly as the unrestricted miner
    * would score it.
    *
    * Double-emission when both endpoints are restricted is collapsed
    * by normalizing to (least, greatest) and de-duplicating the
    * (pair, shingle) rows before the intersection count — `restrict`
    * is small by construction (a delta plus cap-crossing fallout), so
    * that distinct shuffles candidate-sized data, not corpus-sized.
    *
    * The `precomputed*` hooks let [[IncrementalDedup]] feed the miner
    * from its PERSISTED stats frames so a routine append does zero
    * corpus-keyed shuffles here:
    *   - `precomputedHot`: the combined hot-shingle list (near-empty);
    *   - `precomputedSizes`: (doc, sz) surviving set sizes over the
    *     full combined frame — replaces the full-frame groupBy(doc),
    *     the miner's one remaining corpus-wide exchange;
    *   - `precomputedRestrictShingles`: the restrict docs' SURVIVING
    *     (doc, blk, shingle) rows — replaces the surviving ⋈ restrict
    *     derivation, which otherwise scans `shAll` a second time;
    *   - `broadcastRestrict`: hash-join the candidate join with the
    *     restrict side broadcast, so the corpus side STREAMS through
    *     a scan instead of shuffling for a sort-merge join. Callers
    *     size-route it (a restrict side above the broadcast ceiling
    *     must keep the shuffle plan).
    */
  private[operators] def pairsFromShinglesRestricted(
      shAll: DataFrame,
      restrict: DataFrame,
      threshold: Double,
      maxShingleDocFreq: Int,
      precomputedHot: Option[DataFrame] = None,
      precomputedSizes: Option[DataFrame] = None,
      precomputedRestrictShingles: Option[DataFrame] = None,
      broadcastRestrict: Boolean = false): DataFrame = {
    // the caller may already hold the hot-shingle list (IncrementalDedup
    // computes it to find cap-crossing fallout) — recomputing it here
    // would re-aggregate the full shingle frame for nothing
    val hot = precomputedHot.getOrElse(
      shAll.groupBy(col("blk"), col("shingle"))
        .agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxShingleDocFreq)
        .select(col("blk"), col("shingle")))
    val surviving = shAll.join(hot, Seq("blk", "shingle"), "left_anti")
    val sizes = precomputedSizes.getOrElse(
      surviving.groupBy(col("doc")).agg(count(lit(1)).as("sz")))
    val r0 = precomputedRestrictShingles.getOrElse(surviving.join(
      restrict.select(col(restrict.columns.head).as("doc")).distinct(), "doc"))
    val r = if (broadcastRestrict) broadcast(r0) else r0
    val pairCounts = r.alias("a")
      .join(surviving.alias("b"),
        col("a.shingle") === col("b.shingle")
          && col("a.blk") === col("b.blk")
          && col("a.doc") =!= col("b.doc"))
      .select(least(col("a.doc"), col("b.doc")).as("id_a"),
        greatest(col("a.doc"), col("b.doc")).as("id_b"),
        col("a.shingle").as("shingle"))
      .distinct()
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairCounts
      .join(sizes.select(col("doc").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("doc").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double")
          / (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash + LSH near-duplicate candidates. Signature of `numHashes`
    * min-hashes, split into `bands`; docs sharing any band hash become
    * candidates; candidates are scored with the signature-overlap
    * Jaccard estimate and filtered at `estThreshold`.
    *
    * Scale path vs [[ngramJaccardPairs]]: the self-join key is the
    * (band, bandHash) bucket, so cost is driven by bucket collisions
    * (tunable via bands/rows), not by shared-shingle co-occurrence.
    * Returns (id_a, id_b, est_jaccard).
    */
  /** MinHash signatures in ONE aggregation pass: shingles are exploded
    * to rows, string-hashed ONCE (`h0` — string hashing k times per
    * shingle was round 1's dominant cost), then folded into all k
    * per-permutation minima as k SEPARATE codegen'd `min` aggregates
    * over built-in arithmetic, assembled into the signature array
    * after the aggregate.
    *
    * Why k plain mins and not a UDAF: the k-lane `Aggregator`
    * ([[graft.functions.MinHashAgg]], kept as the U-2 API surface)
    * pays an encoder round-trip of its array buffer per input row and
    * keeps the aggregate out of whole-stage codegen — profiled at ~6x
    * the aggregate's cost at sf0.1 in portable mode. k long `min`s
    * compile into ONE whole-stage-codegen hash aggregate with a
    * fixed-width UnsafeRow buffer (k longs), map-side partials
    * included; signatures are bit-identical to the aggregator's (same
    * per-lane arithmetic, and `min` is order-insensitive). The naive
    * nested-higher-order-function formulation
    * (`transform(sequence(0,k), i -> array_min(transform(...)))`) is
    * interpreted and benched 50x slower still.
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      numHashes: Int,
      portable: Boolean = false): DataFrame = {
    import graft.functions.PortableHash
    // no shingle-dedup pass: `min` is insensitive to duplicates, so
    // the min-hash of the shingle MULTISET equals the min-hash of the
    // set — the explode feeds the aggregation directly and the ONLY
    // shuffle is the (doc)-keyed partial-aggregated one (round 1 paid
    // an extra full exchange for a distinct whose output the min never
    // distinguishes). Strings die before the exchange too: only
    // (doc, h0) leaves the scan stage.
    //
    // `portable = true` swaps the hash family for the md5-derived
    // universal hashes the DuckDB oracle reproduces bit-identically
    // ([[PortableHash]]): h0 = md5Long60 % p, lane_i = (a_i*h0+b_i) % p
    // — every intermediate < 2^62, so ANSI mode never overflows. The
    // default keeps xxhash64: lane_i = xxhash64(i, h0), the same
    // seed-42 mixing MinHashAgg reproduces in JVM form.
    val baseHash =
      if (portable) PortableHash.md5Long60(col("shingle")) % lit(PortableHash.P)
      else xxhash64(col("shingle"))
    val laneMin: Int => Column =
      if (portable) {
        val (as, bs) = PortableHash.laneCoeffs(numHashes)
        i => min((lit(as(i)) * col("h0") + lit(bs(i))) % lit(PortableHash.P))
      } else {
        i => min(xxhash64(lit(i), col("h0")))
      }
    val lanes = (0 until numHashes).map(i => laneMin(i).as(s"__m$i"))
    docs.select(col(idCol).as("doc"),
        explode(TextFns.textShingles(col(textCol), shingleN)).as("shingle"))
      .select(col("doc"), baseHash.as("h0"))
      .groupBy(col("doc"))
      .agg(lanes.head, lanes.tail: _*)
      .select(col("doc"),
        array((0 until numHashes).map(i => col(s"__m$i")): _*).as("sig"))
  }

  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      numHashes: Int,
      bands: Int,
      estThreshold: Double,
      portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = minhashSignatures(docs, idCol, textCol, shingleN, numHashes,
      portable)
    // band key: any deterministic function of the band's lane slice
    // works for the bucket equi-join. Portable mode uses the joined
    // string itself (equality of the comma-joined slice IS equality of
    // the slice — zero collision risk, and the oracle mirrors it with
    // array_to_string); the default keeps the cheaper fixed-width
    // xxhash64 bucket key.
    val bandKey: Column => Column =
      if (portable) sliced => concat_ws(",", transform(sliced, _.cast("string")))
      else sliced => xxhash64(sliced)
    val banded = sigs.select(col("doc"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          bandKey(slice(col("sig"), b * rows + 1, lit(rows))).as("bh")))).as("bb"))
      .select(col("doc"), col("sig"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    // score INSIDE the join stage with the codegen'd sig_overlap (32
    // long compares — round 1 used the interpreted aggregate(zip_with)
    // HOF here, the bench's dominant tail) and filter BEFORE any
    // shuffle: candidate rows that miss the threshold die pipelined in
    // the join's output stage, and only the tiny survivor set (with
    // its deterministic score, identical across the up-to-`bands`
    // duplicate copies) reaches the distinct's exchange.
    a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        graft.plans.SigOverlap.sigOverlap(docs.sparkSession,
          col("a.sig"), col("b.sig")).as("est_jaccard"))
      .filter(col("est_jaccard") >= estThreshold)
      .distinct()
  }

  /** Connected components over a near-dup pair list: every document
    * gets `cluster` = the smallest doc id reachable through the pair
    * graph (documents in no pair are their own singleton cluster).
    * This is the step that turns pairwise near-dup evidence into an
    * actionable keep/drop set: keep `doc == cluster`, drop the rest.
    *
    * Algorithm: iterative min-label propagation — each round every
    * node takes the min of its own label and its neighbors' labels,
    * until a round changes nothing. Rounds = graph diameter (near-dup
    * graphs are unions of small cliques, so diameter is tiny); each
    * round is one equi-join + one aggregate, and the label frame is
    * checkpointed to keep the plan/lineage flat regardless of
    * iteration count — the property that makes the loop safe at
    * 100 TB (alternating star-contraction is the published
    * optimization if diameter ever grows; the join shape is the same).
    *
    * `pointerJumping` (default true): each round also compresses
    * label chains by one path-doubling step — `lbl'(v) =
    * min(lbl(v), lbl(lbl(v)))` as one extra self-join of the label
    * frame. Labels only ever decrease and stay inside the component
    * (every label IS a component node id, and `lbl(u) <= u`), so the
    * fixed point is unchanged — but a path of length d collapses in
    * O(log d) rounds instead of d (Shiloach–Vishkin-style
    * compression; the published fix for the chain-shaped worst case
    * that pure min-propagation cannot survive at scale). Near-dup
    * clique unions barely notice; adversarial chains go from
    * "diameter rounds = job-killing" to a handful. Disable only to
    * reproduce the textbook propagation loop.
    *
    * `checkpointDir`: when set, each round is materialized as PARQUET
    * under that directory and read back — the 100 TB choice:
    * `localCheckpoint` pins blocks in executor memory and is
    * unrecoverable on executor loss, so a single lost executor
    * mid-loop kills the whole job. A file roundtrip truncates lineage
    * exactly like a reliable RDD `checkpoint()` but touches NO
    * SparkContext-global state: the session's `setCheckpointDir`
    * plane is never mutated (an earlier revision round-tripped it and
    * could redirect — then delete — a concurrent job's checkpoints),
    * and every file deleted is one this loop wrote itself. The
    * default stays `localCheckpoint` (no filesystem dependency for
    * small/local runs). The PREVIOUS round's files are deleted as
    * soon as the next round is materialized (an unbounded loop must
    * not grow storage by O(rounds x labels)); what remains afterwards
    * is the edge list + final round only — delete `checkpointDir`
    * once done with the result. The per-round convergence check scans
    * the just-materialized frame (old label carried through the
    * propagation join) — no extra join per round.
    */
  def clusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      maxIterations: Int = 50, checkpointDir: Option[String] = None,
      pointerJumping: Boolean = true,
      maxDriverEdges: Long = 200000L): DataFrame = {
    val spark = docs.sparkSession
    val sc = spark.sparkContext
    def persistAt(df: DataFrame, label: String): DataFrame = checkpointDir match {
      case Some(dir) =>
        val path = s"$dir/$label"
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      case None => df.localCheckpoint(true)
    }
    def dropRound(round: Int): Unit = checkpointDir.foreach { dir =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/labels-$round")
      p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
      ()
    }
    // undirected edge list (both directions), deduped
    val fwd = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = persistAt(fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct(), "edges")
    // size-routed driver fast path (the foldLabels/byte-gate
    // discipline): a small pair subgraph pays ~8-10 fixed Spark jobs
    // per pointer-jumping round that dwarf the actual work, so below
    // `maxDriverEdges` directed edges the components are solved with
    // one collect + union-find on the driver (bounded by the EDGE
    // count, never the corpus — large subgraphs take the distributed
    // loop below). The limit+1 collect off the just-checkpointed
    // frame both decides the route and fetches the edges; min-label
    // equality with the distributed loop is spec-pinned
    // (DedupClustersSpec), including the string order (UTF8 binary,
    // matching Spark's least()/min()).
    val driverLabels = driverComponents(spark, edges, maxDriverEdges)
    if (driverLabels.isDefined) {
      checkpointDir.foreach { dir =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/edges")
        p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
        ()
      }
      docs.select(col(idCol))
        .join(driverLabels.get, docs(idCol) === driverLabels.get("id"), "left")
        .select(col(idCol), coalesce(col("lbl"), col(idCol)).as("cluster"))
    } else locally {
      // propagate ONLY over the pair subgraph — near-dup graphs are a
      // vanishing fraction of the corpus, so the iteration loop never
      // touches the full document table; singletons get their own id
      // in one left join at the end
      var labels = persistAt(edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl")), "labels-0")
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < maxIterations) {
        val neighborMin = edges.join(labels, col("dst") === col("id"))
          .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
        // carry the previous label through the join so convergence is
        // a metadata-cheap scan of the materialized round, not a
        // second join against the old labels
        val steppedPlan = labels.join(neighborMin, col("id") === col("src"), "left")
          .select(col("id"), col("lbl").as("prev"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        val next = if (!pointerJumping) {
          persistAt(steppedPlan, s"labels-${iter + 1}")
        } else {
          // path doubling: follow each label one hop (lbl is itself a
          // node id in the label frame) and take the min — one extra
          // SELF-join of the label frame per round, halving the
          // remaining chain length. The stepped frame is materialized
          // FIRST: the self-join reads it twice, and without that each
          // read would re-execute the expensive edge join above
          // (doubling the round's cost for nothing)
          val stepped = persistAt(steppedPlan, s"labels-${iter + 1}-pre")
          val parents = stepped.select(col("id").as("__pid"), col("lbl").as("__plbl"))
          val out = persistAt(
            stepped.join(parents, col("lbl") === col("__pid"), "left")
              .select(col("id"), col("prev"),
                least(col("lbl"), coalesce(col("__plbl"), col("lbl"))).as("lbl")),
            s"labels-${iter + 1}")
          // the pre frame is dead as soon as the round materializes
          checkpointDir.foreach { dir =>
            val p = new org.apache.hadoop.fs.Path(s"$dir/labels-${iter + 1}-pre")
            p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
            ()
          }
          out
        }
        changed = next.filter(col("lbl") =!= col("prev")).count()
        labels = next.select(col("id"), col("lbl"))
        dropRound(iter) // round iter+1 is materialized; iter is dead
        iter += 1
      }
      // never return silently-truncated components: a partially
      // propagated labeling would under-merge clusters and the
      // keep/drop step would keep duplicates with no signal anything
      // went wrong
      if (changed > 0) throw new IllegalStateException(
        s"clusters() did not converge within $maxIterations iterations " +
          s"($changed labels still changing) — raise maxIterations " +
          "(rounds needed ~ log2(pair-graph diameter) with pointer " +
          "jumping, = diameter without)")
      docs.select(col(idCol))
        .join(labels, docs(idCol) === labels("id"), "left")
        .select(col(idCol), coalesce(col("lbl"), col(idCol)).as("cluster"))
    }
  }

  /** Driver-side connected components over a SMALL directed edge
    * frame (both directions present, as [[clusters]] builds it):
    * collect up to `maxDriverEdges` + 1 rows — overflow, an
    * unsupported key type, or a null endpoint returns None and the
    * caller runs the distributed loop. Labels are min-of-component
    * under the SAME total order Spark's `least`/`min` use (numeric, or
    * UTF8 binary for strings — java.lang.String's UTF-16 order differs
    * on supplementary characters, so strings compare as UTF8String).
    */
  private def driverComponents(
      spark: org.apache.spark.sql.SparkSession,
      edges: DataFrame,
      maxDriverEdges: Long): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    if (maxDriverEdges <= 0) return None
    require(maxDriverEdges < Int.MaxValue,
      s"maxDriverEdges must fit an Int limit, got $maxDriverEdges")
    val dt = edges.schema.fields.head.dataType
    val ord: Ordering[Any] = dt match {
      case LongType => Ordering.by((x: Any) => x.asInstanceOf[Long])
      case IntegerType => Ordering.by((x: Any) => x.asInstanceOf[Int])
      case StringType => (a: Any, b: Any) =>
        org.apache.spark.unsafe.types.UTF8String
          .fromString(a.asInstanceOf[String])
          .compareTo(org.apache.spark.unsafe.types.UTF8String
            .fromString(b.asInstanceOf[String]))
      case _ => null
    }
    if (ord == null) return None
    val sample = edges.limit(maxDriverEdges.toInt + 1).collect()
    if (sample.length > maxDriverEdges) return None
    if (sample.exists(r => r.isNullAt(0) || r.isNullAt(1))) return None
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while ({ val p = parent.getOrDefault(r, r); p != r && { r = p; true } }) ()
      var c = x // path compression
      while (parent.getOrDefault(c, c) != r) {
        val next = parent.getOrDefault(c, c); parent.put(c, r); c = next
      }
      r
    }
    sample.foreach { row =>
      val (ra, rb) = (find(row.get(0)), find(row.get(1)))
      if (ra != rb) {
        if (ord.lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    // union-by-min keeps roots small, but path lengths can hide a
    // smaller member behind a root — resolve the true min explicitly
    val nodes = sample.flatMap(r => Seq(r.get(0), r.get(1))).distinct
    val byRoot = nodes.groupBy(find)
    val label = byRoot.iterator.flatMap { case (_, members) =>
      val m = members.min(ord)
      members.iterator.map(v => org.apache.spark.sql.Row(v, m))
    }.toSeq
    val schema = StructType(Seq(
      StructField("id", dt), StructField("lbl", dt)))
    Some(spark.createDataFrame(
      java.util.Arrays.asList(label: _*), schema))
  }

  /** Training-data DECONTAMINATION: flag every training document that
    * shares at least `minOverlap` distinct n-gram shingles with the
    * evaluation/benchmark corpus — the step that keeps test sets out
    * of the training mix (an LLM pipeline staple; shingle containment
    * is the standard published detector).
    *
    * Output: `train` with `n_overlap` (distinct shared shingles) and
    * `contaminated` appended; every input row preserved.
    *
    * Scale shape: the EVAL side is tiny by definition (benchmarks),
    * so its distinct shingle set is BROADCAST — the training corpus
    * streams through one codegen'd explode + broadcast semi-join and
    * the only corpus-keyed shuffle is the per-doc overlap count's
    * partial-aggregated (doc) exchange, carrying 8-byte counts, never
    * shingle strings (the overlap-counts-each-shingle-once dedup is
    * `array_distinct` ROW-LOCALLY before the explode — a corpus-wide
    * `distinct` here would shuffle every training shingle string).
    * No corpus self-join anywhere: cost is linear in training tokens
    * regardless of corpus size.
    */
  def decontaminate(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minOverlap: Int = 1): DataFrame =
    decontaminateWith(train,
      eval.select(explode(TextFns.textShingles(col(textCol), n)).as("shingle"))
        .distinct(),
      idCol, textCol, n, minOverlap)

  /** [[decontaminate]] against a PRE-BUILT distinct eval shingle frame
    * (one `shingle` string column) — the incremental-curation path
    * persists the eval set's shingles once and appends deltas without
    * ever re-reading the eval corpus.
    */
  def decontaminateWith(
      train: DataFrame,
      evalShingles: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minOverlap: Int = 1): DataFrame = {
    val overlap = train
      .select(col(idCol).as("__doc"),
        explode(array_distinct(TextFns.textShingles(col(textCol), n)))
          .as("shingle"))
      .join(broadcast(evalShingles), "shingle")
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_overlap"))
    train.join(overlap, train(idCol) === overlap("__doc"), "left")
      .drop("__doc")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }

  /** Span-level decontamination REPORT — the audit artifact behind
    * [[decontaminate]]'s boolean: for every (train doc, eval doc)
    * pair sharing at least one n-gram shingle, the number of distinct
    * shared shingles and the FIRST train-side token position hit
    * (1-based shingle index). "q64 says drop it" becomes "doc X
    * overlaps eval doc Y on k grams starting at token p" — what a
    * release review actually reads.
    *
    * Scale shape: [[decontaminate]]'s exactly — the eval (eval_id,
    * shingle) frame is benchmark-sized and BROADCAST; the train side
    * explodes row-locally DISTINCT shingles with their first position
    * (array_position against the row's own shingle array — no
    * corpus-wide (doc, shingle) exchange), and the only shuffle is
    * the pair-keyed count, carrying ids and two longs. Linear in
    * train tokens, zero corpus self-joins.
    *
    * Output: (train id, eval_id, n_shared, first_pos), contaminated
    * pairs only.
    */
  def contaminationSpans(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val evalShingles = eval
      .select(col(idCol).as("eval_id"),
        explode(array_distinct(TextFns.textShingles(col(textCol), n)))
          .as("shingle"))
      .distinct()
    val trainShingles = train
      .select(col(idCol), TextFns.textShingles(col(textCol), n).as("__sh"))
      .select(col(idCol), col("__sh"),
        explode(array_distinct(col("__sh"))).as("shingle"))
      .select(col(idCol), col("shingle"),
        array_position(col("__sh"), col("shingle")).as("__pos"))
    trainShingles
      .join(broadcast(evalShingles), "shingle")
      .groupBy(col(idCol), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"), min(col("__pos")).as("first_pos"))
  }

  /** BLOOM-side eval bit set for [[decontaminateBloom]]: every
    * distinct eval shingle sets `k` bits of an `m`-bit Bloom filter,
    * materialized as the DISTINCT bit-position frame (≤ min(m,
    * shingles×k) ints). Bits are fully deterministic public
    * arithmetic — md5-derived base hash into the
    * [[graft.functions.PortableHash]] universal lane family, mod m —
    * so an oracle can replay the filter (including its false
    * positives) bit-for-bit, and a persisted bit frame is reusable
    * across runs and engines.
    */
  def bloomEvalBits(evalShingles: DataFrame, m: Int, k: Int): DataFrame = {
    require(m > 0 && k > 0, "bloom needs positive m and k")
    require(m <= (1 << 27),
      s"m=$m bits exceeds the broadcast-sane ceiling (2^27 ≈ 16 MB of " +
        "set bits) — a filter that big belongs in a shuffle join, not " +
        "a broadcast side")
    val (a, b) = graft.functions.PortableHash.laneCoeffs(k)
    val p = graft.functions.PortableHash.P
    val h = graft.functions.PortableHash.md5Long60(col("shingle")) % lit(p)
    evalShingles
      .select(h.as("__h"))
      .select(explode(array((0 until k).map(i =>
        (((lit(a(i)) * col("__h") + lit(b(i))) % lit(p)) % lit(m.toLong))
          .cast("long")): _*)).as("bit"))
      .distinct()
  }

  /** [[decontaminate]]'s FIXED-SIZE scale path: the eval set ships as
    * an `m`-bit Bloom filter instead of its raw shingle strings, so
    * the broadcast side is bounded (~m/8 bytes) NO MATTER how many
    * eval benchmarks pile up — the exact path's broadcast grows with
    * every added benchmark and eventually hits the executor ceiling.
    * Classic Bloom semantics: zero false NEGATIVES (every truly
    * contaminated doc is flagged), false positives at the standard
    * (1-e^{-kn/m})^k rate — callers route flagged docs through the
    * exact check or accept the over-drop (the conservative direction
    * for decontamination). Unlike library bloom filters, the bit
    * arithmetic here is engine-portable ([[bloomEvalBits]]), so the
    * FP set itself is deterministic and oracle-checkable.
    *
    * Output contract mirrors [[decontaminate]]: every train row with
    * `n_overlap` (count of DISTINCT shingle hashes whose k bits all
    * hit — a 2^31-space quantization, same ~collision caveat as
    * [[shingleFrame]]) and `contaminated`.
    *
    * Scale shape: one row-local shingle scan (k bit rows per distinct
    * shingle), one broadcast equi-join on the int bit, two
    * partial-aggregated shuffles keyed on (doc, hash) then doc. No
    * eval-side strings anywhere in the plan.
    */
  def decontaminateBloom(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      m: Int = 1 << 20,
      k: Int = 4,
      minOverlap: Int = 1): DataFrame = {
    val evalShingles = eval
      .select(explode(TextFns.textShingles(col(textCol), n)).as("shingle"))
      .distinct()
    decontaminateBloomWith(train, bloomEvalBits(evalShingles, m, k),
      idCol, textCol, n, m, k, minOverlap)
  }

  /** [[decontaminateBloom]] against a PRE-BUILT bit frame (one `bit`
    * column) — the persisted-filter deployment path.
    */
  def decontaminateBloomWith(
      train: DataFrame,
      evalBits: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      m: Int,
      k: Int,
      minOverlap: Int = 1): DataFrame = {
    require(m > 0 && k > 0, "bloom needs positive m and k")
    val (a, b) = graft.functions.PortableHash.laneCoeffs(k)
    val p = graft.functions.PortableHash.P
    val sh = train
      .select(col(idCol).as("__doc"),
        explode(array_distinct(TextFns.textShingles(col(textCol), n)))
          .as("shingle"))
      .select(col("__doc"),
        (graft.functions.PortableHash.md5Long60(col("shingle")) % lit(p))
          .as("__h"))
    val laneBits = sh.select(col("__doc"), col("__h"),
      posexplode(array((0 until k).map(i =>
        (((lit(a(i)) * col("__h") + lit(b(i))) % lit(p)) % lit(m.toLong))
          .cast("long")): _*)).as(Seq("__lane", "bit")))
    val hits = laneBits.join(broadcast(evalBits), "bit")
      .groupBy(col("__doc"), col("__h"))
      .agg(count_distinct(col("__lane")).as("__nl"))
      .filter(col("__nl") === k)
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_overlap"))
    train.join(hits, train(idCol) === hits("__doc"), "left")
      .drop("__doc")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }

  /** FUZZY decontamination — the near-duplicate member of the
    * decontamination family (q64 = exact shingle overlap, q97 = Bloom
    * overlap at fixed size; this = MinHash-estimated Jaccard):
    * flag train documents whose estimated Jaccard similarity to ANY
    * eval document reaches `estThreshold`. Exact-overlap checks miss
    * the paraphrased/lightly-edited contamination the published eval
    * audits target (GPT-3 App. C, PaLM §8, Llama-2 App. A.6 all use
    * n-gram/near-dup contamination checks); this is that check as one
    * operator.
    *
    * Mechanics are [[minhashLshPairs]]'s with a CROSS-CORPUS banded
    * join: both sides get the same `numHashes`-lane signature family
    * (same [[graft.functions.PortableHash]] coefficients, so
    * estimates are comparable), candidates come from band-bucket
    * equality — eval-side state is |eval|·bands rows however large
    * the train corpus — and candidates score inside the join stage
    * via the codegen'd sig_overlap, dying pipelined when under
    * threshold. Per train doc: `n_eval_matches` (distinct eval docs
    * at/over threshold) and `max_est`.
    *
    * Output: every train row with (idCol, n_eval_matches, max_est,
    * contaminated). `portable = true` swaps in the md5 lane family
    * the DuckDB oracle replays bit-for-bit (q122).
    */
  def decontaminateFuzzy(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      numHashes: Int,
      bands: Int,
      estThreshold: Double,
      portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val bandKey: Column => Column =
      if (portable) sliced => concat_ws(",", transform(sliced, _.cast("string")))
      else sliced => xxhash64(sliced)
    def banded(df: DataFrame) =
      minhashSignatures(df, idCol, textCol, shingleN, numHashes, portable)
        .select(col("doc"), col("sig"),
          explode(transform(sequence(lit(0), lit(bands - 1)),
            b => struct(b.as("band"),
              bandKey(slice(col("sig"), b * rows + 1, lit(rows))).as("bh"))))
            .as("bb"))
        .select(col("doc"), col("sig"),
          col("bb.band").as("band"), col("bb.bh").as("bh"))
    val t = banded(train).alias("t")
    val e = banded(eval).alias("e")
    val hits = t.join(e,
        col("t.band") === col("e.band") && col("t.bh") === col("e.bh"))
      .select(col("t.doc").as("__doc"), col("e.doc").as("__eval"),
        graft.plans.SigOverlap.sigOverlap(train.sparkSession,
          col("t.sig"), col("e.sig")).as("est"))
      .filter(col("est") >= estThreshold)
      // a (train, eval) pair surfaces once per shared band — collapse
      // to the pair before counting distinct eval matches
      .distinct()
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_eval_matches"), max(col("est")).as("max_est"))
    train.join(hits, train(idCol) === hits("__doc"), "left")
      .drop("__doc")
      .withColumn("n_eval_matches", coalesce(col("n_eval_matches"), lit(0L)))
      .withColumn("max_est", coalesce(col("max_est"), lit(0.0)))
      .withColumn("contaminated", col("n_eval_matches") > 0)
  }

  /** EXACT SUBSTRING dedup (Lee et al. 2021, arXiv:2107.06499
    * `ExactSubstr`): find the token spans REPEATED ACROSS documents —
    * the published complement to document-level MinHash, targeting
    * boilerplate/quotation spans that document-level dedup keeps.
    * Published basis uses a corpus-wide suffix array; the Spark-first
    * shape is fixed-length gram fingerprints (a suffix array is a
    * single sequential structure — the antithesis of a partitioned
    * plan), which detects every repeated span of >= `gramLen` tokens
    * exactly: a cross-doc repeat of length m >= gramLen contains all
    * m - gramLen + 1 of its gram windows, each of which repeats, and
    * the island merge below reassembles them into one maximal span.
    *
    *   1. every doc explodes into overlapping `gramLen`-token windows
    *      WITH their start position (the existing shingle expression;
    *      grams hash to int64 immediately — strings never shuffle);
    *   2. gram hashes held by >= `minDocs` DISTINCT docs survive (a
    *      map-side-combined aggregate over the 8-byte key — a gram
    *      shared by k docs costs k rows, never k² pairs, so hot
    *      boilerplate — the very target of the operator — cannot blow
    *      up a join);
    *   3. each doc's surviving window positions merge into maximal
    *      spans (gaps-and-islands window per doc: a window starting
    *      within `gramLen` of its predecessor overlaps or abuts it).
    *
    * Output: (idCol, span_start, span_end, n_windows) — 1-based
    * inclusive token positions of each maximal cross-document
    * repeated span, `n_windows` = merged window count (= span token
    * length - gramLen + 1 for a solid span).
    *
    * Scale shape: no self-join anywhere — cost is linear in corpus
    * tokens plus the duplicated-window row count. Shuffles carry
    * 8-byte gram hashes; the only per-doc structure is the island
    * window, partitioned by doc id (bounded by the longest single
    * document, never the corpus). Collision note: as with
    * [[shingleFrame]], an xxhash64 collision (~S²/2⁶⁵) could mark one
    * spurious window duplicated.
    */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramLen: Int,
      minDocs: Int = 2): DataFrame = {
    require(gramLen >= 1, "gramLen must be positive")
    require(minDocs >= 2, "a span repeats across >= 2 docs")
    val grams = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("__doc"),
        posexplode(TextFns.textShingles(col(textCol), gramLen))
          .as(Seq("__p0", "__g")))
      // pos as long: the oracle's generate_series positions are
      // BIGINT, and the driver's compare includes the schema
      .select(col("__doc"), (col("__p0") + 1).cast("long").as("pos"),
        xxhash64(col("__g")).as("gh"))
    val dup = grams.groupBy(col("gh"))
      .agg(count_distinct(col("__doc")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("gh"))
    val hits = grams.join(dup, "gh").select(col("__doc"), col("pos"))
    val byPos = Window.partitionBy(col("__doc")).orderBy(col("pos"))
    hits
      .withColumn("__brk",
        when(col("pos") - lag(col("pos"), 1).over(byPos) <= gramLen, 0)
          .otherwise(1))
      .withColumn("__island", sum(col("__brk")).over(byPos))
      .groupBy(col("__doc"), col("__island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + gramLen - 1).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("__doc").as(idCol), col("span_start"), col("span_end"),
        col("n_windows"))
  }

  /** The OPERATIONAL half of exact-substring dedup: rewrite each
    * document with every [[repeatedSpans]] token span REMOVED (Lee et
    * al. 2021 drop every occurrence of a cross-document repeat; the
    * survivors keep their unique text). Returns every input doc with
    * `clean_text` (tokens outside flagged spans, single-space joined,
    * lowercased by the tokenizer — token-level fidelity, not byte: the
    * span machinery is defined over the token stream) and
    * `n_dropped_tokens`.
    *
    * Scale shape: spans per doc are a tiny frame (output of the span
    * miner); the rewrite is one posexplode of the corpus tokens, one
    * broadcast-or-shuffle anti-join on (doc, pos-in-span) — expressed
    * as a range predicate on the doc-keyed join so Catalyst keeps it
    * an equi-join on doc with the span bounds as residuals — and one
    * per-doc ordered re-assembly (array_sort of (pos, token) structs,
    * no window).
    */
  def stripRepeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramLen: Int,
      minDocs: Int = 2): DataFrame = {
    val spans = repeatedSpans(docs, idCol, textCol, gramLen, minDocs)
      .select(col(idCol).as("__sdoc"), col("span_start"), col("span_end"))
    val toks = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("__doc"),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("__p0", "__t")))
      .select(col("__doc"), (col("__p0") + 1).cast("long").as("pos"),
        col("__t"))
    val kept = toks.join(spans,
        col("__doc") === col("__sdoc") &&
          col("pos") >= col("span_start") && col("pos") <= col("span_end"),
        "left_anti")
      .groupBy(col("__doc"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("__t")))),
          s => s.getField("__t"))).as("clean_text"),
        count(lit(1)).as("__n_kept"))
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol),
        size(TextFns.tokens(col(textCol))).cast("long").as("__n_total"))
      .join(kept, col(idCol) === col("__doc"), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("__n_total") - coalesce(col("__n_kept"), lit(0L)))
          .as("n_dropped_tokens"))
  }

  /** Staged dedup pipeline: near-dup PAIRS → connected-component
    * CLUSTERS → quality-argmax SURVIVORS, sharing ONE materialized
    * pair frame across the three results instead of re-mining the
    * shingle self-join for each (pair mining dominates the whole
    * family's cost — benched ~3x the propagation + argmax combined at
    * sf0.1, and the ratio only grows with corpus size).
    *
    * Laziness contract: nothing runs at construction. `pairs` is
    * mined and materialized on first access; `clusters` builds on the
    * materialized `pairs`; [[Stage.survivors]] builds on the
    * materialized `clusters`. A caller that only needs pairs never
    * pays for propagation; a caller that walks the whole stage pays
    * for the mining exactly once.
    *
    * Materialization: parquet under `checkpointDir` when given (the
    * 100 TB choice — survives executor loss, shareable across jobs),
    * else an eager `localCheckpoint` (pinned in executor memory; fine
    * for single-box runs). Both truncate lineage, so the three
    * downstream plans each start from a flat scan of the shared frame
    * rather than re-deriving the mining subtree.
    */
  final class Stage private[Dedup] (
      docs: DataFrame, idCol: String, mine: () => DataFrame,
      checkpointDir: Option[String]) {

    private def materialize(df: DataFrame, label: String): DataFrame =
      checkpointDir match {
        case Some(dir) =>
          val path = s"$dir/$label"
          df.write.mode("overwrite").parquet(path)
          docs.sparkSession.read.parquet(path)
        case None => df.localCheckpoint(true)
      }

    /** Near-dup pairs (id_a, id_b, jaccard), mined once. */
    lazy val pairs: DataFrame = materialize(mine(), "pairs")

    // clusters memo is resettable (unlike a lazy val) so a benchmark
    // can re-time the propagation layer alone while keeping the mined
    // pair frame — see PipelineQueries.resetDedupClusters
    private var clustersMemo: Option[DataFrame] = None

    /** Connected components over [[pairs]] (doc, cluster) — reuses the
      * materialized pair frame; the propagation loop does its own
      * per-round checkpointing under `checkpointDir/clusters-rounds`.
      */
    def clusters: DataFrame = synchronized {
      clustersMemo.getOrElse {
        val m = materialize(
          Dedup.clusters(docs, idCol, pairs,
            checkpointDir = checkpointDir.map(d => s"$d/clusters-rounds")),
          "clusters")
        clustersMemo = Some(m)
        m
      }
    }

    /** Forget the materialized clusters (the pair frame stays). */
    def invalidateClusters(): Unit = synchronized { clustersMemo = None }

    /** Quality-argmax survivors: joins `scores` (idCol, scoreCol) onto
      * the materialized [[clusters]] and keeps each cluster's best.
      */
    def survivors(scores: DataFrame, scoreCol: String): DataFrame =
      clusterSurvivors(clusters.join(scores, idCol), idCol, scoreCol)
  }

  /** Build a [[Stage]] over `docs` with [[ngramJaccardPairs]] as the
    * pair miner (the exact-Jaccard default; any miner with the same
    * (id_a, id_b, …) output shape composes — see [[stageWith]]).
    */
  def stage(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int,
      threshold: Double,
      maxShingleDocFreq: Int = 1000,
      checkpointDir: Option[String] = None): Stage =
    stageWith(docs, idCol,
      () => ngramJaccardPairs(docs, idCol, textCol, blockCol, n, threshold,
        maxShingleDocFreq),
      checkpointDir)

  /** [[Stage]] over an arbitrary pair miner (MinHash-LSH, SimHash,
    * embedding-cosine — anything emitting (id_a, id_b, …)).
    */
  def stageWith(docs: DataFrame, idCol: String, mine: () => DataFrame,
      checkpointDir: Option[String] = None): Stage =
    new Stage(docs, idCol, mine, checkpointDir)

  /** SimHash near-duplicate pairs: 64-bit simhash per doc, candidates
    * = docs sharing any of `numChunks` (64/numChunks)-bit chunks —
    * pigeonhole guarantees a shared chunk for pairs with
    * hamming <= numChunks-1; beyond that detection is probabilistic —
    * then verified with exact hamming distance. Default 8 chunks of
    * 8 bits: recall guaranteed to hamming 7 with ~2^8-way buckets
    * (selective enough that the candidate join stays small at scale).
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int,
      numChunks: Int = 8,
      portable: Boolean = false): DataFrame = {
    // portable mode: 60-bit md5-derived simhash the DuckDB oracle
    // reproduces bit-identically (SimHashMd5Expr); default: the
    // faster 64-bit splitmix hash. Chunk width scales with the bit
    // count; the pigeonhole recall bound (hamming <= numChunks-1) is
    // unchanged.
    val bits = if (portable) graft.plans.SimHashMd5Expr.Bits else 64
    val simhash: Column => Column =
      if (portable) TextFns.simhashMd5_60 else TextFns.simhash64
    // zero-token documents are excluded: they all hash to the
    // degenerate all-bits-set value (every vote ties at 0) and would
    // pair with each other at hamming 0 despite sharing no content —
    // and the SQL oracle's unnest naturally drops them, so this also
    // keeps the engine and oracle row sets identical
    val hashed = docs
      .select(col(idCol).as("doc"), TextFns.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("doc"), simhash(col("__toks")).as("sh"))
    hammingPairs64(hashed, maxHamming, numChunks, bits)
  }

  /** Hamming-bucketed pair mining over ANY prehashed (doc, sh) frame:
    * the Manku et al. chunk trick — split the hash into `numChunks`
    * chunks, bucket-join on (chunk index, chunk value). Pigeonhole
    * guarantee: a pair at hamming <= numChunks - 1 shares at least
    * one untouched chunk, so recall is EXACT when `maxHamming` is
    * below that bound (callers may exceed it for best-effort recall —
    * q35 does). Shared by text SimHash ([[simhashPairs]]) and
    * perceptual image hashes
    * ([[Multimodal.imagePairs]]) — the hamming join doesn't care what
    * produced the 64 bits.
    */
  private[operators] def hammingPairs64(
      hashed: DataFrame,
      maxHamming: Int,
      numChunks: Int,
      bits: Int = 64): DataFrame = {
    require(bits % numChunks == 0, s"numChunks must divide $bits")
    val width = bits / numChunks
    val mask = (1L << width) - 1
    val chunked = hashed.select(col("doc"), col("sh"),
      explode(transform(sequence(lit(0), lit(numChunks - 1)),
        i => struct(i.as("chunk"),
          (call_function("shiftright", col("sh"), (i * width).cast("int"))
            bitwiseAND lit(mask)).as("ch")))).as("cc"))
      .select(col("doc"), col("sh"), col("cc.chunk").as("chunk"), col("cc.ch").as("ch"))
    val a = chunked.alias("a")
    val b = chunked.alias("b")
    // the hamming predicate is PART OF THE JOIN CONDITION: with 8-bit
    // chunks the buckets collide heavily (n/256 docs per bucket →
    // ~n²/512 candidate rows per chunk), so the cheap codegen'd
    // xor+bit_count must kill non-dups inside the join stage — the
    // round-1 plan shuffled every candidate row into a distinct first,
    // which at sf0.1 meant tens of millions of rows through the
    // exchange for a handful of survivors.
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.ch") === col("b.ch")
          && col("a.doc") < col("b.doc")
          && TextFns.hamming64(col("a.sh"), col("b.sh")) <= maxHamming)
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        TextFns.hamming64(col("a.sh"), col("b.sh")).as("hamming"))
      .distinct()
  }

  /** Containment near-dup pairs — the ASYMMETRIC member of the
    * Jaccard family (Broder 1997 defines both): score =
    * |A∩B| / min(|A|, |B|), which catches a small document wholly
    * EMBEDDED in a large one (quote inclusion, boilerplate-wrapped
    * copies, chunk-of-corpus leaks) where symmetric Jaccard
    * |A∩B|/|A∪B| stays low because the union is dominated by the
    * large side. Same mining shape as [[ngramJaccardPairs]] (df-capped
    * shingle equi-join, sizes joined onto the aggregated pair list);
    * only the final score differs. Output: (id_a, id_b, containment).
    */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int,
      threshold: Double,
      maxShingleDocFreq: Int = 1000): DataFrame =
    pairsFromShingles(shingleFrame(docs, idCol, textCol, blockCol, n),
      threshold, maxShingleDocFreq, score = "containment")

  /** MinHash-LSH quality audit: precision/recall of the banded
    * estimator's pair set ([[minhashLshPairs]], est ≥ threshold)
    * against the EXACT Jaccard pairs over the same un-blocked,
    * un-capped shingle universe — the measurement that tunes
    * bands/rows before committing a corpus-scale dedup run (the S
    * curve says what recall a (bands, rows) point buys at a
    * threshold; this reports what it ACTUALLY bought on this corpus).
    *
    * Output: ONE row (n_exact, n_lsh, tp, precision6, recall6) — tp =
    * pairs in both sets, precision = tp/n_lsh, recall = tp/n_exact
    * (null on an empty denominator, the q141 zero-ratio convention).
    *
    * Scale note: the exact side is the audit's cost (a full
    * shingle-equality self-join) — run it on a SAMPLE at corpus scale
    * and the estimator side at full width; the sample's recall
    * estimate is unbiased because membership in both sets is
    * pair-local.
    */
  def lshRecallAudit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      portable: Boolean = true): DataFrame = {
    val exact = ngramJaccardPairs(
        docs.withColumn("__blk", lit("all")), idCol, textCol, "__blk",
        shingleN, threshold, maxShingleDocFreq = Int.MaxValue)
      .select(col("id_a"), col("id_b"))
    val lsh = minhashLshPairs(docs, idCol, textCol, shingleN, numHashes,
        bands, threshold, portable)
      .select(col("id_a"), col("id_b"))
    val tp = exact.join(lsh, Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("tp"))
    val ne = exact.agg(count(lit(1)).as("n_exact"))
    val nl = lsh.agg(count(lit(1)).as("n_lsh"))
    ne.crossJoin(nl).crossJoin(tp)
      .select(col("n_exact"), col("n_lsh"), col("tp"),
        when(col("n_lsh") === 0, lit(null).cast("double"))
          .otherwise(floor(col("tp").cast("double") / col("n_lsh").cast("double")
            * lit(1e6) + lit(0.5)) / lit(1e6)).as("precision6"),
        when(col("n_exact") === 0, lit(null).cast("double"))
          .otherwise(floor(col("tp").cast("double") / col("n_exact").cast("double")
            * lit(1e6) + lit(0.5)) / lit(1e6)).as("recall6"))
  }

  /** Capture–recapture (Lincoln–Petersen) estimate of the TRUE
    * duplicate-pair population from two INDEPENDENT detectors:
    * N̂ = n_a·n_b / n_both, where n_both is the pair overlap — the
    * recall-estimation trick ecology uses on animal populations and
    * dedup audits use when no ground truth exists (each detector's
    * implied recall = n_both / n_other). Independence is the
    * assumption doing the work: MinHash-LSH and SimHash miss pairs
    * for unrelated reasons (band collisions vs hamming chunks), the
    * closest thing to two independent traps the pipeline has.
    *
    * Exactness: all three counts are exact integer aggregates over
    * canonicalized DISTINCT pair sets; the estimate/recalls are one
    * row of double arithmetic, 6dp-snapped, NULL when the overlap is
    * empty (no estimate without a recapture).
    *
    * Scale shape: two distincts + one pair-keyed equi-join + three
    * 1-row aggregates — all on pair frames the detectors already
    * bounded.
    *
    * Output: ONE row (n_a, n_b, n_both, est_total6, recall_a6,
    * recall_b6).
    */
  def captureRecapture(
      pairsA: DataFrame,
      pairsB: DataFrame,
      idACol: String,
      idBCol: String): DataFrame = {
    def canon(df: DataFrame): DataFrame =
      df.filter(col(idACol) =!= col(idBCol))
        .select(least(col(idACol), col(idBCol)).as("__a"),
          greatest(col(idACol), col(idBCol)).as("__b"))
        .distinct()
    // the two detector mines are independent job graphs — materialize
    // them CONCURRENTLY (the IncrementalDedup tick's Future-overlap
    // discipline) instead of serializing two multi-stage mines
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val aF = Future { canon(pairsA).localCheckpoint(true) }
    val bF = Future { canon(pairsB).localCheckpoint(true) }
    val a = Await.result(aF, Duration.Inf)
    val b = Await.result(bF, Duration.Inf)
    val both = a.join(b, Seq("__a", "__b"))
    val counts = a.agg(count(lit(1)).as("n_a"))
      .crossJoin(b.agg(count(lit(1)).as("n_b")))
      .crossJoin(both.agg(count(lit(1)).as("n_both")))
    val p6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val mD = col("n_both").cast("double")
    counts.select(col("n_a"), col("n_b"), col("n_both"),
      when(col("n_both") > 0, p6(naD * nbD / mD))
        .otherwise(lit(null).cast("double")).as("est_total6"),
      when(col("n_both") > 0 && col("n_b") > 0, p6(mD / nbD))
        .otherwise(lit(null).cast("double")).as("recall_a6"),
      when(col("n_both") > 0 && col("n_a") > 0, p6(mD / naD))
        .otherwise(lit(null).cast("double")).as("recall_b6"))
  }
}
