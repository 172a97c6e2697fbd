package graft

/** Plan-shape assertions (SURVEY "optimize for scale"): filters reach
  * the parquet scan, scans are column-pruned, tiny dims broadcast,
  * top-k compiles to TakeOrderedAndProject, and hot paths stay inside
  * whole-stage codegen.
  */
class PlanSpec extends SparkSuiteBase {

  private def plan(name: String): String =
    Queries.all(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q02 filter pushdown reaches the parquet scan") {
    val p = plan("q02_filter_predicates")
    assert(p.contains("PushedFilters: [IsNotNull(p_type)")
      && p.contains("Not(StringContains(p_type,BRAS"))
  }

  test("q01 scan is pruned to referenced columns") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_shipdate"), "projection-only query must not read l_shipdate")
  }

  test("q07 joins dims via broadcast with pruned scans") {
    val p = plan("q07_join_star")
    assert(p.contains("BroadcastHashJoin"))
    // lineitem scan pruned to the 3 referenced columns
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"))
  }

  test("q14 top-k compiles to TakeOrderedAndProject") {
    assert(plan("q14_topk").contains("TakeOrderedAndProject"))
  }

  test("q03 aggregate is partial+final (map-side combine)") {
    val p = plan("q03_agg_q1")
    assert(p.contains("partial_sum") || p.contains("Partial"))
  }

  test("q17 as-of join is one key shuffle + window, no join operator") {
    val p = plan("q17_asof_join")
    assert(p.contains("Window "))
    assert(!p.contains("Join"), "as-of must not plan a join")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1, s"expected exactly 1 key shuffle, got $hashExchanges")
  }

  test("minhash signatures shuffle exactly once (doc key), no distinct exchange") {
    val sig = graft.operators.Dedup.minhashSignatures(
      Tables.documents(spark, sfDir), "doc_id", "text", 3, 16)
    val p = sig.queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1, s"expected exactly 1 exchange, got $hashExchanges\n$p")
    assert(p.contains("partial_min"), "map-side partial aggregation must run")
    // the lane fold is k plain `min`s (whole-stage codegen, fixed-width
    // buffer), not a UDAF — an ObjectHashAggregate here means the
    // encoder-round-trip aggregator crept back into the hot path
    assert(!p.contains("ObjectHashAggregate"),
      s"signature fold must be a codegen HashAggregate:\n$p")
  }

  test("q35 simhash scores inside the join: hamming predicate in the join condition") {
    val p = plan("q35_simhash")
    // the cheap codegen'd bit_count(xor) must gate rows in the join
    // itself, not in a post-shuffle filter
    val joinLine = p.linesIterator.find(l => l.contains("Join") && l.contains("chunk"))
    assert(joinLine.exists(_.contains("bit_count")), s"hamming not in join condition:\n$p")
  }

  test("q46 IVF candidate generation is a cell equi-join, no cartesian") {
    val p = plan("q46_ivf_ann")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"IVF must not plan an all-pairs join:\n$p")
    assert(p.contains("Join [cell"), s"expected a cell equi-join:\n$p")
  }

  test("jaccard pair mining caps by hash aggregate (no window sort) and computes the shingle frame once") {
    // the registered q33 now reads the MATERIALIZED Dedup.Stage pair
    // frame (its plan is a flat ExistingRDD scan — exactly the point
    // of staging), so the mining plan shape is asserted on the miner
    // itself, which is what the stage executes on first access
    val df = graft.operators.Dedup.ngramJaccardPairs(
      Tables.documents(spark, sfDir), "doc_id", "text", "lang",
      n = 3, threshold = 0.8)
    df.collect() // AQE finalizes reuse at execution
    val p = df.queryExecution.executedPlan.toString
    // the DF cap / set-size must be hash aggregates joined back, not
    // window passes: a window is a full sort of the exploded shingle
    // frame per pass — the round-2 gate's 9x variance source
    assert(!p.contains("Window "), s"q33 must not plan a window pass:\n$p")
    assert(p.contains("ReusedExchange"),
      s"capped shingle frame must be computed once across the self-join:\n$p")
  }

  test("staged q33/q47/q62 read the materialized pair frame, not a re-derived mining subtree") {
    PipelineQueries.resetDedupStage(spark, sfDir)
    Queries.all("q33_ngram_jaccard")(spark, sfDir).collect()
    // with the stage warm, neither clusters nor survivors re-explode
    // the corpus: no Generate (explode) node anywhere in their plans
    Seq("q47_dedup_clusters", "q62_cluster_survivors").foreach { q =>
      val p = Queries.all(q)(spark, sfDir)
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("Generate"),
        s"$q must reuse the staged pairs, found a shingle explode:\n$p")
    }
  }

  test("q58 quality filter is a single-scan projection: no join, no window") {
    val p = plan("q58_quality_filter")
    // every signal is row-local; a corpus-sized self-join here was a
    // reviewed-out regression — keep it out
    assert(!p.contains("Join"), s"q58 must not plan a join:\n$p")
    assert(!p.contains("Window "), s"q58 must not plan a window:\n$p")
  }

  test("q60 reads through the DSv2 envelope connector (BatchScan in the plan)") {
    val p = plan("q60_envelope_scan")
    assert(p.contains("BatchScan") && p.contains("pulsar-envelope"),
      s"q60 must scan through the connector:\n$p")
    // aggregation over the connector still map-side combines
    assert(p.contains("HashAggregate"))
  }

  test("q34 LSH self-join reuses the signature exchange (computed once)") {
    val df = Queries.all("q34_minhash_lsh")(spark, sfDir)
    df.collect() // AQE finalizes reuse at execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"signature pipeline must be computed once across the self-join:\n$p")
  }

  test("incremental append's candidate generation stays an equi-join") {
    // the restricted miner joins restrict x index on (blk, shingle) —
    // the plan must never degrade to a cartesian or nested-loop
    // product no matter how AQE sizes the sides (the 10^8-doc safety
    // property the delta path inherits from the full miner)
    PipelineQueries.resetDedupStage(spark, sfDir)
    val df = Queries.all("q75_incremental_dedup")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"delta mining must stay equi-keyed:\n$p")
  }

  test("semantic dedup pairs through a cell equi-join, never all-pairs") {
    // the SemDeDup pass is sub-quadratic BECAUSE candidates come from
    // an equi-join on the cell id — a cartesian/nested-loop fallback
    // would silently reintroduce the global all-pairs it exists to
    // avoid
    val df = Queries.all("q84_semantic_dedup")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"semantic dedup must stay cell-equi-keyed:\n$p")
  }

  test("routed pair-mining arms stay equi-keyed: cell, bucket, (tbl, bucket)") {
    // the r16 scale arms of q36's router — each candidate join must
    // key on its blocking column(s); a nested-loop fallback would
    // reintroduce the global all-pairs the arms exist to avoid
    for (name <- Seq("q272_bucketed_neardup", "q273_multiband_neardup",
        "q274_cell_neardup")) {
      val df = Queries.all(name)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct")
        && !p.contains("BroadcastNestedLoopJoin"),
        s"$name must stay blocking-equi-keyed:\n$p")
    }
  }

  test("BPE training is pure aggregation; encoding joins are equi-joins") {
    val train = Queries.all("q77_bpe_train")(spark, sfDir)
    train.collect()
    // the merge table itself is driver-assembled from per-round
    // aggregates — its plan must be a LocalTableScan, no join at all
    val tp = train.queryExecution.executedPlan.toString
    assert(tp.contains("LocalTableScan"), s"merge table plan:\n$tp")
    val enc = Queries.all("q78_bpe_encode")(spark, sfDir)
    enc.collect()
    val ep = enc.queryExecution.executedPlan.toString
    assert(!ep.contains("CartesianProduct")
      && !ep.contains("BroadcastNestedLoopJoin"),
      s"vocabulary joins must stay equi-keyed:\n$ep")
  }

  test("NB scoring is one token equi-join with map-side combined aggregates") {
    val p = plan("q85_nb_quality")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"token join must stay equi-keyed:\n$p")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"(doc, token) counts must map-side combine:\n$p")
    // one model, one corpus pass: the per-token log-odds are computed
    // in a projection, not a second aggregate over the corpus
    assert(!p.contains("Window "), s"q85 must not plan a window:\n$p")
  }

  test("shuffle-shard and temperature mix never plan a global window or join") {
    // q86's global rank is the range-partitioned prefix sum: its only
    // window is partitioned by the pid column, never a global
    // (empty-partition-spec) sort
    val p86 = Queries.all("q86_shuffle_shard")(spark, sfDir)
    p86.collect()
    val s86 = p86.queryExecution.executedPlan.toString
    s86.linesIterator.filter(_.contains("Window ")).foreach { l =>
      assert(l.contains("__pfx_pid"),
        s"window must partition by the prefix pid, got: $l")
    }
    // q87 ships learned thresholds as literals: the corpus pass is one
    // row-local scan — no join operator anywhere
    val s87 = plan("q87_temperature_mix")
    assert(!s87.contains("Join"), s"q87 must not plan a join:\n$s87")
  }

  test("source divergence reads ONE checkpointed (grp, token) frame") {
    // the exploded token counts are checkpointed once and feed the
    // per-source totals, the global marginal and the KL aggregate —
    // the final plan must hold NO Generate (explode) node at all: a
    // re-derived explode would re-tokenize the corpus up to three
    // times
    val p = plan("q91_source_divergence")
    assert(!p.contains("Generate"),
      s"tokenization must not be re-derived past the checkpoint:\n$p")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"marginal joins must stay equi-keyed:\n$p")
  }

  test("substring dedup joins on the gram hash; islands window per doc") {
    val p = plan("q92_substring_dedup")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"duplicated-gram join must stay equi-keyed:\n$p")
    // the island merge partitions by document — a global (empty
    // partition spec) window would single-task the whole corpus
    p.linesIterator.filter(_.contains("Window ")).foreach { l =>
      assert(l.contains("__doc"),
        s"island windows must partition by doc, got: $l")
    }
  }

  test("substring strip anti-joins on doc; re-assembly is sort-free") {
    val p = plan("q94_substring_strip")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"span strip must anti-join on the doc key:\n$p")
    // the only windows are the embedded span miner's island merges,
    // partitioned by doc — the strip's own re-assembly is a hash
    // aggregate + row-local array_sort, and nothing plans a global
    // (empty-partition-spec) window
    p.linesIterator.filter(_.contains("Window ")).foreach { l =>
      assert(l.contains("__doc"),
        s"windows must partition by doc, got: $l")
    }
  }

  test("image and audio hash pairs mine through the chunk-bucket equi-join") {
    Seq("q93_image_phash", "q95_audio_phash").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct")
        && !p.contains("BroadcastNestedLoopJoin"),
        s"$name hamming candidates must stay bucket-equi-keyed:\n$p")
    }
  }

  test("PQ ADC scans codes against a BROADCAST probe side (q98)") {
    val p = plan("q98_pq_ann")
    // exhaustive ADC is BY DESIGN a probe×corpus scan — the scale
    // contract is that the probe side (LUT rows) broadcasts so the
    // corpus streams once with no shuffle before the top-k rank
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"probe LUTs must broadcast:\n$p")
    assert(p.contains("pqencode") || p.contains("pq_encode"),
      s"corpus codes must come from the codegen encode kernel:\n$p")
  }

  test("IVF-PQ candidates come from a cell equi-join, never all-pairs (q100)") {
    val p = plan("q100_ivfpq_ann")
    assert(p.contains("BroadcastHashJoin") && p.contains("cell"),
      s"cell routing must be a broadcast equi-join on the cell id:\n$p")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"IVF-PQ must never plan an all-pairs join:\n$p")
  }

  test("interval join is a single equi-join on the key with a range residual (q99)") {
    val p = plan("q99_interval_join")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"interval join must equi-join on user_id:\n$p")
    val joins = p.linesIterator.count(l =>
      l.contains("HashJoin") || l.contains("SortMergeJoin"))
    assert(joins == 1, s"expected exactly one join, got $joins:\n$p")
  }

  test("hot-key salted join broadcasts the hot set into both sides (q105)") {
    val p = plan("q105_skew_join")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), p)
    // the hot-key frame rides a broadcast into the big AND small side
    val bcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bcasts >= 2, s"expected >=2 broadcast joins for the hot set:\n$p")
  }

  test("PMI top-k is a TakeOrdered over equi-joined vocab frames (q107)") {
    val p = plan("q107_pmi_collocations")
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k must not be a window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // nested-loop joins only for the single-row scalar totals: one
    // crossing u_total with t_total, one broadcasting the pair onto
    // the collocation frame (vocab joins stay hash equi-joins)
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"expected only scalar-totals cross joins:\n$p")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"vocab joins must stay hash equi-joins:\n$p")
  }

  test("chunk dedup: keep-first windows on the chunk value, no self-join (q108)") {
    val p = plan("q108_chunk_dedup")
    assert(p.contains("Window") && p.contains("chunk"),
      s"keep-first must be a chunk-keyed window:\n$p")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("z-order layout is scan-side: no join, no window, no exchange before the file agg (q109)") {
    val p = plan("q109_zorder_layout")
    assert(!p.contains("Join"), s"layout assignment must not join:\n$p")
    assert(!p.contains("Window"), s"layout assignment must not window:\n$p")
  }

  test("pagerank steps are edge equi-joins over checkpointed rounds (q111)") {
    val p = plan("q111_pagerank")
    // per-round localCheckpoint truncates lineage: the final plan sees
    // one scan of the last round's frame, not 3 unrolled iterations
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Scan ExistingRDD"),
      s"rounds must be lineage-truncated:\n$p")
  }

  test("histogram quantiles: the only window runs over the bin table, not the data (q113)") {
    val p = plan("q113_histogram_quantiles")
    assert(p.contains("Window"), p)
    // the window's child aggregates to <= bins rows BEFORE the sort:
    // the plan carries a partial/final aggregate pair under the window
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortMergeJoin"),
      s"probe join must broadcast the tiny frames:\n$p")
  }

  test("BM25 filters to query tokens before the (doc, term) shuffle; df broadcasts (q115)") {
    val p = plan("q115_bm25")
    assert(p.contains("BroadcastHashJoin"), s"df frame must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not globally sort:\n$p")
    // the query-token filter sits under the tf aggregate, i.e. the
    // plan contains an IN-filter on the token column
    assert(p.contains("w#") && (p.contains("IN (") || p.contains("INSET")),
      s"query-token filter must precede the shuffle:\n$p")
  }

  test("DSIR ratio model broadcasts into the scoring join; resample is TakeOrdered (q117/q118)") {
    val p = plan("q117_dsir_weights")
    // the CORPUS-side join (doc buckets x ratio table) must broadcast;
    // the model-internal tc/rc full-outer join may sort-merge — Spark
    // cannot broadcast full-outer, and both inputs are <= buckets rows
    // by construction, so that SMJ is bounded whatever the corpus
    assert("BroadcastHashJoin.*LeftOuter".r.findFirstIn(p).isDefined,
      s"<=512-row ratio table must broadcast into the scoring join:\n$p")
    val p2 = plan("q118_dsir_resample")
    assert(p2.contains("TakeOrderedAndProject"),
      s"gumbel top-k must not globally sort:\n$p2")
  }

  test("bloom prune: semi-joins broadcast, no exchange under the prune (q119)") {
    val p = plan("q119_bloom_join")
    assert(p.contains("LeftSemi"), s"prune semis missing:\n$p")
    assert("BroadcastHashJoin.*LeftSemi".r.findFirstIn(p).isDefined,
      s"prune must ride broadcasts:\n$p")
  }

  test("RRF fusion never touches the corpus: list-sized joins only (q120)") {
    val p = plan("q120_hybrid_rrf")
    // the fused frame is two top-100 lists — the final fusion join
    // must be broadcast-sized, and the output a 20-row TakeOrdered
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("rolling z-score is one key shuffle, window + codegen only (q121)") {
    val p = plan("q121_rolling_anomaly")
    assert(p.contains("Window "), p)
    assert(!p.contains("Join"), s"no join belongs in a lag chain:\n$p")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected exactly 1 key shuffle, got $hashExchanges:\n$p")
  }

  test("multinomial draws broadcast into the containment join (q123)") {
    val p = plan("q123_multinomial_sample")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 64-draw frame must broadcast (interval predicate):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"containment join must not plan a cartesian:\n$p")
  }

  test("fuzzy join candidates come from the gram equi-join; only the short bucket may loop (q131)") {
    val p = plan("q131_fuzzy_join")
    assert(!p.contains("CartesianProduct"),
      s"long-side candidates must never plan a cartesian:\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"only the bounded short bucket may nested-loop:\n$p")
  }

  test("latest-wins upsert is a combinable aggregate, not a corpus window (q132)") {
    val p = plan("q132_upsert_latest")
    assert(!p.contains("Window"), s"no row_number window over the log:\n$p")
    assert(p.contains("partial_max") || p.contains("Partial"),
      s"expected map-side combine:\n$p")
  }

  test("grouping sets plan one Expand + one aggregate pass, not a union of scans (q136)") {
    val p = plan("q136_grouping_sets")
    assert("Expand".r.findAllIn(p).size >= 1, s"expected Expand:\n$p")
    assert("FileScan".r.findAllIn(p).size <= 1,
      s"grouping sets must not rescan per grouping:\n$p")
  }

  test("sessionize shares one key shuffle across lag, counter, and session agg (q138)") {
    val p = plan("q138_sessionize")
    // one key shuffle + (possibly) the final presentation sort
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(dataExchanges == 1,
      s"expected exactly one hash exchange, got $dataExchanges:\n$p")
  }

  test("lateral top-k decorrelates to a WindowGroupLimit + one join (q148)") {
    val p = plan("q148_lateral_topk")
    assert(p.contains("WindowGroupLimit"),
      s"per-key limit must push below the shuffle as a group limit:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the lateral must not re-execute per outer row:\n$p")
  }

  test("unpivot collapses to one Expand over a single scan (q154)") {
    val p = plan("q154_unpivot")
    assert("Expand".r.findAllIn(p).size >= 1, s"expected Expand:\n$p")
    assert("FileScan".r.findAllIn(p).size == 1,
      s"melt must not rescan per measure:\n$p")
  }

  test("partitioned layout prunes the scan to the filtered month (q157)") {
    val p = plan("q157_partition_pruning")
    assert(p.contains("PartitionFilters") && p.contains("ship_month"),
      s"expected a partition predicate at the scan:\n$p")
    // the month equality must be a PARTITION filter, not a post-scan
    // row filter (no pushed/data filter on ship_month)
    assert(!p.contains("PushedFilters: [IsNotNull(ship_month)"),
      s"month filter leaked to the data path:\n$p")
  }

  test("optimal segmentation broadcasts word tables into the corpus scan (q139)") {
    val p = plan("q139_optimal_segment")
    assert(p.contains("BroadcastHashJoin"),
      s"piece table and vocab must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-keyed merge join in the encode path:\n$p")
  }
}
