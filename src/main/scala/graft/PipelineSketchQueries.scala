package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Multimodal, QualityModel, Similarity, TextAnalysis}
import PipelineQueries.{sqlTokens, jaccardPairCtes, minhashShingleCtes, laneCoeffs, bloomCoeffs, dedupStage, scratchDir, sweepDeadEntries}

/** Sketches, storage-layout and mid-pipeline operators (SURVEY §2B
  * R-19/R-20/R-21 continued): subsequence search, heavy hitters /
  * HLL / KMV sketches, skew handling, Z-order + partition-pruning
  * layouts, graph construction, tokenizer variants (WordPiece),
  * selection/packing — split from [[PipelineQueries]] along the
  * family seam (registrations are order-independent: the registry
  * is name-keyed).
  */
object PipelineSketchQueries extends QueryGroup {
  // Time-series subsequence similarity search (EDBT'19/REPOSE family):
  // per user, the 3 sliding windows of the (ts, event_id)-ordered
  // value series most correlated with a rising ramp pattern [1..8] —
  // trend/motif detection over metric streams. One per-key shuffle,
  // w-1 lead() columns, explicit left-associative sum chains (NOT
  // aggregates) so both engines run the identical IEEE op sequence —
  // the corr and the zero-variance guard decide bit-identically.
  q("q102_subseq_search",
    """WITH s AS (SELECT user_id, value::DOUBLE AS x0,
      |    row_number() OVER w AS rn,
      |    lead(value::DOUBLE, 1) OVER w AS x1,
      |    lead(value::DOUBLE, 2) OVER w AS x2,
      |    lead(value::DOUBLE, 3) OVER w AS x3,
      |    lead(value::DOUBLE, 4) OVER w AS x4,
      |    lead(value::DOUBLE, 5) OVER w AS x5,
      |    lead(value::DOUBLE, 6) OVER w AS x6,
      |    lead(value::DOUBLE, 7) OVER w AS x7
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (SELECT user_id, CAST(rn AS BIGINT) AS start_pos,
      |        x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 AS sx,
      |        x0*x0 + x1*x1 + x2*x2 + x3*x3 + x4*x4 + x5*x5 + x6*x6 + x7*x7 AS sxx,
      |        x0*1.0 + x1*2.0 + x2*3.0 + x3*4.0 + x4*5.0 + x5*6.0 + x6*7.0 + x7*8.0 AS sxy
      |      FROM s WHERE x0 IS NOT NULL AND x1 IS NOT NULL AND x2 IS NOT NULL
      |        AND x3 IS NOT NULL AND x4 IS NOT NULL AND x5 IS NOT NULL
      |        AND x6 IS NOT NULL AND x7 IS NOT NULL),
      |c AS (SELECT user_id, start_pos,
      |        floor((8.0*sxy - sx*36.0) / (sqrt(8.0*sxx - sx*sx) * sqrt(336.0))
      |          * 1000000.0 + 0.5) / 1000000.0 AS corr6
      |      FROM f WHERE 8.0*sxx - sx*sx > 0),
      |r AS (SELECT user_id, start_pos, corr6,
      |        row_number() OVER (PARTITION BY user_id
      |          ORDER BY corr6 DESC, start_pos) AS rnk FROM c)
      |SELECT user_id, rnk, start_pos, corr6 FROM r WHERE rnk <= 3
      |ORDER BY user_id, rnk""".stripMargin) { (s, d) =>
    graft.operators.TimeSeries.subsequenceSearch(
        Tables.events(s, d), "user_id", "ts", "event_id", "value",
        pattern = (1 to 8).map(_.toDouble), k = 3)
      .orderBy(col("user_id"), col("rnk"))
  }

  // R-21/R-4 at sketch scale: Count-Min heavy hitters — the
  // fixed-memory alternative to q30's exact token groupBy (shuffle
  // volume = tasks × lanes × width regardless of corpus/vocabulary).
  // Same lane-coefficient discipline as q97's Bloom filter: driver
  // literals in both the plan and this SQL. est ≥ exact always (the
  // sketch's one-sided error), so the τ-report has no false negatives.
  q("q103_heavy_hitters", {
    val aL = bloomCoeffs._1.mkString("[", ",", "]")
    val bL = bloomCoeffs._2.mkString("[", ",", "]")
    s"""WITH tk AS (SELECT unnest($sqlTokens) AS token FROM documents),
       |h AS (SELECT token,
       |        CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
       |          % 2147483647 AS h
       |      FROM tk),
       |lb AS (SELECT h, i,
       |         ($aL[i+1] * h + $bL[i+1]) % 2147483647 % 1024 AS bucket
       |       FROM h CROSS JOIN (SELECT unnest(range(0, 4)) AS i)),
       |cm AS (SELECT i, bucket, count(*) AS c FROM lb GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT token, h FROM h),
       |cl AS (SELECT token, i,
       |         ($aL[i+1] * h + $bL[i+1]) % 2147483647 % 1024 AS bucket
       |       FROM cand CROSS JOIN (SELECT unnest(range(0, 4)) AS i)),
       |est AS (SELECT token, min(c) AS est
       |        FROM cl JOIN cm USING (i, bucket) GROUP BY token)
       |SELECT token, est FROM est WHERE est >= 500
       |ORDER BY token""".stripMargin }) { (s, d) =>
    graft.operators.Sketches.heavyHitters(
        Tables.documents(s, d), "text",
        lanes = 4, width = 1024, minCount = 500L)
      .orderBy(col("token"))
  }

  // Scale-path skewed aggregation on the oracle surface: the salted
  // two-phase sum (ScaleOps.saltedSumAgg) must be invisible in the
  // result — the oracle is the plain GROUP BY.
  q("q112_skew_agg",
    s"""SELECT user_id,
       |  ${sqlRound("sum(value)", 4)} AS sum_value
       |FROM events GROUP BY user_id
       |ORDER BY user_id""".stripMargin) { (s, d) =>
    graft.operators.ScaleOps.saltedSumAgg(
        Tables.events(s, d), "user_id", "value", salts = 8)
      .select(col("user_id"), pround(col("sum_value"), 4).as("sum_value"))
      .orderBy(col("user_id"))
  }

  // R-4 at sketch scale: fixed-bin histogram quantiles — the
  // bounded-state alternative to q89's exact global rank (state =
  // 1024 counters however large the input; the estimate is within one
  // bin width of exact by construction).
  q("q113_histogram_quantiles",
    """WITH mm AS (SELECT min(value) AS lo, max(value) AS hi,
      |              CAST(count(*) AS DOUBLE) AS n FROM events),
      |b AS (SELECT least(CAST(floor((value - lo) / ((hi - lo) / 1024.0))
      |         AS BIGINT), 1023) AS bin
      |      FROM events CROSS JOIN mm),
      |bc AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
      |cum AS (SELECT bin,
      |          sum(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
      |        FROM bc),
      |qs AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
      |pick AS (SELECT q, min(bin) AS bin
      |         FROM qs CROSS JOIN mm JOIN cum
      |           ON cum.cum >= CAST(ceil(q * n) AS BIGINT)
      |         GROUP BY q)
      |SELECT q, bin,
      |  floor((lo + (bin + 1) * ((hi - lo) / 1024.0)) * 1000000.0 + 0.5)
      |    / 1000000.0 AS est
      |FROM pick CROSS JOIN mm
      |ORDER BY q""".stripMargin) { (s, d) =>
    graft.operators.Sketches.histogramQuantiles(
        Tables.events(s, d), "value", bins = 1024,
        probs = Seq(0.5, 0.9, 0.99))
      .orderBy(col("q"))
  }

  /** One persisted chunk-dedup index per (session, dir): the memoized
    * first call builds over the id-low 80% of the corpus; every later
    * call (and every bench rep) pays ONLY the append of the id-high
    * 20% — the id-monotone crawl-append shape the operator contracts.
    */
  private val chunkIndexDirs = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), (String, Long)]

  private def chunkIncrementalAppend(s: org.apache.spark.sql.SparkSession,
      d: String): graft.operators.IncrementalChunkDedup.Appended = {
    sweepDeadEntries(chunkIndexDirs)
    val (base, cutoff) = chunkIndexDirs.computeIfAbsent((s, d), _ => {
      val dir = scratchDir("graft-incchunk")
      val docs = Tables.documents(s, d)
      val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
      val cut = maxId * 4 / 5
      graft.operators.IncrementalChunkDedup.buildIndex(
        docs.filter(col("doc_id") <= cut), "doc_id", "text",
        chunkWords = 3, dir = s"$dir/base")
      (dir, cut)
    })
    graft.operators.IncrementalChunkDedup.append(
      Tables.documents(s, d).filter(col("doc_id") > cutoff),
      "doc_id", "text", s"$base/base", s"$base/appended")
  }

  // R-19 operationalized at chunk granularity: delta chunk-dedup
  // against the persisted winner index — build over the id-low 80%,
  // absorb the id-high 20% with delta-sized work (keep-first is
  // monotone, so persisted outputs never change and the winner frame
  // rotates with pure hardlink carries + inserts). The oracle is
  // q108's full re-mine verbatim: the hash-match IS the
  // "full re-mine ≡ index + delta" assertion.
  q("q116_incremental_chunk_dedup",
    s"""WITH toks AS (SELECT doc_id, $sqlTokens AS l FROM documents),
       |ch AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
       |         array_to_string(l[(i*3+1):(i*3+3)], ' ') AS chunk
       |       FROM toks CROSS JOIN
       |         unnest(generate_series(0,
       |           CAST(ceil(len(l)/3.0) AS BIGINT) - 1)) AS t(i)),
       |k AS (SELECT doc_id, pos, chunk FROM (
       |        SELECT doc_id, pos, chunk, row_number() OVER (
       |          PARTITION BY chunk ORDER BY doc_id, pos) AS rn FROM ch)
       |      WHERE rn = 1),
       |ka AS (SELECT doc_id, count(*) AS n_kept,
       |         string_agg(chunk, ' ' ORDER BY pos) AS text_dedup
       |       FROM k GROUP BY doc_id),
       |tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(ka.text_dedup, '') AS text_dedup,
       |  coalesce(ka.n_kept, 0) AS n_kept,
       |  coalesce(tot.n_chunks, 0) - coalesce(ka.n_kept, 0) AS n_dropped
       |FROM documents d
       |LEFT JOIN tot USING (doc_id) LEFT JOIN ka USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    chunkIncrementalAppend(s, d).outputs
      .orderBy(col("doc_id"))
  }

  // R-21 retrieval: BM25 scoring against a literal query — the sparse
  // twin of the dense ANN top-k (Lucene k1=1.2/b=0.75 constants as
  // parsed literals; ln follows the q51/q85 libm precedent).
  q("q115_bm25",
    s"""WITH toks AS (SELECT doc_id, unnest($sqlTokens) AS w FROM documents),
       |dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       |stats AS (SELECT (SELECT count(*) FROM documents) AS n,
       |            (SELECT sum(dl) * 1.0 / count(*) FROM dls) AS avgdl),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks
       |       WHERE w IN ('spark', 'join', 'stream') GROUP BY doc_id, w),
       |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
       |sc AS (SELECT tf.doc_id,
       |         ln((n - df + 0.5) / (df + 0.5) + 1.0) *
       |           ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
       |           AS t
       |       FROM tf JOIN df USING (w) JOIN dls USING (doc_id)
       |       CROSS JOIN stats),
       |agg AS (SELECT doc_id, floor(sum(t) * 1000000.0 + 0.5) / 1000000.0
       |          AS score
       |        FROM sc GROUP BY doc_id)
       |SELECT doc_id, score FROM agg
       |ORDER BY score DESC, doc_id
       |LIMIT 20""".stripMargin) { (s, d) =>
    TextAnalysis.bm25(Tables.documents(s, d), "doc_id", "text",
      queryTokens = Seq("spark", "join", "stream"), topK = 20)
  }

  // R-5/R-20 at sketch scale: oracle-portable HyperLogLog — the third
  // exact-replay sketch next to q97's Bloom and q103's Count-Min.
  // Registers from md5 bit arithmetic; the harmonic sum is an EXACT
  // scaled-integer sum (dyadic sums in double round by add order,
  // which neither engine orders). Raw estimator only; exact count
  // carried as accuracy evidence.
  q("q114_hll_distinct",
    s"""WITH tk AS (SELECT doc_id, $sqlTokens AS l FROM documents),
       |sh AS (SELECT unnest(list_transform(generate_series(1, len(l) - 2),
       |              i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
       |       FROM tk),
       |h AS (SELECT CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h
       |      FROM sh),
       |b AS (SELECT h & 255 AS bucket, h >> 8 AS rest FROM h),
       |r AS (SELECT bucket,
       |        least(CASE WHEN rest = 0 THEN 53
       |          ELSE bit_count((rest & -rest) - 1) + 1 END, 50) AS rho
       |      FROM b),
       |rg AS (SELECT bucket, max(rho) AS reg FROM r GROUP BY bucket),
       |ss AS (SELECT sum(1::BIGINT << (50 - reg)) AS sp, count(*) AS np
       |       FROM rg),
       |ex AS (SELECT count(DISTINCT s) AS exact FROM sh)
       |SELECT np AS n_buckets,
       |  floor((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 /
       |    ((sp + (256 - np) * (1::BIGINT << 50)) / 1125899906842624.0)
       |    * 100.0 + 0.5) / 100.0 AS est,
       |  exact
       |FROM ss CROSS JOIN ex""".stripMargin) { (s, d) =>
    graft.operators.Sketches.hllDistinct(
      Tables.documents(s, d), "text", shingleN = 3, m = 256)
  }

  // R-19 link analytics: PageRank over the mined near-dup pair graph
  // (Brin-Page power steps; the quality-propagation recipe behind
  // host/document importance weighting in web-corpus curation). Every
  // iteration rounds at 6dp in BOTH engines so float summation order
  // cannot drift across iterations; the oracle unrolls the 3 power
  // steps as CTEs over the same staged pair frame.
  q("q111_pagerank",
    s"""WITH $jaccardPairCtes,
       |ed AS (SELECT id_a AS src, id_b AS dst FROM pr
       |       UNION ALL SELECT id_b, id_a FROM pr),
       |dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |p0 AS (SELECT doc_id, floor(1.0 / n * 1000000.0 + 0.5)/1000000.0 AS pg
       |       FROM documents CROSS JOIN nn),
       |s1 AS (SELECT ed.dst AS doc_id, sum(p.pg / dg.deg) AS sm
       |       FROM ed JOIN p0 p ON p.doc_id = ed.src
       |            JOIN dg ON dg.src = ed.src GROUP BY ed.dst),
       |i1 AS (SELECT d.doc_id,
       |         floor(((1.0 - 0.85) / n + 0.85 * coalesce(s1.sm, 0)) * 1000000.0
       |           + 0.5)/1000000.0 AS pg
       |       FROM documents d CROSS JOIN nn LEFT JOIN s1 USING (doc_id)),
       |s2 AS (SELECT ed.dst AS doc_id, sum(p.pg / dg.deg) AS sm
       |       FROM ed JOIN i1 p ON p.doc_id = ed.src
       |            JOIN dg ON dg.src = ed.src GROUP BY ed.dst),
       |i2 AS (SELECT d.doc_id,
       |         floor(((1.0 - 0.85) / n + 0.85 * coalesce(s2.sm, 0)) * 1000000.0
       |           + 0.5)/1000000.0 AS pg
       |       FROM documents d CROSS JOIN nn LEFT JOIN s2 USING (doc_id)),
       |s3 AS (SELECT ed.dst AS doc_id, sum(p.pg / dg.deg) AS sm
       |       FROM ed JOIN i2 p ON p.doc_id = ed.src
       |            JOIN dg ON dg.src = ed.src GROUP BY ed.dst),
       |i3 AS (SELECT d.doc_id,
       |         floor(((1.0 - 0.85) / n + 0.85 * coalesce(s3.sm, 0)) * 1000000.0
       |           + 0.5)/1000000.0 AS pg
       |       FROM documents d CROSS JOIN nn LEFT JOIN s3 USING (doc_id))
       |SELECT doc_id, pg FROM i3
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.GraphOps.pageRank(
        Tables.documents(s, d), dedupStage(s, d).pairs,
        "doc_id", "id_a", "id_b", iterations = 3, damping = 0.85)
      .select(col("doc_id"), col("pr").as("pg"))
      .orderBy(col("doc_id"))
  }

  // R-20 dimensionality cut: Johnson-Lindenstrauss projection onto 16
  // md5-derived +-1 directions (Achlioptas), emitted as fixed-point
  // 1e-6 units so the portable form never trusts double->string
  // formatting. Row-local — the operator adds zero shuffles.
  q("q110_random_projection",
    """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |             unnest(embedding)::DOUBLE AS x FROM embeddings),
      |s AS (SELECT j, i,
      |        CASE WHEN CAST('0x' || substr(md5('rp' || j || '_' || (i-1)), 1, 15)
      |          AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END AS sgn
      |      FROM (SELECT unnest(range(0, 16)) AS j)
      |      CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
      |p AS (SELECT vec_id, j,
      |        CAST(floor(sum(x * sgn) / sqrt(16.0) * 1000000.0 + 0.5)
      |          AS BIGINT) AS ym
      |      FROM u JOIN s USING (i) GROUP BY vec_id, j)
      |SELECT vec_id, string_agg(CAST(ym AS VARCHAR), ',' ORDER BY j) AS y_csv
      |FROM p GROUP BY vec_id
      |ORDER BY vec_id""".stripMargin) { (s, d) =>
    Similarity.randomProject(Tables.embeddings(s, d), "vec_id", "embedding",
        outDims = 16, inDims = 64)
      .select(col("vec_id"),
        concat_ws(",", transform(col("y_micro"), c => c.cast("string")))
          .as("y_csv"))
      .orderBy(col("vec_id"))
  }

  // Scale-path data layout: Z-order (Morton) file assignment over
  // (user_id, event day) — each of 64 files covers a near-rectangular
  // 2-D box, so a 2-D selection prunes to intersecting files (the
  // OPTIMIZE ZORDER BY trick as a deterministic column; pruning
  // factor asserted in ScaleOpsSpec). Output = per-file bounding-box
  // stats, i.e. exactly the metadata a reader would prune on.
  q("q109_zorder_layout",
    """WITH e AS (SELECT event_id, user_id,
      |        CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day
      |      FROM events),
      |mm AS (SELECT min(user_id) AS mina, max(user_id) AS maxa,
      |              min(day) AS minb, max(day) AS maxb FROM e),
      |q AS (SELECT event_id, user_id, day,
      |        CAST(floor(CAST(user_id - mina AS DOUBLE) * 1024.0
      |          / (maxa - mina + 1)) AS BIGINT) AS ba,
      |        CAST(floor(CAST(day - minb AS DOUBLE) * 1024.0
      |          / (maxb - minb + 1)) AS BIGINT) AS bb
      |      FROM e CROSS JOIN mm),
      |zb AS (SELECT event_id, user_id, day,
      |         sum((((ba >> i) & 1) << (2*i)) + (((bb >> i) & 1) << (2*i+1)))
      |           AS zval
      |       FROM q CROSS JOIN (SELECT unnest(range(0, 16)) AS i)
      |       GROUP BY event_id, user_id, day),
      |f AS (SELECT user_id, day,
      |        CAST(floor(zval * 64.0 / 1048576.0) AS BIGINT) AS file
      |      FROM zb)
      |SELECT file, count(*) AS n_rows,
      |  min(user_id) AS min_user, max(user_id) AS max_user,
      |  min(day) AS min_day, max(day) AS max_day
      |FROM f GROUP BY file
      |ORDER BY file""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
      floor(unix_millis(col("ts")).cast("double") / lit(86400000.0))
        .cast("long").as("day"))
    graft.operators.ScaleOps.zorderLayout(e, "user_id", "day",
        bins = 1024, numFiles = 64)
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy(col("file"))
  }

  // R-19 at sub-document granularity: chunk-level exact dedup with
  // reassembly (RefinedWeb's line-dedup adapted to line-less text) —
  // every 3-token chunk survives only at its first corpus-wide
  // occurrence; documents are re-assembled from what survives.
  q("q108_chunk_dedup",
    s"""WITH toks AS (SELECT doc_id, $sqlTokens AS l FROM documents),
       |ch AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
       |         array_to_string(l[(i*3+1):(i*3+3)], ' ') AS chunk
       |       FROM toks CROSS JOIN
       |         unnest(generate_series(0,
       |           CAST(ceil(len(l)/3.0) AS BIGINT) - 1)) AS t(i)),
       |k AS (SELECT doc_id, pos, chunk FROM (
       |        SELECT doc_id, pos, chunk, row_number() OVER (
       |          PARTITION BY chunk ORDER BY doc_id, pos) AS rn FROM ch)
       |      WHERE rn = 1),
       |ka AS (SELECT doc_id, count(*) AS n_kept,
       |         string_agg(chunk, ' ' ORDER BY pos) AS text_dedup
       |       FROM k GROUP BY doc_id),
       |tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(ka.text_dedup, '') AS text_dedup,
       |  coalesce(ka.n_kept, 0) AS n_kept,
       |  coalesce(tot.n_chunks, 0) - coalesce(ka.n_kept, 0) AS n_dropped
       |FROM documents d
       |LEFT JOIN tot USING (doc_id) LEFT JOIN ka USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    Dedup.chunkDedup(Tables.documents(s, d), "doc_id", "text",
        chunkWords = 3)
      .orderBy(col("doc_id"))
  }

  // R-21 corpus analysis: PMI collocations — top adjacent word pairs
  // by lift p(w1 w2)/(p(w1)p(w2)), the pass behind multi-word-token
  // vocabulary building. Log-free (log is monotone; libm last-ulp
  // behavior differs across engines) with one fixed-order IEEE
  // mul/div chain both engines run verbatim.
  q("q107_pmi_collocations",
    s"""WITH toks AS (SELECT doc_id, $sqlTokens AS l FROM documents),
       |uni AS (SELECT unnest(l) AS word FROM toks),
       |uc AS (SELECT word, count(*) AS c FROM uni GROUP BY word),
       |bg AS (SELECT unnest(list_transform(generate_series(1, len(l) - 1),
       |              i -> l[i] || ' ' || l[i+1])) AS bg FROM toks),
       |bc AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY bg),
       |tot AS (SELECT (SELECT sum(c) FROM uc) AS u_total,
       |               (SELECT sum(c12) FROM bc) AS t_total),
       |sc AS (SELECT string_split(bg, ' ')[1] AS w1,
       |              string_split(bg, ' ')[2] AS w2, c12,
       |         floor(c12::DOUBLE / t_total * u_total / w1c.c * u_total / w2c.c
       |           * 1000000.0 + 0.5) / 1000000.0 AS lift
       |       FROM bc CROSS JOIN tot
       |       JOIN uc w1c ON w1c.word = string_split(bg, ' ')[1]
       |       JOIN uc w2c ON w2c.word = string_split(bg, ' ')[2]
       |       WHERE c12 >= 5)
       |SELECT w1, w2, c12, lift FROM sc
       |ORDER BY lift DESC, w1, w2
       |LIMIT 50""".stripMargin) { (s, d) =>
    TextAnalysis.pmiCollocations(Tables.documents(s, d), "text",
      minCount = 5L, topK = 50)
  }

  // R-20 at graph granularity: kNN-graph construction — every
  // vector's top-5 neighbors by 6-dp cosine, candidates bounded to
  // the vector's IVF cell (same assignment replay as q84; never a
  // global N^2 cross join). The adjacency list downstream clustering
  // and SemDeDup-style pruning consume.
  q("q106_knn_graph",
    """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |             unnest(embedding)::DOUBLE AS x FROM embeddings),
      |nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nr FROM u GROUP BY vec_id),
      |nc AS (SELECT greatest(8, CAST(ceil(count(*) / 100.0) AS BIGINT)) AS cells
      |       FROM embeddings),
      |cent AS (SELECT cvid, CAST(rn - 1 AS INT) AS cell FROM (
      |           SELECT vec_id AS cvid,
      |             row_number() OVER (ORDER BY vec_id) AS rn FROM embeddings)
      |         WHERE rn <= (SELECT cells FROM nc)),
      |vc0 AS (SELECT a.vec_id AS vid, c.cell AS cell, c.cvid AS cvid,
      |          sum(a.x * b.x) AS dp
      |        FROM u a JOIN cent c ON true
      |        JOIN u b ON b.vec_id = c.cvid AND a.i = b.i
      |        GROUP BY 1, 2, 3),
      |vc AS (SELECT vid, cell,
      |         floor((dp / (x.nr * y.nr)) * 1000000.0 + 0.5) / 1000000.0 AS ccos
      |       FROM vc0 JOIN nrm x ON x.vec_id = vid JOIN nrm y ON y.vec_id = cvid),
      |assign AS (SELECT vid, cell FROM (
      |  SELECT vid, cell, row_number() OVER (PARTITION BY vid
      |           ORDER BY (1.0 - ccos) ASC, cell) AS rn FROM vc) WHERE rn = 1),
      |p AS (SELECT a.vid AS xid, b.vid AS yid
      |      FROM assign a JOIN assign b USING (cell) WHERE b.vid <> a.vid),
      |pd AS (SELECT xid, yid, sum(xu.x * yu.x) AS dp
      |       FROM p JOIN u xu ON xu.vec_id = xid
      |              JOIN u yu ON yu.vec_id = yid AND xu.i = yu.i
      |       GROUP BY 1, 2),
      |pc AS (SELECT xid, yid,
      |         floor((dp / (x.nr * y.nr)) * 1000000.0 + 0.5) / 1000000.0 AS cos
      |       FROM pd JOIN nrm x ON x.vec_id = xid JOIN nrm y ON y.vec_id = yid),
      |r AS (SELECT xid, yid, cos, row_number() OVER (PARTITION BY xid
      |        ORDER BY cos DESC, yid) AS rnk FROM pc)
      |SELECT xid AS vec_id, rnk, yid AS neighbor_id, cos
      |FROM r WHERE rnk <= 5
      |ORDER BY vec_id, rnk""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    Similarity.knnGraph(e, "vec_id", "embedding",
        numCells = Similarity.autoCells(e.count()), k = 5)
      .orderBy(col("vec_id"), col("rnk"))
  }

  // Scale-path skew join on the oracle surface: hot-key-targeted
  // salting (ScaleOps.hotKeySaltedJoin — only keys with big-side
  // frequency >= 35 are salted; the dim side replicates only for
  // those). Salting never changes the join multiset, so the oracle is
  // the PLAIN inner join — the gate proves the skew machinery is
  // invisible in the result, which is the whole contract.
  // l_quantity is integral-valued in the fixture, so the sum is exact
  // in double and casts to BIGINT without a rounding hazard.
  q("q105_skew_join",
    """SELECT p_brand, count(*) AS n_li,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p_partkey"), col("l_quantity"))
    val small = Tables.part(s, d).select("p_partkey", "p_brand")
    graft.operators.ScaleOps.hotKeySaltedJoin(
        big, small, "p_partkey", salts = 8, hotThreshold = 35L)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_li"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
      .orderBy(col("p_brand"))
  }

  // ------------------------------------------------------- round 12

  /** Shared DSIR CTE chain (q117/q118): hashed-unigram buckets of the
    * q64-convention TARGET slice (doc_id%20=0) vs the RAW rest, the
    * ≤512-row smoothed log-ratio table, and the per-(raw doc, bucket)
    * counts — the exact relational replay of
    * [[graft.operators.Importance.logWeights]].
    */
  private val dsirCtes: String =
    s"""tk117 AS (SELECT doc_id, $sqlTokens AS l FROM documents),
       |bk AS (SELECT doc_id,
       |         CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 512 AS b
       |       FROM (SELECT doc_id, unnest(l) AS w FROM tk117)),
       |tc AS (SELECT b, count(*) AS ct FROM bk WHERE doc_id % 20 = 0
       |       GROUP BY b),
       |rc AS (SELECT b, count(*) AS cr FROM bk WHERE doc_id % 20 <> 0
       |       GROUP BY b),
       |tot AS (SELECT
       |    (SELECT count(*) FROM bk WHERE doc_id % 20 = 0) AS nt,
       |    (SELECT count(*) FROM bk WHERE doc_id % 20 <> 0) AS nr),
       |lr AS (SELECT coalesce(tc.b, rc.b) AS b,
       |         ln((coalesce(ct, 0) + 1.0) * (nr + 512)
       |            / ((coalesce(cr, 0) + 1.0) * (nt + 512))) AS lr
       |       FROM tc FULL OUTER JOIN rc ON tc.b = rc.b CROSS JOIN tot),
       |db AS (SELECT doc_id, b, count(*) AS c FROM bk
       |       WHERE doc_id % 20 <> 0 GROUP BY 1, 2)""".stripMargin

  // R-21/R-29 learned curation: DSIR importance weights (Xie et al.
  // 2023) — hashed-unigram bucket models of a TARGET slice (the q64
  // doc_id%20=0 convention) vs the RAW rest, per-document log-weight
  // = Σ c_d(b)·lr(b). The ratio table is ≤512 rows (broadcast); `ln`
  // follows the q51/q85/q115 libm precedent with 6dp rounding after
  // the per-doc sum.
  q("q117_dsir_weights",
    s"""WITH $dsirCtes,
       |sc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |         sum(c * lr.lr) AS raw
       |       FROM db JOIN lr USING (b) GROUP BY 1)
       |SELECT doc_id, n_tokens,
       |  floor(raw * 1000000.0 + 0.5) / 1000000.0 AS logw
       |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    graft.operators.Importance.logWeights(
        docs.filter(pmod(col("doc_id"), lit(20)) =!= 0), "doc_id", "text",
        target = docs.filter(pmod(col("doc_id"), lit(20)) === 0),
        raw = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
        buckets = 512)
      .orderBy(col("doc_id"))
  }

  // The DSIR selection step: Gumbel-top-k over the q117 weights —
  // sampling WITHOUT replacement with inclusion ∝ exp(logw), fully
  // deterministic in the ids (md5-uniform u, keys rounded at 6dp
  // BEFORE ranking so a last-ulp libm difference cannot flip an
  // order). TakeOrdered, never a global sort.
  q("q118_dsir_resample",
    s"""WITH $dsirCtes,
       |sc AS (SELECT doc_id,
       |         floor(sum(c * lr.lr) * 1000000.0 + 0.5) / 1000000.0 AS logw
       |       FROM db JOIN lr USING (b) GROUP BY 1),
       |ky AS (SELECT doc_id,
       |         floor((logw - ln(-ln(
       |             (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
       |                AS BIGINT) % 1000000 + 0.5) / 1000000.0)))
       |           * 1000000.0 + 0.5) / 1000000.0 AS key
       |       FROM sc)
       |SELECT doc_id, key FROM ky
       |ORDER BY key DESC, doc_id
       |LIMIT 50""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val w = graft.operators.Importance.logWeights(
      docs.filter(pmod(col("doc_id"), lit(20)) =!= 0), "doc_id", "text",
      target = docs.filter(pmod(col("doc_id"), lit(20)) === 0),
      raw = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
      buckets = 512)
    graft.operators.Importance.gumbelTopK(w, "doc_id", "logw", k = 50)
  }

  // Importance-weighting diagnostic: the effective sample size of the
  // q117 DSIR weights (Kong 1992, ESS = (Σw)²/Σw²) — "how many
  // equally-weighted docs is this weighted corpus worth"; an ESS far
  // below n means the q118 resample is about to collapse onto a few
  // huge weights. Scale-invariant, so weights normalize by the max
  // log-weight before exp and the micro-snap keeps every sum exact
  // int64/HUGEINT (the q51/q81 libm-boundary discipline for exp).
  q("q248_dsir_ess",
    s"""WITH $dsirCtes,
       |sc248 AS (SELECT doc_id, sum(c * lr.lr) AS raw
       |  FROM db JOIN lr USING (b) GROUP BY 1),
       |lw248 AS (SELECT doc_id,
       |    floor(raw * 1000000.0 + 0.5) / 1000000.0 AS logw
       |  FROM sc248),
       |mx248 AS (SELECT max(logw) AS mx FROM lw248),
       |wm248 AS (SELECT CAST(floor(exp(logw - mx) * 1e6 + 0.5)
       |    AS BIGINT) AS wm
       |  FROM lw248, mx248),
       |ag248 AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(wm) AS BIGINT) AS sw,
       |    sum(CAST(wm AS HUGEINT) * CAST(wm AS HUGEINT)) AS sww
       |  FROM wm248)
       |SELECT n_docs,
       |  CASE WHEN sww > 0 THEN floor(CAST(sw AS DOUBLE)
       |    * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE) * 1e6 + 0.5)/1e6
       |  END AS ess6,
       |  CASE WHEN sww > 0 THEN floor((CAST(sw AS DOUBLE)
       |    * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE))
       |    / CAST(n_docs AS DOUBLE) * 1e6 + 0.5)/1e6
       |  END AS ess_ratio6
       |FROM ag248""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val w = graft.operators.Importance.logWeights(
      docs.filter(pmod(col("doc_id"), lit(20)) =!= 0), "doc_id", "text",
      target = docs.filter(pmod(col("doc_id"), lit(20)) === 0),
      raw = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
      buckets = 512)
    graft.operators.Importance.effectiveSampleSize(w, "logw")
  }

  // Release-gate privacy audit: k-anonymity over the
  // (segment, nation, balance-bucket) quasi-identifier tuple — the
  // share of customers whose QI tuple is shared by fewer than 10
  // rows, i.e. re-identifiable however the direct identifiers were
  // scrubbed (Sweeney 2002). Pure integer counting: one QI-group
  // aggregate + one readout row.
  q("q249_k_anonymity",
    """WITH g249 AS (SELECT c_mktsegment, c_nationkey,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_k,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT CAST(10 AS BIGINT) AS k,
      |  CAST(sum(n) AS BIGINT) AS n_rows,
      |  CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_small_groups,
      |  CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
      |    AS n_rows_small,
      |  CASE WHEN sum(n) > 0 THEN
      |    floor(CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS DOUBLE)
      |      / CAST(sum(n) AS DOUBLE) * 1e6 + 0.5)/1e6
      |  END AS share_small6,
      |  CAST(min(n) AS BIGINT) AS min_group_size,
      |  sum(CASE WHEN n < 10 THEN n ELSE 0 END) = 0 AS k_anonymous
      |FROM g249""".stripMargin) { (s, d) =>
    val qi = Tables.customer(s, d).select(col("c_mktsegment"),
      col("c_nationkey"),
      floor(col("c_acctbal").cast("double") / lit(1000.0)).cast("long")
        .as("bal_k"))
    graft.operators.Audit.kAnonymity(qi,
      Seq("c_mktsegment", "c_nationkey", "bal_k"), k = 10L)
  }

  // The homogeneity-attack companion gate (Machanavajjhala 2007):
  // a QI group can clear k-anonymity yet leak because every member
  // shares one sensitive value. Same QI grain as q249 minus the
  // segment (which becomes the SENSITIVE attribute): share of
  // customers in (nation, balance-bucket) groups with fewer than 3
  // distinct market segments. Two stacked hash aggregates (the
  // distinct-pair frame is the only corpus-sized exchange) + one
  // readout row.
  q("q257_l_diversity",
    """WITH p257 AS (SELECT c_nationkey,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_k,
      |    c_mktsegment, CAST(count(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1, 2, 3),
      |g257 AS (SELECT c_nationkey, bal_k,
      |    CAST(count(*) AS BIGINT) AS div, CAST(sum(n) AS BIGINT) AS rows_g
      |  FROM p257 GROUP BY 1, 2)
      |SELECT CAST(3 AS BIGINT) AS l,
      |  CAST(sum(rows_g) AS BIGINT) AS n_rows,
      |  CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(CASE WHEN div < 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_low_groups,
      |  CAST(sum(CASE WHEN div < 3 THEN rows_g ELSE 0 END) AS BIGINT)
      |    AS n_rows_low,
      |  CASE WHEN sum(rows_g) > 0 THEN
      |    floor(CAST(sum(CASE WHEN div < 3 THEN rows_g ELSE 0 END) AS DOUBLE)
      |      / CAST(sum(rows_g) AS DOUBLE) * 1e6 + 0.5)/1e6
      |  END AS share_low6,
      |  CAST(min(div) AS BIGINT) AS min_diversity,
      |  sum(CASE WHEN div < 3 THEN rows_g ELSE 0 END) = 0 AS l_diverse
      |FROM g257""".stripMargin) { (s, d) =>
    val qi = Tables.customer(s, d).select(col("c_nationkey"),
      floor(col("c_acctbal").cast("double") / lit(1000.0)).cast("long")
        .as("bal_k"),
      col("c_mktsegment"))
    graft.operators.Audit.lDiversity(qi,
      Seq("c_nationkey", "bal_k"), "c_mktsegment", l = 3L)
  }

  // The skewness-attack companion (Li et al. ICDE 2007), completing
  // the release-audit family k-anon → l-div → t-closeness: a group
  // can be large AND diverse yet leak because its sensitive
  // distribution is far from the table's. Ordered-distance EMD per
  // (segment, nation) group over the balance-bucket domain; the
  // oracle replays the rank-ordered cumulative sum with the same
  // 1e-6 fixed-point snap before the order-free per-group long sum
  // (a raw double sum would be association-order-dependent across
  // engines).
  q("q275_t_closeness",
    """WITH pr AS (SELECT c_mktsegment AS seg, c_nationkey AS nat,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1, 2, 3),
      |gl AS (SELECT v, CAST(sum(n) AS BIGINT) AS g FROM pr GROUP BY 1),
      |glr AS (SELECT v, g, row_number() OVER (ORDER BY v) AS r FROM gl),
      |tot AS (SELECT CAST(sum(g) AS BIGINT) AS nn,
      |    CAST(count(*) AS BIGINT) AS m FROM gl),
      |grp AS (SELECT seg, nat, CAST(sum(n) AS BIGINT) AS nr
      |  FROM pr GROUP BY 1, 2),
      |dense AS (SELECT grp.seg, grp.nat, grp.nr, glr.g, glr.r,
      |    tot.nn, tot.m, coalesce(pr.n, 0) AS cnt
      |  FROM grp CROSS JOIN glr CROSS JOIN tot
      |  LEFT JOIN pr ON pr.seg = grp.seg AND pr.nat = grp.nat
      |    AND pr.v = glr.v),
      |cum AS (SELECT seg, nat, nr, r, m,
      |    sum(CAST(cnt AS DOUBLE) / CAST(nr AS DOUBLE)
      |        - CAST(g AS DOUBLE) / CAST(nn AS DOUBLE))
      |      OVER (PARTITION BY seg, nat ORDER BY r
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cd
      |  FROM dense),
      |eg AS (SELECT seg, nat, max(nr) AS nr, max(m) AS m,
      |    CAST(sum(CASE WHEN r < m
      |      THEN CAST(floor(abs(cd) * 1e6 + 0.5) AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS micro
      |  FROM cum GROUP BY 1, 2),
      |e6 AS (SELECT nr, CASE WHEN m > 1
      |    THEN floor((CAST(micro AS DOUBLE) / 1e6)
      |      / CAST(m - 1 AS DOUBLE) * 1e6 + 0.5) / 1e6
      |    ELSE CAST(0 AS DOUBLE) END AS emd6
      |  FROM eg)
      |SELECT CAST(0.2 AS DOUBLE) AS t,
      |  CAST(sum(nr) AS BIGINT) AS n_rows,
      |  CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(CASE WHEN emd6 > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_far_groups,
      |  CAST(sum(CASE WHEN emd6 > 0.2 THEN nr ELSE 0 END) AS BIGINT)
      |    AS n_rows_far,
      |  CASE WHEN sum(nr) > 0 THEN
      |    floor(CAST(sum(CASE WHEN emd6 > 0.2 THEN nr ELSE 0 END) AS DOUBLE)
      |      / CAST(sum(nr) AS DOUBLE) * 1e6 + 0.5)/1e6
      |  END AS share_far6,
      |  max(emd6) AS max_emd6,
      |  sum(CASE WHEN emd6 > 0.2 THEN nr ELSE 0 END) = 0 AS t_close
      |FROM e6""".stripMargin) { (s, d) =>
    val qi = Tables.customer(s, d).select(
      col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"),
      floor(col("c_acctbal").cast("double") / lit(1000.0)).cast("long")
        .as("v"))
    graft.operators.Audit.tCloseness(qi, Seq("seg", "nat"), "v", t = 0.2)
  }

  // Scale-path runtime filter on the oracle surface: Bloom-pruned join
  // (ScaleOps.bloomPrunedJoin) — the dim subset's keys ship as a
  // fixed-size Bloom bit frame and the fact side is pruned by k
  // broadcast semi-joins BEFORE the join exchange. Pruning never
  // changes the join multiset (the exact join scrubs Bloom false
  // positives), so the oracle is the PLAIN filtered join — same gate
  // discipline as q105/q112.
  q("q119_bloom_join",
    s"""SELECT p_partkey, count(*) AS n_li,
       |  ${sqlRound("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE p_brand = 'Brand#4'
       |GROUP BY p_partkey
       |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val dim = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#4")
      .select(col("p_partkey"))
    val fact = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p_partkey"),
        col("l_extendedprice"), col("l_discount"))
    graft.operators.ScaleOps.bloomPrunedJoin(fact, dim, "p_partkey")
      .groupBy(col("p_partkey"))
      .agg(count(lit(1)).as("n_li"),
        pround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("p_partkey"))
  }

  // R-20/R-21 hybrid retrieval: Reciprocal Rank Fusion (Cormack et al.
  // 2009) of the q115 sparse BM25 list with a dense cosine list for a
  // query VECTOR (vec_id 0, the aligned embedding fixture) —
  // rank-only fusion, so heterogeneous scores need no calibration.
  // Each contribution is one IEEE-exact division 1.0/(60+rank); the
  // cross-list sum is a fixed-order coalesce chain (sparse first,
  // dense second — mirrored in the oracle), rounded at 6dp before the
  // final ordering.
  q("q120_hybrid_rrf",
    s"""WITH toks AS (SELECT doc_id, unnest($sqlTokens) AS w FROM documents),
       |dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       |stats AS (SELECT (SELECT count(*) FROM documents) AS n,
       |            (SELECT sum(dl) * 1.0 / count(*) FROM dls) AS avgdl),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks
       |       WHERE w IN ('spark', 'join', 'stream') GROUP BY doc_id, w),
       |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
       |bsc AS (SELECT tf.doc_id,
       |          ln((n - df + 0.5) / (df + 0.5) + 1.0) *
       |            ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
       |            AS t
       |        FROM tf JOIN df USING (w) JOIN dls USING (doc_id)
       |        CROSS JOIN stats),
       |bagg AS (SELECT doc_id,
       |           floor(sum(t) * 1000000.0 + 0.5) / 1000000.0 AS score
       |         FROM bsc GROUP BY doc_id
       |         ORDER BY score DESC, doc_id LIMIT 100),
       |sp AS (SELECT doc_id, row_number() OVER (
       |         ORDER BY score DESC, doc_id) AS rank FROM bagg),
       |u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |        unnest(embedding)::DOUBLE AS x FROM embeddings),
       |nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nr FROM u GROUP BY vec_id),
       |dd AS (SELECT c.vec_id AS doc_id, sum(p.x*c.x) AS dp
       |       FROM u p JOIN u c ON p.i = c.i
       |       WHERE p.vec_id = 0 AND c.vec_id <> 0 GROUP BY 1),
       |cs AS (SELECT doc_id,
       |         floor((dp / (x.nr * y.nr)) * 1000000.0 + 0.5) / 1000000.0 AS cos
       |       FROM dd JOIN nrm x ON x.vec_id = 0 JOIN nrm y ON y.vec_id = doc_id),
       |dn AS (SELECT doc_id, rank FROM (
       |         SELECT doc_id, row_number() OVER (
       |           ORDER BY cos DESC, doc_id) AS rank FROM cs)
       |       WHERE rank <= 100),
       |f AS (SELECT coalesce(sp.doc_id, dn.doc_id) AS doc_id,
       |        floor((coalesce(1.0/(60 + sp.rank), 0)
       |               + coalesce(1.0/(60 + dn.rank), 0)) * 1000000.0 + 0.5)
       |          / 1000000.0 AS rrf
       |      FROM sp FULL OUTER JOIN dn ON sp.doc_id = dn.doc_id)
       |SELECT doc_id, rrf FROM f
       |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val e = Tables.embeddings(s, d)
    val sparse = graft.operators.Retrieval.withRank(
      TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("spark", "join", "stream"), topK = 100),
      "doc_id", "score")
    val dense = Similarity.bruteForceTopK(
        e.filter(col("vec_id") === 0), e.filter(col("vec_id") =!= 0),
        "vec_id", "embedding", k = 100)
      .select(col("neighbor_id").as("doc_id"), col("rnk").as("rank"))
    graft.operators.Retrieval.rrfFuse(
      Seq(sparse.select("doc_id", "rank"), dense.select("doc_id", "rank")),
      "doc_id", k0 = 60, topK = 20)
  }

  // Time-series monitoring: rolling z-score anomaly detection
  // (TimeSeries.rollingZScore) — each event scored against the mean/
  // sample-stddev of its 8 PRECEDING values per user (trailing window:
  // a point never explains itself). Same determinism discipline as
  // q102: lag() columns + left-associative IEEE chains (never a window
  // aggregate whose addend order floats), z rounded at 6dp BEFORE the
  // |z| >= 3 compare, zero-variance windows excluded by the
  // both-engine-identical w*Sxx - Sx^2 > 0 guard.
  q("q121_rolling_anomaly", {
    val lagCols = (1 to 8).map(i => s"lag(value, $i) OVER w AS x$i")
      .mkString(",\n       |  ")
    val sx = (1 to 8).map(i => s"x$i").mkString(" + ")
    val sxx = (1 to 8).map(i => s"x$i * x$i").mkString(" + ")
    s"""WITH lg AS (SELECT user_id, event_id, value,
       |  $lagCols
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |fl AS (SELECT * FROM lg WHERE ${(1 to 8).map(i => s"x$i IS NOT NULL").mkString(" AND ")}),
       |sm AS (SELECT user_id, event_id, value,
       |         ($sx) AS sx, ($sxx) AS sxx FROM fl),
       |z AS (SELECT user_id, event_id, value,
       |        floor(((value - sx / 8.0)
       |          / sqrt((8.0 * sxx - sx * sx) / 56.0)) * 1000000.0 + 0.5)
       |          / 1000000.0 AS z6
       |      FROM sm WHERE 8.0 * sxx - sx * sx > 0)
       |SELECT user_id, event_id, value, z6, abs(z6) >= 3.0 AS anomaly
       |FROM z ORDER BY user_id, event_id""".stripMargin
  }) { (s, d) =>
    graft.operators.TimeSeries.rollingZScore(
        Tables.events(s, d), "user_id", "ts", "event_id", "value",
        w = 8, zThreshold = 3.0)
      .orderBy(col("user_id"), col("event_id"))
  }

  // R-19/R-21 fuzzy decontamination: the near-dup member of the q64/
  // q97 family — flag train docs whose MINHASH-estimated Jaccard to
  // any eval doc reaches 0.5 (the paraphrased-contamination check the
  // published eval audits use). Same portable md5 lane family and
  // banded cross-corpus join as q34; est = matches/32 is an exact
  // dyadic in both engines, so the >= compare is bit-deterministic.
  q("q122_decontaminate_fuzzy", {
    val aList = laneCoeffs._1.mkString("[", ",", "]")
    val bList = laneCoeffs._2.mkString("[", ",", "]")
    s"""WITH $minhashShingleCtes,
       |h AS (SELECT doc_id,
       |        CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % 2147483647 AS h0
       |      FROM sh),
       |lane AS (SELECT doc_id, i,
       |           min(($aList[i+1] * h0 + $bList[i+1]) % 2147483647) AS v
       |         FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS i)
       |         GROUP BY 1, 2),
       |sig AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM lane GROUP BY 1),
       |bd AS (SELECT doc_id, band,
       |         array_to_string(sig[band*4+1 : band*4+4], ',') AS bh
       |       FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS band)),
       |cand AS (SELECT DISTINCT t.doc_id AS tid, e.doc_id AS eid
       |         FROM bd t JOIN bd e
       |           ON t.band = e.band AND t.bh = e.bh
       |          AND t.doc_id % 20 <> 0 AND e.doc_id % 20 = 0),
       |sc AS (SELECT tid, eid,
       |         len(list_filter(range(0, 32), i -> x.sig[i+1] = y.sig[i+1])) / 32.0
       |           AS est
       |       FROM cand JOIN sig x ON x.doc_id = tid
       |                 JOIN sig y ON y.doc_id = eid),
       |hit AS (SELECT tid, count(*) AS n_eval_matches,
       |          ${sqlRound("max(est)", 4)} AS max_est
       |        FROM sc WHERE est >= 0.5 GROUP BY tid)
       |SELECT d.doc_id, coalesce(hit.n_eval_matches, 0) AS n_eval_matches,
       |  coalesce(hit.max_est, 0.0) AS max_est,
       |  coalesce(hit.n_eval_matches, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN hit ON hit.tid = d.doc_id
       |WHERE d.doc_id % 20 <> 0
       |ORDER BY d.doc_id""".stripMargin
  }) { (s, d) =>
    val docs = Tables.documents(s, d)
    Dedup.decontaminateFuzzy(
        docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(20)) === 0),
        "doc_id", "text", shingleN = 3, numHashes = 32, bands = 8,
        estThreshold = 0.5, portable = true)
      .select(col("doc_id"), col("n_eval_matches"),
        pround(col("max_est"), 4).as("max_est"), col("contaminated"))
      .orderBy(col("doc_id"))
  }

  // R-29 weighted export: deterministic multinomial draws ∝ n_chars
  // (Curation.multinomialSample) — inverse-CDF over EXACT int64
  // cumulative weights, draw positions md5-derived, no float
  // anywhere. The prefix sum is the range-partitioned ScaleOps
  // machinery; the 64-draw frame broadcasts into the containment
  // join.
  // Oracle portability: DuckDB's integer sum() yields HUGEINT
  // (int128); HUGEINT→Arrow conversion has shifted across duckdb
  // releases (decimal128 vs float64), so every sum that reaches the
  // compare — the prefix sum g and the total tw — is CAST to BIGINT,
  // and the md5 input is an explicit VARCHAR cast (no implicit
  // BIGINT||VARCHAR coercion). ORDER BY draw is total: each draw
  // lands in exactly one half-open interval.
  q("q123_multinomial_sample",
    """WITH w AS (SELECT doc_id, n_chars AS w FROM documents
      |           WHERE doc_id IS NOT NULL),
      |p AS (SELECT doc_id, w,
      |        CAST(coalesce(sum(w) OVER (ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |          AS BIGINT) AS g
      |      FROM w),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
      |dr AS (SELECT j AS draw,
      |         CAST('0x' || substr(md5('draw:' || CAST(j AS VARCHAR)), 1, 15)
      |           AS BIGINT) % tw AS u
      |       FROM (SELECT unnest(range(0, 64)) AS j) CROSS JOIN tot)
      |SELECT draw, doc_id, u FROM dr JOIN p ON u >= g AND u < g + w
      |ORDER BY draw, doc_id""".stripMargin) { (s, d) =>
    Curation.multinomialSample(
        Tables.documents(s, d), "doc_id", "n_chars", draws = 64)
      .orderBy(col("draw"), col("doc_id"))
  }

  // Behavior analytics: windowed event funnel (ClickHouse
  // windowFunnel's greedy semantics) — view → click → purchase, each
  // step the EARLIEST matching event at/after the previous, within
  // 24h of it. The engine chains as-of ceil joins (one key shuffle
  // per step, no range-join blowup); the oracle replays each step as
  // a min-over-join. All time math in integer epoch-ms.
  q("q124_event_funnel",
    """WITH s0 AS (SELECT user_id, event_id, epoch_ms(ts) AS t0
      |            FROM events WHERE event_type = 'view'),
      |j1 AS (SELECT s0.user_id, s0.event_id, s0.t0, min(epoch_ms(c.ts)) AS t1
      |       FROM s0 LEFT JOIN events c
      |         ON c.user_id = s0.user_id AND c.event_type = 'click'
      |        AND epoch_ms(c.ts) >= s0.t0
      |       GROUP BY 1, 2, 3),
      |j2 AS (SELECT j1.user_id, j1.event_id, j1.t0, j1.t1,
      |         min(epoch_ms(p.ts)) AS t2
      |       FROM j1 LEFT JOIN events p
      |         ON p.user_id = j1.user_id AND p.event_type = 'purchase'
      |        AND epoch_ms(p.ts) >= j1.t1
      |       GROUP BY 1, 2, 3, 4),
      |lv AS (SELECT user_id,
      |         CASE WHEN t1 IS NOT NULL AND t1 - t0 <= 86400000
      |              THEN CASE WHEN t2 IS NOT NULL AND t2 - t1 <= 86400000
      |                   THEN 3 ELSE 2 END
      |              ELSE 1 END AS lvl
      |       FROM j2),
      |mx AS (SELECT user_id, max(lvl) AS level FROM lv GROUP BY 1)
      |SELECT level, count(*) AS n_users FROM mx
      |GROUP BY level ORDER BY level""".stripMargin) { (s, d) =>
    graft.operators.Behavior.eventFunnel(
        Tables.events(s, d), "user_id", "ts", "event_type",
        stages = Seq("view", "click", "purchase"), windowMs = 86400000L)
      .orderBy(col("level"))
  }

  // Behavior analytics: cohort retention — users cohort by first-seen
  // epoch day, activity bucketed by integer week offset. All integer
  // day/week arithmetic, so the matrix is exact in both engines.
  q("q125_cohort_retention",
    """WITH dy AS (SELECT user_id,
      |              CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS d
      |            FROM events),
      |ch AS (SELECT user_id, min(d) AS cohort_epoch_day FROM dy GROUP BY 1)
      |SELECT cohort_epoch_day,
      |  CAST(floor((d - cohort_epoch_day) / 7.0) AS BIGINT) AS week_offset,
      |  count(DISTINCT dy.user_id) AS n_users
      |FROM dy JOIN ch USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    graft.operators.Behavior.cohortRetention(Tables.events(s, d), "user_id", "ts")
      .orderBy(col("cohort_epoch_day"), col("week_offset"))
  }

  // R-19 graph analytics: triangle count + global clustering
  // coefficient over the staged near-dup pair graph — the oriented
  // a<b<c join counts each triangle exactly once; wedges are the
  // integer-exact degree sum. How cliquey the miner's output is.
  q("q126_triangle_count",
    s"""WITH $jaccardPairCtes,
       |ed AS (SELECT DISTINCT least(id_a, id_b) AS a,
       |         greatest(id_a, id_b) AS b
       |       FROM pr WHERE id_a <> id_b),
       |tr AS (SELECT count(*) AS n_triangles
       |       FROM ed ab JOIN ed bc ON ab.b = bc.a
       |            JOIN ed ac ON ac.a = ab.a AND ac.b = bc.b),
       |dg AS (SELECT v, count(*) AS dv FROM (
       |         SELECT a AS v FROM ed UNION ALL SELECT b FROM ed)
       |       GROUP BY v),
       |wg AS (SELECT CAST(coalesce(sum(dv * (dv - 1) / 2), 0) AS BIGINT)
       |         AS n_wedges FROM dg)
       |SELECT n_triangles, n_wedges,
       |  CASE WHEN n_wedges > 0
       |       THEN floor(3.0 * n_triangles / n_wedges * 1000000.0 + 0.5)
       |              / 1000000.0
       |       ELSE 0.0 END AS global_cc
       |FROM tr CROSS JOIN wg""".stripMargin) { (s, d) =>
    graft.operators.GraphOps.triangleStats(dedupStage(s, d).pairs,
      "id_a", "id_b")
  }

  // ------------------------------------------- round 12, session 2
  /** Trained WordPiece vocab per (session, dir) — q127 (train) owns
    * it; q128 (encode) reuses it, so q128's bench number is the
    * encode increment. Bench resets it before q127 reps.
    */
  private val wordpieceCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String),
    graft.operators.WordPiece.TrainedWordPiece]

  private def wordpieceTrained(s: org.apache.spark.sql.SparkSession,
      d: String): graft.operators.WordPiece.TrainedWordPiece = {
    sweepDeadEntries(wordpieceCache)
    wordpieceCache.computeIfAbsent((s, d), _ =>
      graft.operators.WordPiece.train(Tables.documents(s, d), "text",
        maxPieceLen = 8, minCount = 20L))
  }

  /** Drop the trained-WordPiece memo — Bench calls this before each
    * q127 rep so q127 times the vocabulary build, not a memo read.
    */
  def resetWordPiece(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    wordpieceCache.remove((s, d))
    ()
  }

  /** Bench warm-up hook — see [[PipelineQueries.warmMemos]]. */
  def warmMemos(s: org.apache.spark.sql.SparkSession, d: String,
      include: String => Boolean): Unit = {
    if (Seq("q127_wordpiece_vocab", "q128_wordpiece_encode")
        .exists(include)) { wordpieceTrained(s, d); () }
  }

  /** WordPiece TRAINING CTEs over `documents$where`: distinct-word
    * counts, the (pos, l) substring occurrence table with `##`-marked
    * pieces, and the frequency vocabulary (min-count OR single-char
    * fallback) — the exact relational replay of
    * [[graft.operators.WordPiece.train]].
    */
  private def wpTrainCtes(where: String = ""): String =
    s"""wpT AS (SELECT unnest($sqlTokens) AS word FROM documents$where),
       |wpW AS (SELECT word, count(*) AS cnt FROM wpT GROUP BY word),
       |wpP AS (SELECT word, cnt,
       |          unnest(generate_series(1, length(word))) AS pos FROM wpW),
       |wpOcc AS (SELECT word, cnt, pos,
       |            unnest(generate_series(1,
       |              least(8, length(word) - pos + 1))) AS l
       |          FROM wpP),
       |wpOcc2 AS (SELECT word, cnt, pos, l,
       |             CASE WHEN pos = 1 THEN substr(word, pos, l)
       |                  ELSE '##' || substr(word, pos, l) END AS piece
       |           FROM wpOcc),
       |wpVf AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq
       |         FROM wpOcc2 GROUP BY piece),
       |wpVocab AS (SELECT piece, freq,
       |              row_number() OVER (ORDER BY piece) - 1 AS id
       |            FROM wpVf
       |            WHERE freq >= 20 OR
       |              (CASE WHEN piece LIKE '##%' THEN length(piece) = 3
       |                    ELSE length(piece) = 1 END))""".stripMargin

  /** WordPiece ENCODE CTEs over `documents$where` against the frozen
    * `wpVocab`: the encode split's own candidate table, its
    * longest-match table, the aggregate-free WITH RECURSIVE greedy
    * walk, UNK routing, and per-doc reassembly — the replay of
    * [[graft.operators.WordPiece.encode]]. The enclosing query must
    * open with WITH RECURSIVE.
    */
  private def wpEncodeCtes(where: String = ""): String =
    s"""weW AS (SELECT DISTINCT word
       |        FROM (SELECT unnest($sqlTokens) AS word
       |              FROM documents$where)),
       |weP AS (SELECT word,
       |          unnest(generate_series(1, length(word))) AS pos FROM weW),
       |weOcc AS (SELECT word, pos,
       |            unnest(generate_series(1,
       |              least(8, length(word) - pos + 1))) AS l
       |          FROM weP),
       |weLm AS (SELECT o.word, o.pos, max(o.l) AS len
       |         FROM (SELECT word, pos, l,
       |                 CASE WHEN pos = 1 THEN substr(word, pos, l)
       |                      ELSE '##' || substr(word, pos, l) END AS piece
       |               FROM weOcc) o
       |         JOIN wpVocab v USING (piece)
       |         GROUP BY 1, 2),
       |weWalk AS (
       |  SELECT word, 1 AS pos FROM weW
       |  UNION ALL
       |  SELECT w.word, w.pos + lm.len
       |  FROM weWalk w JOIN weLm lm ON lm.word = w.word AND lm.pos = w.pos
       |  WHERE w.pos <= length(w.word)),
       |wePieces AS (SELECT w.word, w.pos,
       |    CASE WHEN w.pos = 1 THEN substr(w.word, w.pos, lm.len)
       |         ELSE '##' || substr(w.word, w.pos, lm.len) END AS piece
       |  FROM weWalk w JOIN weLm lm ON lm.word = w.word AND lm.pos = w.pos),
       |weTerm AS (SELECT DISTINCT word FROM weWalk
       |           WHERE pos = length(word) + 1),
       |weIds AS (SELECT p.word, list(v.id ORDER BY p.pos) AS wids
       |          FROM wePieces p JOIN wpVocab v USING (piece)
       |          WHERE p.word IN (SELECT word FROM weTerm)
       |          GROUP BY p.word
       |          UNION ALL
       |          SELECT word, [CAST(-1 AS BIGINT)] FROM weW
       |          WHERE word NOT IN (SELECT word FROM weTerm)),
       |dt AS (SELECT doc_id, unnest($sqlTokens) AS word,
       |         generate_subscripts($sqlTokens, 1) AS wpos
       |       FROM documents$where),
       |enc AS (SELECT doc_id, flatten(list(wids ORDER BY wpos)) AS ids
       |        FROM dt JOIN weIds USING (word) GROUP BY doc_id)""".stripMargin

  // R-21 tokenizer, the BERT family next to the q77–q79/q83 BPE
  // (GPT family): WordPiece frequency vocabulary — every substring
  // occurrence position-classed (## continuation marker), min-count
  // filtered with the single-char fallback that makes greedy
  // matching total on the training corpus.
  q("q127_wordpiece_vocab",
    s"""WITH ${wpTrainCtes()}
       |SELECT piece, id, freq FROM wpVocab ORDER BY id""".stripMargin) {
    (s, d) =>
      wordpieceTrained(s, d).vocab
        .select(col("piece"), col("id"), col("freq"))
        .orderBy(col("id"))
  }

  // WordPiece greedy longest-match-first encode: the engine runs the
  // walk as a row-local bounded fold over the precomputed per-word
  // longest-match map (distinct-word-sized work, corpus touched by
  // two joins); the oracle replays it as an aggregate-free
  // WITH RECURSIVE pointer chase over the SAME wpLm table. A word
  // whose walk reaches length+1 is fully covered; anything else is
  // the whole-word UNK (id -1) — unreachable when self-encoding the
  // training corpus (single-char fallback), spec-covered for foreign
  // text.
  q("q128_wordpiece_encode",
    s"""WITH RECURSIVE ${wpTrainCtes()},
       |${wpEncodeCtes()}
       |SELECT doc_id, CAST(len(ids) AS INTEGER) AS n_ids,
       |  array_to_string(ids, ',') AS ids_csv
       |FROM enc ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.WordPiece.encode(
        Tables.documents(s, d), "doc_id", "text", wordpieceTrained(s, d))
      .select(col("doc_id"), col("n_ids"),
        array_join(col("ids"), ",").as("ids_csv"))
      .orderBy(col("doc_id"))
  }

  /** Frozen WordPiece for q129: trained ONCE on the even-doc_id
    * split, memoized per (session, dir) — each q129 run measures
    * deployment's shape, encoding FOREIGN text with a frozen vocab
    * (the q83 convention). Unseen characters at a class position make
    * the greedy walk stick and the whole word goes to id −1.
    */
  private val wordpieceSplitCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String),
    graft.operators.WordPiece.TrainedWordPiece]

  private def wordpieceSplitTrained(s: org.apache.spark.sql.SparkSession,
      d: String): graft.operators.WordPiece.TrainedWordPiece = {
    sweepDeadEntries(wordpieceSplitCache)
    wordpieceSplitCache.computeIfAbsent((s, d), _ =>
      graft.operators.WordPiece.train(
        Tables.documents(s, d).filter(pmod(col("doc_id"), lit(2)) === 0),
        "text", maxPieceLen = 8, minCount = 20L))
  }

  // The BERT-family q83: encode the ODD split with a vocab frozen on
  // the EVEN split. The oracle's recursive walk takes the same UNK
  // branch the engine's fold does, so the whole-word-UNK convention
  // is oracle-gated here (q128's self-encode can never reach it).
  q("q129_wordpiece_encode_oov",
    s"""WITH RECURSIVE ${wpTrainCtes(" WHERE doc_id % 2 = 0")},
       |${wpEncodeCtes(" WHERE doc_id % 2 <> 0")}
       |SELECT doc_id, CAST(len(ids) AS INTEGER) AS n_ids,
       |  CAST(len(list_filter(ids, x -> x = -1)) AS INTEGER) AS n_unk,
       |  array_to_string(ids, ',') AS ids_csv
       |FROM enc ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.WordPiece.encode(
        Tables.documents(s, d).filter(pmod(col("doc_id"), lit(2)) =!= 0),
        "doc_id", "text", wordpieceSplitTrained(s, d))
      .select(col("doc_id"), col("n_ids"),
        size(filter(col("ids"), _ === -1L)).as("n_unk"),
        array_join(col("ids"), ",").as("ids_csv"))
      .orderBy(col("doc_id"))
  }

  // R-20/R-21 sparse retrieval: TF-IDF doc-to-doc top-k over the
  // shared-term inverted join — the sparse twin of q37's dense brute
  // top-k (same probe/candidate split, same output shape). Terms
  // with df > 100 leave the vector space entirely (weights AND
  // norms — the hot-shingle cap discipline); terms are word 2-grams
  // (the fixture's 31-word unigram vocabulary is all df >= 25 — a
  // degenerate space; its 2-gram space has 900+ selective terms);
  // idf follows the q51 ln(n/df) convention; cosines round at 6dp
  // before ranking.
  q("q130_sparse_knn",
    s"""WITH tk130 AS (SELECT doc_id, $sqlTokens AS l FROM documents),
       |t AS (SELECT doc_id,
       |        unnest(list_transform(generate_series(1, len(l) - 1),
       |          i -> l[i] || ' ' || l[i+1])) AS word
       |      FROM tk130),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM t GROUP BY 1, 2),
       |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM t
       |       GROUP BY 1 HAVING count(DISTINCT doc_id) <= 100),
       |n AS (SELECT count(*) AS n FROM documents),
       |w AS (SELECT doc_id, word, tf * ln(n.n * 1.0 / df.df) AS w
       |      FROM tf JOIN df USING (word) CROSS JOIN n),
       |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nr FROM w GROUP BY 1),
       |dp AS (SELECT p.doc_id AS probe_id, c.doc_id AS neighbor_id,
       |         sum(p.w * c.w) AS dp
       |       FROM w p JOIN w c USING (word)
       |       WHERE p.doc_id < 10 AND c.doc_id >= 10 GROUP BY 1, 2),
       |cs AS (SELECT probe_id, neighbor_id,
       |         floor(dp / (x.nr * y.nr) * 1000000.0 + 0.5) / 1000000.0 AS cos
       |       FROM dp JOIN nrm x ON x.doc_id = probe_id
       |            JOIN nrm y ON y.doc_id = neighbor_id),
       |r AS (SELECT probe_id, neighbor_id, cos, row_number() OVER (
       |        PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
       |      FROM cs)
       |SELECT probe_id, rnk, neighbor_id, cos FROM r WHERE rnk <= 5
       |ORDER BY probe_id, rnk""".stripMargin) { (s, d) =>
    TextAnalysis.sparseTfIdfTopK(Tables.documents(s, d), "doc_id", "text",
        probePred = col("doc") < 10, k = 5, dfCap = 100L, termN = 2)
      .orderBy(col("probe_id"), col("rnk"))
  }

  // ------------------------------------------------------ round 13
  // Edit-distance similarity self-join (Gravano 2001 / Ed-Join 2008)
  // over the distinct part-name vocabulary: q-gram prefix filtering
  // (rarest q*d+1 grams under the global (df, gram) order) prunes the
  // candidate space to an equi-join on rare grams — exact, never
  // all-pairs on the long-string side; the oracle IS the brute-force
  // cross join, so the gate proves the pruning is result-invisible.
  q("q131_fuzzy_join",
    """WITH n AS (SELECT DISTINCT p_name AS s FROM part)
      |SELECT a.s AS name_a, b.s AS name_b,
      |  levenshtein(a.s, b.s) AS dist
      |FROM n a JOIN n b ON a.s < b.s
      |WHERE abs(length(a.s) - length(b.s)) <= 2
      |  AND levenshtein(a.s, b.s) <= 2
      |ORDER BY name_a, name_b""".stripMargin) { (s, d) =>
    graft.operators.FuzzyJoin
      .editDistancePairs(Tables.part(s, d), "p_name", maxDist = 2)
      .orderBy(col("name_a"), col("name_b"))
  }

  // Top principal component by power iteration (3 rounds), the q88
  // k-means float discipline end-to-end: double precision, every
  // cross-row aggregate 6dp-rounded before reuse, v0 the uniform unit
  // vector — so the oracle replays each round as unrolled CTEs. The
  // engine's per-row projection is a row-local index-order fold (no
  // join); per-round shuffles are dims-sized.
  private val q134Oracle: String = {
    val rounds = (1 to 3).map { r =>
      val vPrev =
        if (r == 1)
          s"""d$r AS (SELECT vec_id,
             |  floor(sum(cx * (SELECT v0 FROM v0))*1e6 + 0.5)/1e6 AS dot
             |  FROM c GROUP BY vec_id)"""
        else
          s"""d$r AS (SELECT vec_id, floor(sum(cx * v)*1e6 + 0.5)/1e6 AS dot
             |  FROM c JOIN v${r - 1} USING (pos) GROUP BY vec_id)"""
      s"""$vPrev,
         |w$r AS (SELECT pos, floor(sum(cx * dot)*1e6 + 0.5)/1e6 AS w
         |  FROM c JOIN d$r USING (vec_id) GROUP BY pos),
         |v$r AS (SELECT pos,
         |  floor(w / (SELECT sqrt(sum(w*w)) FROM w$r) * 1e6 + 0.5)/1e6 AS v
         |  FROM w$r)"""
    }.mkString(",\n")
    s"""WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
       |  unnest(embedding)::DOUBLE AS x FROM embeddings),
       |mu AS (SELECT pos, floor(avg(x)*1e6 + 0.5)/1e6 AS m FROM u GROUP BY pos),
       |v0 AS (SELECT floor(1e0/sqrt((SELECT count(*) FROM mu))*1e6 + 0.5)/1e6
       |  AS v0),
       |c AS (SELECT vec_id, u.pos, x - m AS cx FROM u JOIN mu USING (pos)),
       |$rounds
       |SELECT pos, v AS pc1 FROM v3 ORDER BY pos""".stripMargin
  }

  q("q134_pca_power", q134Oracle) { (s, d) =>
    graft.operators.Spectral
      .pcaPowerComponent(Tables.embeddings(s, d), "embedding", rounds = 3)
      .orderBy(col("pos"))
  }

  // Retrieval evaluation: nDCG@10 of the q115 BM25 ranking against a
  // deterministic graded relevance (rel = doc_id % 4). Both DCG sums
  // are fixed-order k-term chains (max-CASE pivot, rank 1 first) and
  // log2 is spelled ln(x)/ln(2) on both engines — the rrfFuse
  // portability discipline. The ideal list is a TakeOrdered over the
  // relevance table, never a global window.
  q("q135_ndcg",
    s"""WITH toks AS (SELECT doc_id, unnest($sqlTokens) AS w FROM documents),
       |dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       |stats AS (SELECT (SELECT count(*) FROM documents) AS n,
       |            (SELECT sum(dl) * 1.0 / count(*) FROM dls) AS avgdl),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks
       |       WHERE w IN ('spark', 'join', 'stream') GROUP BY doc_id, w),
       |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
       |sc AS (SELECT tf.doc_id,
       |         ln((n - df + 0.5) / (df + 0.5) + 1.0) *
       |           ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
       |           AS t
       |       FROM tf JOIN df USING (w) JOIN dls USING (doc_id)
       |       CROSS JOIN stats),
       |agg AS (SELECT doc_id, floor(sum(t) * 1e6 + 0.5) / 1e6 AS score
       |        FROM sc GROUP BY doc_id),
       |rk AS (SELECT doc_id, row_number() OVER (
       |         ORDER BY score DESC, doc_id) AS rank
       |       FROM (SELECT doc_id, score FROM agg
       |             ORDER BY score DESC, doc_id LIMIT 10)),
       |t AS (SELECT rank, floor((pow(2e0, doc_id % 4) - 1e0)
       |        / (ln(rank + 1e0) / ln(2e0)) * 1e6 + 0.5)/1e6 AS term
       |      FROM rk),
       |dcg AS (SELECT floor((${(1 to 10).map(i =>
                  s"coalesce(max(CASE WHEN rank = $i THEN term END), 0)")
                  .mkString(" + ")}) * 1e6 + 0.5)/1e6 AS dcg FROM t),
       |irk AS (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id)
       |          AS rank
       |        FROM (SELECT doc_id, doc_id % 4 AS rel FROM documents
       |              ORDER BY rel DESC, doc_id LIMIT 10)),
       |it AS (SELECT rank, floor((pow(2e0, rel) - 1e0)
       |         / (ln(rank + 1e0) / ln(2e0)) * 1e6 + 0.5)/1e6 AS term
       |       FROM irk),
       |idcg AS (SELECT floor((${(1 to 10).map(i =>
                   s"coalesce(max(CASE WHEN rank = $i THEN term END), 0)")
                   .mkString(" + ")}) * 1e6 + 0.5)/1e6 AS idcg FROM it)
       |SELECT dcg, idcg, floor(dcg / idcg * 1e6 + 0.5)/1e6 AS ndcg
       |FROM dcg, idcg""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val ranked = graft.operators.Retrieval.withRank(
      TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("spark", "join", "stream"), topK = 10),
      "doc_id", "score")
    val rels = docs.select(col("doc_id"),
      (col("doc_id") % 4).cast("double").as("rel"))
    graft.operators.Retrieval.ndcgAtK(ranked, rels, "doc_id", "rel", k = 10)
  }

  // Greedy k-center coreset selection (Gonzalez 1985): 4 farthest-
  // point rounds over the embedding corpus — each round ONE codegen'd
  // scan folding the literal centers into a running min distance plus
  // ONE max-struct aggregate. The oracle unrolls every selection with
  // raw per-center distance CTEs min'd then 6dp-rounded, exactly the
  // engine's round arithmetic.
  private val q137Oracle: String = {
    val b = new StringBuilder
    b.append(
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |  unnest(embedding)::DOUBLE AS x FROM embeddings),
        |s1 AS (SELECT min(vec_id) AS id FROM u),
        |c1 AS (SELECT pos, x FROM u WHERE vec_id = (SELECT id FROM s1)),
        |e1 AS (SELECT u.vec_id, sum((u.x - c1.x)*(u.x - c1.x)) AS r1
        |  FROM u JOIN c1 USING (pos) GROUP BY u.vec_id)""".stripMargin)
    for (r <- 2 to 4) {
      val rawMin = (1 until r).map(j => s"r$j") match {
        case Seq(one) => one
        case many => s"least(${many.mkString(", ")})"
      }
      val joins = (2 until r).map(j => s" JOIN e$j USING (vec_id)").mkString
      val chosen = (1 until r).map(j => s"SELECT id FROM s$j")
        .mkString(" UNION ALL ")
      b.append(s""",
        |m$r AS (SELECT e1.vec_id, floor($rawMin * 1e6 + 0.5)/1e6 AS dd
        |  FROM e1$joins),
        |s$r AS (SELECT vec_id AS id, dd FROM m$r
        |  WHERE vec_id NOT IN ($chosen)
        |  ORDER BY dd DESC, vec_id LIMIT 1)""".stripMargin)
      if (r < 4) b.append(s""",
        |c$r AS (SELECT pos, x FROM u WHERE vec_id = (SELECT id FROM s$r)),
        |e$r AS (SELECT u.vec_id, sum((u.x - c$r.x)*(u.x - c$r.x)) AS r$r
        |  FROM u JOIN c$r USING (pos) GROUP BY u.vec_id)""".stripMargin)
    }
    b.append("""
      |SELECT 1 AS ord, id AS vec_id, 0e0 AS dist2 FROM s1
      |UNION ALL SELECT 2, id, dd FROM s2
      |UNION ALL SELECT 3, id, dd FROM s3
      |UNION ALL SELECT 4, id, dd FROM s4
      |ORDER BY ord""".stripMargin)
    b.toString
  }

  q("q137_kcenter_select", q137Oracle) { (s, d) =>
    graft.operators.Coreset
      .kCenterSelect(Tables.embeddings(s, d), "vec_id", "embedding", k = 4)
      .orderBy(col("ord"))
  }

  // Greedy MAXIMAL MARGINAL RELEVANCE (Carbonell & Goldstein 1998):
  // the diversity-aware top-k — round r picks argmax of
  // λ·cos(q,d) − (1−λ)·max_chosen cos(d,s). Same k-scans-no-matrix
  // shape as q137; every pairwise cosine 6dp-rounded before the
  // argmax so the oracle replays each pick. (1−λ) is spelled
  // (1e0 − 0.7e0) in the SQL so BOTH engines compute the identical
  // IEEE double — the literal 0.3 is a different number.
  private val q162Oracle: String = {
    val b = new StringBuilder
    b.append(
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |  unnest(embedding)::DOUBLE AS x FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nr FROM u GROUP BY vec_id),
        |qc AS (SELECT a.vec_id,
        |    floor(sum(a.x*q.x) / (na.nr * (SELECT nr FROM nrm WHERE vec_id = 0))
        |      * 1e6 + 0.5)/1e6 AS qcos
        |  FROM u a JOIN u q ON q.vec_id = 0 AND a.i = q.i
        |  JOIN nrm na ON na.vec_id = a.vec_id
        |  WHERE a.vec_id <> 0 AND na.nr > 0
        |  GROUP BY a.vec_id, na.nr),
        |s1 AS (SELECT vec_id AS id,
        |    floor(0.7e0 * qcos * 1e6 + 0.5)/1e6 AS sc
        |  FROM qc ORDER BY sc DESC, vec_id LIMIT 1)""".stripMargin)
    for (r <- 2 to 5) {
      val j = r - 1
      val red = (1 until r).map(x => s"c$x") match {
        case Seq(one) => one
        case many => s"greatest(${many.mkString(", ")})"
      }
      val joins = (1 until r).map(x => s" JOIN e$x USING (vec_id)").mkString
      val chosen = (1 to j).map(x => s"SELECT id FROM s$x")
        .mkString(" UNION ALL ")
      b.append(s""",
        |e$j AS (SELECT a.vec_id,
        |    floor(sum(a.x*b.x) / (na.nr * nb.nr) * 1e6 + 0.5)/1e6 AS c$j
        |  FROM u a JOIN u b ON b.vec_id = (SELECT id FROM s$j) AND a.i = b.i
        |  JOIN nrm na ON na.vec_id = a.vec_id
        |  JOIN nrm nb ON nb.vec_id = b.vec_id
        |  WHERE a.vec_id <> 0 AND na.nr > 0
        |  GROUP BY a.vec_id, na.nr, nb.nr),
        |m$r AS (SELECT qc.vec_id,
        |    floor((0.7e0 * qcos - (1e0 - 0.7e0) * $red) * 1e6 + 0.5)/1e6 AS sc
        |  FROM qc$joins),
        |s$r AS (SELECT vec_id AS id, sc FROM m$r
        |  WHERE vec_id NOT IN ($chosen)
        |  ORDER BY sc DESC, vec_id LIMIT 1)""".stripMargin)
    }
    b.append("""
      |SELECT * FROM (
      |  SELECT 1 AS ord, id AS vec_id, sc AS score FROM s1
      |  UNION ALL SELECT 2, id, sc FROM s2
      |  UNION ALL SELECT 3, id, sc FROM s3
      |  UNION ALL SELECT 4, id, sc FROM s4
      |  UNION ALL SELECT 5, id, sc FROM s5)
      |ORDER BY ord""".stripMargin)
    b.toString
  }

  q("q162_mmr_select", q162Oracle) { (s, d) =>
    graft.operators.Coreset
      .mmrSelect(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 5, lambda = 0.7)
      .orderBy(col("ord"))
  }

  // Per-cell SIMPLIFIED silhouette over the q46-style smallest-id
  // centroid partition — the clustering-quality audit for the IVF/
  // SemDeDup layouts: a = distance to the assigned (nearest) cell,
  // b = distance to the runner-up, s = (b−a)/max(a,b). One row-local
  // centroid fold + one cell aggregate; linear, the member of the
  // silhouette family a 100 TB corpus can afford (full silhouette is
  // all-pairs).
  q("q163_cell_silhouette",
    """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |  unnest(embedding)::DOUBLE AS x FROM embeddings),
      |nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nr FROM u GROUP BY vec_id),
      |cent AS (SELECT vec_id AS cvid,
      |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
      |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
      |vc0 AS (SELECT a.vec_id AS vid, c.cell, c.cvid, sum(a.x*b.x) AS dp
      |  FROM u a JOIN cent c ON true
      |  JOIN u b ON b.vec_id = c.cvid AND a.i = b.i
      |  GROUP BY 1, 2, 3),
      |vc AS (SELECT vid, cell,
      |    1e0 - floor(dp / (x.nr * y.nr) * 1e6 + 0.5)/1e6 AS dd
      |  FROM vc0 JOIN nrm x ON x.vec_id = vid JOIN nrm y ON y.vec_id = cvid),
      |rk AS (SELECT vid, cell, dd, row_number() OVER (
      |    PARTITION BY vid ORDER BY dd, cell) AS rn FROM vc),
      |ab AS (SELECT a.vid, a.cell, a.dd AS ad, b.dd AS bd
      |  FROM rk a JOIN rk b ON a.vid = b.vid AND a.rn = 1 AND b.rn = 2),
      |sil AS (SELECT vid, cell,
      |    CASE WHEN greatest(ad, bd) = 0e0 THEN 0e0
      |         ELSE floor((bd - ad) / greatest(ad, bd) * 1e6 + 0.5)/1e6
      |    END AS s
      |  FROM ab)
      |SELECT cell, count(*) AS n_vectors,
      |  floor(CAST(sum(CAST(floor(s * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) + 0.5)/1e6 AS mean_sil
      |FROM sil GROUP BY cell
      |ORDER BY cell""".stripMargin) { (s, d) =>
    graft.operators.Similarity
      .cellSilhouette(Tables.embeddings(s, d), "vec_id", "embedding",
        numCells = 8)
      .orderBy(col("cell"))
  }

  // R-21 tokenizer family, third discipline: OPTIMAL (Viterbi-style
  // DP) segmentation under the q127 WordPiece vocabulary — maximize
  // Σ len(piece)², tie-break (score DESC, split ASC). The oracle
  // unrolls the DP as one generated CTE layer per prefix length
  // (branch per split point) and backtracks the stored splits with a
  // recursive pointer chase; score_sum rides along as the optimality
  // witness. SegmentSpec plants a vocab where greedy longest-match
  // strands the tail and the DP beats it.
  private val q139Oracle: String = {
    val maxW = 12 // fixture max token length 8; deck suffixes add 3
    val maxP = 8
    val layers = (1 to maxW).map { i =>
      val branches = (math.max(0, i - maxP) until i).map { j =>
        val piece =
          if (j == 0) s"substr(p.word, 1, $i)"
          else s"'##' || substr(p.word, ${j + 1}, ${i - j})"
        val sel =
          if (j == 0) s"p.s + ${i.toLong * i} AS s"
          else s"p.s + ${(i - j).toLong * (i - j)} AS s"
        s"""SELECT p.word, $sel, $j AS j
           |FROM sg$j p JOIN sgV v ON v.piece = $piece
           |WHERE length(p.word) >= $i""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""sg$i AS MATERIALIZED (SELECT word, s, j FROM (
         |  SELECT word, s, j,
         |    row_number() OVER (PARTITION BY word ORDER BY s DESC, j) AS rn
         |  FROM ($branches)) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val dpAll = (1 to maxW)
      .map(i => s"SELECT word, $i AS i, j FROM sg$i")
      .mkString("\nUNION ALL\n")
    val fin = (1 to maxW)
      .map(i => s"SELECT word, s FROM sg$i WHERE length(word) = $i")
      .mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE ${wpTrainCtes()},
       |sgV AS MATERIALIZED (SELECT piece, id FROM wpVocab),
       |sgW AS MATERIALIZED (SELECT DISTINCT word FROM wpT),
       |sg0 AS (SELECT word, CAST(0 AS BIGINT) AS s FROM sgW),
       |$layers,
       |sgDp AS ($dpAll),
       |sgFin AS ($fin),
       |sgWalk AS (
       |  SELECT word, length(word) AS i, CAST([] AS VARCHAR[]) AS ps
       |  FROM sgW
       |  UNION ALL
       |  SELECT w.word, d.j, list_prepend(
       |    CASE WHEN d.j = 0 THEN substr(w.word, 1, w.i)
       |         ELSE '##' || substr(w.word, d.j + 1, w.i - d.j) END, w.ps)
       |  FROM sgWalk w JOIN sgDp d ON d.word = w.word AND d.i = w.i
       |  WHERE w.i > 0),
       |sgDone AS (SELECT word, ps FROM sgWalk WHERE i = 0),
       |sgU AS (SELECT word, unnest(ps) AS piece,
       |          generate_subscripts(ps, 1) AS k FROM sgDone),
       |sgIds AS (SELECT u.word, list(v.id ORDER BY u.k) AS wids
       |          FROM sgU u JOIN sgV v ON v.piece = u.piece
       |          GROUP BY u.word
       |          UNION ALL
       |          SELECT word, [CAST(-1 AS BIGINT)] FROM sgW
       |          WHERE word NOT IN (SELECT word FROM sgDone)),
       |sgSc AS (SELECT word, s FROM sgFin
       |         UNION ALL
       |         SELECT word, CAST(0 AS BIGINT) FROM sgW
       |         WHERE word NOT IN (SELECT word FROM sgFin)),
       |sgDt AS (SELECT doc_id, unnest($sqlTokens) AS word,
       |           generate_subscripts($sqlTokens, 1) AS wpos
       |         FROM documents),
       |sgEnc AS (SELECT doc_id, flatten(list(wids ORDER BY wpos)) AS ids,
       |            CAST(sum(sc.s) AS BIGINT) AS score_sum
       |          FROM sgDt JOIN sgIds USING (word)
       |          JOIN sgSc sc USING (word)
       |          GROUP BY doc_id)
       |SELECT doc_id, CAST(len(ids) AS INTEGER) AS n_ids,
       |  array_to_string(ids, ',') AS ids_csv, score_sum
       |FROM sgEnc ORDER BY doc_id""".stripMargin
  }

  q("q139_optimal_segment", q139Oracle) { (s, d) =>
    graft.operators.Segment.encode(
        Tables.documents(s, d), "doc_id", "text", wordpieceTrained(s, d))
      .select(col("doc_id"), col("n_ids"),
        array_join(col("ids"), ",").as("ids_csv"), col("score_sum"))
      .orderBy(col("doc_id"))
  }

  // Key-distribution profiler — the diagnostic that SIZES the scale
  // levers (salt factor for q105/q112, bucket counts, AQE skew
  // thresholds): one row of per-key statistics over lineitem's
  // part-key distribution. Entropy and skew round at 6dp with the
  // Σ c·ln c rounded BEFORE the division, mirrored in the oracle.
  q("q140_skew_profile",
    """WITH c AS (SELECT l_partkey AS k, count(*) AS c
      |           FROM lineitem GROUP BY 1),
      |s AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
      |        max(c) AS max_cnt,
      |        floor(sum(c * ln(c)) * 1e6 + 0.5)/1e6 AS sclnc FROM c),
      |h AS (SELECT count(*) AS hot_keys,
      |        CAST(coalesce(sum(c), 0) AS BIGINT) AS hot_rows
      |      FROM c, s
      |      WHERE c > 1.5e0 * (n_rows / CAST(n_keys AS DOUBLE)))
      |SELECT n_rows, n_keys, max_cnt, hot_keys, hot_rows,
      |  floor(max_cnt / (n_rows / CAST(n_keys AS DOUBLE)) * 1e6 + 0.5)/1e6
      |    AS skew6,
      |  floor((ln(CAST(n_rows AS DOUBLE)) - sclnc / n_rows) * 1e6 + 0.5)/1e6
      |    AS entropy6
      |FROM s, h""".stripMargin) { (s, d) =>
    graft.operators.ScaleOps.keyProfile(
      Tables.lineitem(s, d), "l_partkey", hotFactor = 1.5)
  }

  // Join-size estimation by Count-Min inner product (Cormode 2005
  // §4.2) — the broadcast-vs-shuffle-vs-salt planning primitive:
  // both key multisets fold to lanes x width counter frames under
  // map-side combine (no data rows move), the estimate is a
  // sketch-sized equi-join, and the exact count (two key-space
  // aggregates joined, never a row-level join) rides along as the
  // accuracy witness. est >= exact always (collisions only add).
  q("q141_join_cardinality", {
    val aL = bloomCoeffs._1.mkString("[", ",", "]")
    val bL = bloomCoeffs._2.mkString("[", ",", "]")
    s"""WITH ka AS (SELECT CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)
       |              AS BIGINT) % 2147483647 AS h FROM lineitem),
       |la AS (SELECT i, ($aL[i+1] * h + $bL[i+1]) % 2147483647 % 1024 AS bucket
       |       FROM ka CROSS JOIN (SELECT unnest(range(0, 4)) AS i)),
       |cma AS (SELECT i, bucket, count(*) AS c FROM la GROUP BY 1, 2),
       |kb AS (SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
       |              AS BIGINT) % 2147483647 AS h FROM orders),
       |lb AS (SELECT i, ($aL[i+1] * h + $bL[i+1]) % 2147483647 % 1024 AS bucket
       |       FROM kb CROSS JOIN (SELECT unnest(range(0, 4)) AS i)),
       |cmb AS (SELECT i, bucket, count(*) AS c FROM lb GROUP BY 1, 2),
       |ip AS (SELECT a.i, CAST(sum(a.c * b.c) AS BIGINT) AS ip
       |       FROM cma a JOIN cmb b ON a.i = b.i AND a.bucket = b.bucket
       |       GROUP BY 1),
       |est AS (SELECT min(ip) AS est FROM ip),
       |ex AS (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS exact
       |       FROM (SELECT l_orderkey AS k, count(*) AS ca
       |             FROM lineitem GROUP BY 1) x
       |       JOIN (SELECT o_orderkey AS k, count(*) AS cb
       |             FROM orders GROUP BY 1) y USING (k))
       |SELECT exact, est,
       |  CASE WHEN exact = 0 THEN NULL
       |       ELSE floor(CAST(est AS DOUBLE) / exact * 1e6 + 0.5)/1e6
       |  END AS ratio6
       |FROM ex, est""".stripMargin }) { (s, d) =>
    graft.operators.Sketches.joinCardinality(
      Tables.lineitem(s, d), "l_orderkey",
      Tables.orders(s, d), "o_orderkey", lanes = 4, width = 1024)
  }

  // Hard-negative mining (DPR recipe): per probe, the top-k most
  // similar corpus vectors with a DIFFERENT label — the negatives a
  // contrastive loss learns from. Same broadcast-probe/one-scan shape
  // as q37; the label filter runs before ranking.
  q("q146_hard_negatives",
    """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |             unnest(embedding)::DOUBLE AS x FROM embeddings),
      |nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nr FROM u GROUP BY vec_id),
      |lb AS (SELECT vec_id, label FROM embeddings),
      |d AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
      |        sum(p.x*c.x) AS dp
      |      FROM u p JOIN u c ON p.i = c.i
      |      WHERE p.vec_id < 10 AND c.vec_id >= 10 GROUP BY 1, 2),
      |cs AS (SELECT probe_id, neighbor_id,
      |         floor((dp / (x.nr * y.nr)) * 1e6 + 0.5) / 1e6 AS cos
      |       FROM d JOIN nrm x ON x.vec_id = probe_id
      |            JOIN nrm y ON y.vec_id = neighbor_id),
      |flt AS (SELECT cs.* FROM cs
      |        JOIN lb a ON a.vec_id = probe_id
      |        JOIN lb b ON b.vec_id = neighbor_id
      |        WHERE a.label IS DISTINCT FROM b.label),
      |r AS (SELECT probe_id, neighbor_id, cos, row_number() OVER (
      |        PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rnk
      |      FROM flt)
      |SELECT probe_id, rnk, neighbor_id, cos FROM r WHERE rnk <= 5
      |ORDER BY probe_id, rnk""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    Similarity.hardNegatives(
        e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
        "vec_id", "embedding", "label", k = 5)
      .orderBy(col("probe_id"), col("rnk"))
  }

  // N-gram novelty vs a reference corpus (odd docs scored against the
  // even split): fraction of a doc's DISTINCT 3-grams absent from the
  // reference set — the memorization/contamination complement of the
  // q64/q97 decontamination family. Reference = one distinct
  // gram-vocab frame; membership = one gram-keyed join.
  q("q147_novelty_score",
    s"""WITH tk AS (SELECT doc_id, $sqlTokens AS l FROM documents),
       |sh AS (SELECT doc_id,
       |         unnest(list_transform(generate_series(1, len(l) - 2),
       |           i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS g
       |       FROM tk WHERE doc_id % 2 <> 0),
       |dg AS (SELECT DISTINCT doc_id, g FROM sh),
       |ref AS (SELECT DISTINCT
       |          unnest(list_transform(generate_series(1, len(l) - 2),
       |            i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS g
       |        FROM tk WHERE doc_id % 2 = 0),
       |j AS (SELECT dg.doc_id, r.g AS seen FROM dg
       |      LEFT JOIN ref r ON dg.g = r.g)
       |SELECT doc_id, count(*) AS n_grams,
       |  CAST(sum(CASE WHEN seen IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_novel,
       |  floor(sum(CASE WHEN seen IS NULL THEN 1 ELSE 0 END)
       |    / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS novelty6
       |FROM j GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    TextAnalysis.noveltyScore(
        docs.filter(pmod(col("doc_id"), lit(2)) =!= 0), "doc_id", "text",
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), "text", n = 3)
      .orderBy(col("doc_id"))
  }

  // Correlated LATERAL subquery with per-outer-row LIMIT — the
  // top-k-per-key join in its SQL-native form. Catalyst decorrelates
  // it to a WindowGroupLimit (rank pushed below the shuffle, partial
  // + final) + one broadcast join: no per-row re-execution, the plan
  // a hand-written window formulation would want (plan-asserted).
  q("q148_lateral_topk",
    """SELECT p.p_partkey, l.l_orderkey, l.l_extendedprice
      |FROM part p, LATERAL (
      |  SELECT l_orderkey, l_extendedprice FROM lineitem
      |  WHERE l_partkey = p.p_partkey
      |  ORDER BY l_extendedprice ASC, l_orderkey LIMIT 2) l
      |ORDER BY p_partkey, l_extendedprice, l_orderkey""".stripMargin) {
    (s, d) =>
      Tables.part(s, d).createOrReplaceTempView("v_part_148")
      Tables.lineitem(s, d).createOrReplaceTempView("v_li_148")
      s.sql("""SELECT p.p_partkey, l.l_orderkey, l.l_extendedprice
        |FROM v_part_148 p, LATERAL (
        |  SELECT l_orderkey, l_extendedprice FROM v_li_148
        |  WHERE l_partkey = p.p_partkey
        |  ORDER BY l_extendedprice ASC, l_orderkey LIMIT 2) l
        |ORDER BY p_partkey, l_extendedprice, l_orderkey""".stripMargin)
  }

  // Per-GROUP histogram quantiles (q113 generalized): per-source
  // latency-percentile shape, fully distributed — per-group bounds
  // broadcast back into the binning scan (no driver collect), the
  // cumulative window bounded by bins per group.
  q("q159_grouped_quantiles",
    """WITH mm AS (SELECT event_type, min(value) AS lo, max(value) AS hi,
      |              count(*) AS n FROM events GROUP BY 1),
      |b AS (SELECT e.event_type,
      |        CASE WHEN hi = lo THEN 0
      |             ELSE least(CAST(floor((value - lo)
      |                    / ((hi - lo) / 256.0)) AS BIGINT), 255)
      |        END AS bin
      |      FROM events e JOIN mm ON e.event_type = mm.event_type),
      |bc AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY 1, 2),
      |cum AS (SELECT event_type, bin, sum(c) OVER (
      |          PARTITION BY event_type ORDER BY bin
      |          ROWS UNBOUNDED PRECEDING) AS cum
      |        FROM bc),
      |qs AS (SELECT CAST(unnest([0.5, 0.95]) AS DOUBLE) AS q),
      |pick AS (SELECT cum.event_type, q, min(bin) AS bin
      |         FROM cum JOIN mm ON cum.event_type = mm.event_type
      |         CROSS JOIN qs
      |         WHERE cum >= CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT)
      |         GROUP BY 1, 2)
      |SELECT pick.event_type, q, bin,
      |  floor((lo + (bin + 1) * ((hi - lo) / 256.0)) * 1e6 + 0.5)/1e6
      |    AS est
      |FROM pick JOIN mm ON pick.event_type = mm.event_type
      |ORDER BY pick.event_type, q""".stripMargin) { (s, d) =>
    graft.operators.Sketches.groupedHistogramQuantiles(
        Tables.events(s, d), "event_type", "value",
        bins = 256, probs = Seq(0.5, 0.95))
      .orderBy(col("event_type"), col("q"))
  }

  /** Hive-style partitioned layout of lineitem by ship month, written
    * ONCE per (session, dir) — q157 reads it back with a partition
    * predicate, so the scan touches one month's files (PartitionFilters
    * in the plan, asserted in PlanSpec). The result is the point: the
    * layout is RESULT-invisible (oracle = the plain filtered
    * aggregate), only the IO shape changes — the q109/q119 discipline
    * applied to the most common layout lever of all.
    */
  private val partLayoutDirs = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), String]

  private def partitionedLineitem(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    sweepDeadEntries(partLayoutDirs)
    partLayoutDirs.computeIfAbsent((s, d), _ => {
      val dir = scratchDir("graft-partlayout")
      Tables.lineitem(s, d)
        .withColumn("ship_month",
          date_format(col("l_shipdate"), "yyyy-MM"))
        .write.partitionBy("ship_month").mode("overwrite").parquet(dir)
      dir
    })
  }

  q("q157_partition_pruning",
    s"""SELECT l_returnflag, count(*) AS n,
       |  ${sqlRound("sum(l_extendedprice)", 2)} AS revenue
       |FROM lineitem
       |WHERE year(l_shipdate) = 1996 AND month(l_shipdate) = 3
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    s.read.parquet(partitionedLineitem(s, d))
      .where(col("ship_month") === "1996-03")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        pround(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  // End-to-end ENTITY RESOLUTION over the part-name vocabulary: the
  // classic MDM composition blocking -> pairwise match -> transitive
  // clusters -> canonical survivor, spliced from q131's prefix-filter
  // fuzzy join and the q47 pointer-jumping components — each stage
  // already scale-shaped (gram equi-join candidates, O(log d) label
  // rounds, one aggregate for sizes). Oracle = brute-force pairs +
  // the recursive reachability closure.
  q("q155_entity_resolution",
    """WITH RECURSIVE n AS (SELECT DISTINCT p_name AS s FROM part),
      |pr AS (SELECT a.s AS id_a, b.s AS id_b FROM n a JOIN n b
      |       ON a.s < b.s
      |       WHERE abs(length(a.s) - length(b.s)) <= 2
      |         AND levenshtein(a.s, b.s) <= 2),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
      |          UNION SELECT id_b, id_a FROM pr),
      |reach(id, lbl) AS (
      |  SELECT s, s FROM n
      |  UNION
      |  SELECT e.src, r.lbl FROM reach r JOIN edges e ON e.dst = r.id),
      |comp AS (SELECT id AS name, min(lbl) AS canon FROM reach GROUP BY id),
      |sz AS (SELECT canon, count(*) AS csize FROM comp GROUP BY canon)
      |SELECT name, comp.canon, csize
      |FROM comp JOIN sz USING (canon)
      |ORDER BY name""".stripMargin) { (s, d) =>
    val part = Tables.part(s, d)
    val names = part.select(col("p_name")).distinct()
    val pairs = graft.operators.FuzzyJoin
      .editDistancePairs(part, "p_name", maxDist = 2)
      .select(col("name_a").as("id_a"), col("name_b").as("id_b"))
    val comp = graft.operators.Dedup.clusters(names, "p_name", pairs)
      .select(col("p_name").as("name"), col("cluster").as("canon"))
    comp.join(comp.groupBy(col("canon")).agg(count(lit(1)).as("csize")),
        Seq("canon"))
      .select(col("name"), col("canon"), col("csize"))
      .orderBy(col("name"))
  }

  // One-sided CUSUM changepoint detection (Page 1954) — the
  // small-persistent-shift detector next to q121's spike z-score.
  // The max(0, .) clamp makes the recurrence non-window-expressible;
  // the engine folds each key's history row-locally in the EXACT
  // left-associative grouping this recursive oracle replays, so the
  // chain is bit-identical (s6 rounding is presentation, not a
  // tolerance).
  q("q156_cusum",
    """WITH RECURSIVE o AS (
      |  SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |c(user_id, rn, event_id, ts_ms, value, s) AS (
      |  SELECT user_id, rn, event_id, ts_ms, value,
      |    greatest(0e0, 0e0 + (value - 50e0 - 5e0)) FROM o WHERE rn = 1
      |  UNION ALL
      |  SELECT o.user_id, o.rn, o.event_id, o.ts_ms, o.value,
      |    greatest(0e0, c.s + (o.value - 50e0 - 5e0))
      |  FROM c JOIN o ON o.user_id = c.user_id AND o.rn = c.rn + 1)
      |SELECT user_id, event_id, ts_ms, value,
      |  floor(s * 1e6 + 0.5)/1e6 AS s6, s > 60e0 AS alarm
      |FROM c ORDER BY user_id, rn""".stripMargin) { (s, d) =>
    graft.operators.TimeSeries.cusum(Tables.events(s, d),
        "user_id", "ts", "event_id", "value",
        target = 50.0, slack = 5.0, threshold = 60.0)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("value"),
        col("s6"), col("alarm"))
      .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
  }

  // Hashing-trick featurization (Weinberger 2009): fixed-dim sparse
  // bag-of-words with NO vocabulary pass — the property that matters
  // at 100 TB (no vocab table to build or keep consistent). Buckets
  // use the oracle-portable md5 family, so the oracle replays the
  // exact bits.
  q("q152_feature_hash",
    s"""WITH t AS (SELECT doc_id, unnest($sqlTokens) AS w FROM documents),
       |h AS (SELECT doc_id,
       |        CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 64 AS b
       |      FROM t),
       |c AS (SELECT doc_id, b, count(*) AS c FROM h GROUP BY 1, 2)
       |SELECT doc_id, count(*) AS nnz,
       |  string_agg(b || ':' || c, ',' ORDER BY b) AS vec_csv
       |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.featureHash(Tables.documents(s, d), "doc_id", "text",
        dim = 64)
      .orderBy(col("doc_id"))
  }

  // Per-dimension embedding standardization: stats staged at 6dp
  // (mu, second moment) so the oracle replays them; probe rows only
  // in the output, corpus-wide stats. One dims-sized aggregate + a
  // broadcast join into the scan — no corpus shuffle.
  q("q153_standardize",
    """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1
      |             AS pos, unnest(embedding)::DOUBLE AS x
      |           FROM embeddings),
      |st AS (SELECT pos, floor(avg(x)*1e6 + 0.5)/1e6 AS mu,
      |         floor(avg(x*x)*1e6 + 0.5)/1e6 AS m2
      |       FROM u GROUP BY pos)
      |SELECT vec_id, u.pos,
      |  floor((x - mu) / sqrt(m2 - mu*mu) * 1e6 + 0.5)/1e6 AS z6
      |FROM u JOIN st USING (pos) WHERE vec_id < 5
      |ORDER BY vec_id, pos""".stripMargin) { (s, d) =>
    graft.operators.Spectral.standardize(
        Tables.embeddings(s, d), "vec_id", "embedding",
        probePred = col("vec_id") < 5)
      .orderBy(col("vec_id"), col("pos"))
  }

  // Exact phrase search by anchor alignment over the positional token
  // index: phrase word i at position p votes for anchor p−i; a match
  // is an anchor all k words voted for. The index filters to the
  // phrase words BEFORE the shuffle (q115 discipline) and matching is
  // one (doc, anchor) aggregate — no positional self-join chain.
  q("q145_phrase_search",
    s"""WITH t AS (SELECT doc_id, unnest($sqlTokens) AS w,
       |             generate_subscripts($sqlTokens, 1) AS pos
       |           FROM documents),
       |p AS (SELECT 'spark' AS w, 0 AS i UNION ALL SELECT 'join', 1),
       |m AS (SELECT doc_id, pos - i AS anchor FROM t JOIN p USING (w)
       |      GROUP BY doc_id, pos - i HAVING count(DISTINCT i) = 2)
       |SELECT doc_id, count(*) AS n_matches FROM m GROUP BY 1
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.phraseSearch(Tables.documents(s, d), "doc_id", "text",
        Seq("spark", "join"))
      .orderBy(col("doc_id"))
  }

  // R-5/R-20 sketch family, set-operation member: KMV bottom-k
  // cardinality of the en/es shingle-set UNION and INTERSECTION —
  // the estimate HLL (q114) structurally cannot produce (registers
  // union but never intersect). τ and every membership bit replay
  // from md5 arithmetic; exact counts ride along as the accuracy
  // witness. One row.
  q("q164_kmv_setops",
    s"""WITH tk AS (SELECT lang, $sqlTokens AS l FROM documents
       |            WHERE lang IN ('en', 'es')),
       |sh AS (SELECT lang, unnest(list_transform(generate_series(1, len(l) - 2),
       |         i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s FROM tk),
       |ha AS (SELECT DISTINCT CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h
       |       FROM sh WHERE lang = 'en'),
       |hb AS (SELECT DISTINCT CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h
       |       FROM sh WHERE lang = 'es'),
       |sa AS (SELECT h FROM ha ORDER BY h LIMIT 512),
       |sb AS (SELECT h FROM hb ORDER BY h LIMIT 512),
       |mg AS (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
       |       ORDER BY h LIMIT 512),
       |ms AS (SELECT count(*) AS n_merged, max(h) AS tau FROM mg),
       |nb AS (SELECT count(*) AS n_both FROM mg
       |       WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)),
       |eu AS (SELECT count(*) AS exact_union
       |       FROM (SELECT h FROM ha UNION SELECT h FROM hb)),
       |ei AS (SELECT count(*) AS exact_inter FROM ha
       |       WHERE h IN (SELECT h FROM hb)),
       |es AS (SELECT n_merged, n_both,
       |         CASE WHEN n_merged < 512 THEN CAST(n_merged AS DOUBLE)
       |              ELSE 511e0 * 1152921504606846976e0 / CAST(tau AS DOUBLE)
       |         END AS u_raw,
       |         CASE WHEN n_merged = 0 THEN 0e0
       |              ELSE CAST(n_both AS DOUBLE) / CAST(n_merged AS DOUBLE)
       |         END AS j_raw
       |       FROM ms CROSS JOIN nb)
       |SELECT 512 AS k, n_merged, exact_union, exact_inter,
       |  floor(u_raw * 1e2 + 0.5)/1e2 AS union_est,
       |  floor(j_raw * u_raw * 1e2 + 0.5)/1e2 AS inter_est,
       |  floor(j_raw * 1e6 + 0.5)/1e6 AS jaccard_est
       |FROM es CROSS JOIN eu CROSS JOIN ei""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    def side(l: String) = docs.filter(col("lang") === l)
      .select(explode(graft.functions.TextFns.textShingles(col("text"), 3))
        .as("s"))
    graft.operators.Sketches.kmvSetOps(side("en"), side("es"), "s", k = 512)
  }

  // Time-series smoothing: truncated adjusted EWMA per user (q121's
  // lag-chain determinism discipline; α=0.5 makes every weight an
  // exact dyadic literal). Partial leading windows kept — adjust=true
  // renormalizes by the weights present.
  q("q165_ewma_smooth", {
    val L = 6
    val ws = (0 until L).map(j => math.pow(0.5, j))
    val lagCols = (s"value AS x0" +:
      (1 until L).map(i => s"lag(value, $i) OVER w AS x$i")).mkString(",\n       |  ")
    val num = (0 until L).map(j => s"coalesce(x$j, 0e0) * ${ws(j)}e0")
      .mkString(" + ")
    val den = (0 until L)
      .map(j => s"(CASE WHEN x$j IS NULL THEN 0e0 ELSE ${ws(j)}e0 END)")
      .mkString(" + ")
    val nt = (0 until L)
      .map(j => s"(CASE WHEN x$j IS NULL THEN 0 ELSE 1 END)")
      .mkString(" + ")
    s"""WITH lg AS (SELECT user_id, event_id, value,
       |  $lagCols
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sm AS (SELECT user_id, event_id, value,
       |         ($num) AS num, ($den) AS den, ($nt) AS n_terms FROM lg)
       |SELECT user_id, event_id, value, n_terms,
       |  floor(num / den * 1e6 + 0.5)/1e6 AS ewma6
       |FROM sm ORDER BY user_id, event_id""".stripMargin
  }) { (s, d) =>
    graft.operators.TimeSeries.ewmaSmooth(
        Tables.events(s, d), "user_id", "ts", "event_id", "value",
        alpha = 0.5, lookback = 6)
      .orderBy(col("user_id"), col("event_id"))
  }

  // Curation diversity: cluster-balanced sampling — equal md5-ranked
  // quota per q163-convention centroid cell (5 × 8 cells from a
  // 40-vector budget), the selection that spreads a sample across the
  // embedding space instead of reproducing cluster skew. Assignment is
  // row-local (NearestCellExpr); the rank≤quota filter compiles to
  // WindowGroupLimit (plan-asserted in CurationSamplingSpec).
  q("q166_cell_balanced_sample",
    """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |  unnest(embedding)::DOUBLE AS x FROM embeddings),
      |nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nr FROM u GROUP BY vec_id),
      |cent AS (SELECT vec_id AS cvid,
      |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
      |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
      |vc0 AS (SELECT a.vec_id AS vid, c.cell, c.cvid, sum(a.x*b.x) AS dp
      |  FROM u a JOIN cent c ON true
      |  JOIN u b ON b.vec_id = c.cvid AND a.i = b.i
      |  GROUP BY 1, 2, 3),
      |vc AS (SELECT vid, cell,
      |    1e0 - floor(dp / (x.nr * y.nr) * 1e6 + 0.5)/1e6 AS dd
      |  FROM vc0 JOIN nrm x ON x.vec_id = vid JOIN nrm y ON y.vec_id = cvid),
      |asg AS (SELECT vid, cell FROM (SELECT vid, cell, row_number() OVER (
      |    PARTITION BY vid ORDER BY dd, cell) AS rn FROM vc) WHERE rn = 1),
      |rnk AS (SELECT cell, vid, CAST(row_number() OVER (PARTITION BY cell
      |    ORDER BY CAST('0x' || substr(md5(CAST(vid AS VARCHAR)), 1, 15)
      |      AS BIGINT), vid) AS INT) AS rk
      |  FROM asg)
      |SELECT cell, rk, vid AS vec_id FROM rnk WHERE rk <= 5
      |ORDER BY cell, rk""".stripMargin) { (s, d) =>
    graft.operators.Curation.cellBalancedSample(
        Tables.embeddings(s, d), "vec_id", "embedding",
        numCells = 8, budget = 40)
      .orderBy(col("cell"), col("rk"))
  }

  // Multimodal q41 family, animated-GIF member: the REAL block walk
  // (HeaderCodec.gifFrames) over deterministic GIF payloads whose
  // every structural variation — global/local color tables, comment
  // and graphic-control extensions, chained data sub-blocks — is
  // doc_id arithmetic the oracle predicts. The dimension read alone
  // (q41's GIF tier) never exercises the walk; the frame count does.
  q("q167_gif_frames",
    """SELECT doc_id AS asset_id,
      |  CAST(1 + (doc_id * 5) % 1024 AS INT) AS width,
      |  CAST(1 + (doc_id * 13) % 512 AS INT) AS height,
      |  CAST(1 + doc_id % 7 AS INT) AS n_frames,
      |  true AS header_parsed
      |FROM documents ORDER BY asset_id""".stripMargin) { (s, d) =>
    Multimodal.extractFeatures(
        Multimodal.syntheticGifAssets(Tables.documents(s, d)))
      .select(col("asset_id"),
        col("features.width").as("width"),
        col("features.height").as("height"),
        col("features.n_frames").as("n_frames"),
        col("features.header_parsed").as("header_parsed"))
      .orderBy(col("asset_id"))
  }

  // R-21: interpolated Kneser-Ney bigram scoring — the smoothing the
  // CCNet-class perplexity filters actually ship (q81 is the add-k
  // baseline). Continuation counts reward words that complete many
  // contexts; all counts integer, per-bigram chain replayed verbatim,
  // per-doc sum 6dp (q81 discipline).
  q("q168_kn_lm_score",
    s"""WITH t68 AS (SELECT doc_id, $sqlTokens AS l FROM documents),
       |px68 AS (SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
       |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
       |        FROM t68 WHERE len(l) >= 2)),
       |uni68 AS (SELECT w1, count(*) AS cu
       |  FROM (SELECT unnest(l) AS w1 FROM t68) GROUP BY w1),
       |big68 AS (SELECT w1, w2, count(*) AS cb FROM px68 GROUP BY 1, 2),
       |t168 AS (SELECT w1, count(*) AS t1 FROM big68 GROUP BY w1),
       |pc68 AS (SELECT w2, count(*) AS pcn FROM big68 GROUP BY w2),
       |b68 AS (SELECT count(*) AS b FROM big68),
       |sc68 AS (SELECT px68.doc_id, count(*) AS n_bigrams,
       |    sum(log2((cb - 0.75) / cu
       |      + 0.75 * t1 / cu * (pcn / CAST(b AS DOUBLE)))) AS raw
       |  FROM px68 JOIN big68 USING (w1, w2) JOIN uni68 USING (w1)
       |       JOIN t168 USING (w1) JOIN pc68 USING (w2), b68
       |  GROUP BY 1)
       |SELECT doc_id, n_bigrams,
       |  floor(raw * 1000000.0 + 0.5) / 1000000.0 AS kn_logprob,
       |  floor(raw / n_bigrams * 1000000.0 + 0.5) / 1000000.0
       |    AS avg_kn_logprob
       |FROM sc68 ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.knBigramScore(Tables.documents(s, d), "doc_id", "text")
      .withColumnRenamed("doc", "doc_id")
      .orderBy(col("doc_id"))
  }

  // R-19 link analytics: semi-supervised label propagation over the
  // staged near-dup pair graph (frozen-once-assigned majority vote,
  // tie -> smaller label) — sparse-annotation spreading next to q111's
  // PageRank and q47's components. Seeds = every 10th doc labeled with
  // its lang; 3 unrolled rounds in the oracle.
  q("q169_label_propagation", {
    // l{p} is referenced twice per round — MATERIALIZED stops DuckDB
    // re-inlining the jaccard chain exponentially (the q184 lesson;
    // the un-materialized form spilled >45 GB at the 30× deck)
    val b = new StringBuilder
    b.append(s"""WITH $jaccardPairCtes,
       |ed AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pr
       |       UNION ALL SELECT id_b, id_a FROM pr),
       |l0 AS MATERIALIZED (SELECT doc_id,
       |         CASE WHEN doc_id % 10 = 0 THEN lang END AS lbl
       |       FROM documents)""".stripMargin)
    for (r <- 1 to 3) {
      val p = r - 1
      b.append(s""",
       |v$r AS (SELECT ed.dst, l.lbl, count(*) AS votes
       |       FROM ed JOIN l$p l ON l.doc_id = ed.src AND l.lbl IS NOT NULL
       |       GROUP BY 1, 2),
       |w$r AS (SELECT dst AS doc_id, lbl FROM (
       |         SELECT dst, lbl, row_number() OVER (PARTITION BY dst
       |           ORDER BY votes DESC, lbl) AS rn FROM v$r) WHERE rn = 1),
       |l$r AS MATERIALIZED (SELECT l$p.doc_id,
       |         coalesce(l$p.lbl, w$r.lbl) AS lbl
       |       FROM l$p LEFT JOIN w$r USING (doc_id))""".stripMargin)
    }
    b.append("""
       |SELECT doc_id, lbl AS label FROM l3 ORDER BY doc_id""".stripMargin)
    b.toString
  }) { (s, d) =>
    val docs = Tables.documents(s, d)
    graft.operators.GraphOps.labelPropagation(
        docs, "doc_id", dedupStage(s, d).pairs, "id_a", "id_b",
        docs.filter(pmod(col("doc_id"), lit(10)) === 0), "doc_id", "lang",
        rounds = 3)
      .withColumnRenamed("lang", "label")
      .orderBy(col("doc_id"))
  }
}
