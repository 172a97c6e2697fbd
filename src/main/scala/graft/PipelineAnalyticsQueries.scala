package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, QualityModel, Similarity, TextAnalysis}
import PipelineQueries.{sqlTokens, jaccardPairCtes, minhashShingleCtes, laneCoeffs, minhashPairCtes, simhashPairCtes, nbRuleSql, nbQualityCtes, dedupStage, sweepDeadEntries, scratchDir}

/** Analytics over the pipeline surface (SURVEY §2B R-19/R-20/R-21
  * continued): quality/eval statistics (ROC/PR, calibration, lift),
  * hypothesis tests and experiment readouts, graph analytics, time
  * series and forecasting, and the recall audits of the dedup/ANN
  * estimators — split from [[PipelineQueries]] along the family seam
  * (the operator registrations are order-independent: the registry is
  * name-keyed).
  */
object PipelineAnalyticsQueries extends QueryGroup {
  // R-19 estimator audit: precision/recall of the q34 MinHash-LSH
  // pair set against the exact Jaccard pairs over the same un-blocked
  // shingle universe — what the (bands=8, rows=4) S-curve point
  // actually bought on this corpus. One row; both sides and the
  // tuple-join replay in the oracle.
  q("q170_lsh_recall_audit", {
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
       |sig AS MATERIALIZED (SELECT doc_id, list(v ORDER BY i) AS sig
       |       FROM lane GROUP BY 1),
       |bd AS (SELECT doc_id, band,
       |         array_to_string(sig[band*4+1 : band*4+4], ',') AS bh
       |       FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS band)),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM bd a JOIN bd b
       |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |lsh AS (SELECT id_a, id_b FROM cand
       |        JOIN sig x ON x.doc_id = id_a JOIN sig y ON y.doc_id = id_b
       |        WHERE len(list_filter(range(0, 32),
       |          i -> x.sig[i+1] = y.sig[i+1])) / 32.0 >= 0.5),
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |      FROM sh a JOIN sh b ON a.shingle = b.shingle
       |                         AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2),
       |ex AS (SELECT id_a, id_b
       |       FROM p JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
       |       WHERE inter * 1.0 / (x.sz + y.sz - inter) >= 0.5),
       |tp AS (SELECT count(*) AS tp FROM ex JOIN lsh USING (id_a, id_b)),
       |ne AS (SELECT count(*) AS n_exact FROM ex),
       |nl AS (SELECT count(*) AS n_lsh FROM lsh)
       |SELECT n_exact, n_lsh, tp,
       |  CASE WHEN n_lsh = 0 THEN NULL
       |       ELSE floor(CAST(tp AS DOUBLE) / CAST(n_lsh AS DOUBLE)
       |         * 1e6 + 0.5)/1e6 END AS precision6,
       |  CASE WHEN n_exact = 0 THEN NULL
       |       ELSE floor(CAST(tp AS DOUBLE) / CAST(n_exact AS DOUBLE)
       |         * 1e6 + 0.5)/1e6 END AS recall6
       |FROM ne CROSS JOIN nl CROSS JOIN tp""".stripMargin
  }) { (s, d) =>
    Dedup.lshRecallAudit(Tables.documents(s, d), "doc_id", "text",
      shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5,
      portable = true)
  }

  // Data-ops monitoring: snapshot DRIFT report (q142's audit watches
  // one snapshot's rules; this watches the DISTRIBUTION between two) —
  // per numeric column the mean/null-rate shifts and range expansion
  // between the pre-1998 and 1998+ lineitem slices. Two single-scan
  // profiles + a k-row join; the snapshots never co-shuffle.
  q("q171_drift_report", {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def side(tag: String, pred: String) =
      s"""p$tag AS (SELECT count(*) AS n${cols.map(c =>
        s""",
           |    sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS nulls_$c,
           |    min($c) AS min_$c, max($c) AS max_$c, sum($c) AS sum_$c"""
          .stripMargin).mkString}
         |  FROM lineitem WHERE $pred)""".stripMargin
    val rows = cols.map { c =>
      s"""SELECT '$c' AS "column", a.n AS n_a, b.n AS n_b,
         |  floor(a.sum_$c / CAST(a.n - a.nulls_$c AS DOUBLE) * 1e6 + 0.5)/1e6
         |    AS mean_a6,
         |  floor(b.sum_$c / CAST(b.n - b.nulls_$c AS DOUBLE) * 1e6 + 0.5)/1e6
         |    AS mean_b6,
         |  floor((floor(b.sum_$c / CAST(b.n - b.nulls_$c AS DOUBLE) * 1e6
         |      + 0.5)/1e6
         |    - floor(a.sum_$c / CAST(a.n - a.nulls_$c AS DOUBLE) * 1e6
         |      + 0.5)/1e6) * 1e6 + 0.5)/1e6 AS mean_delta6,
         |  floor(CAST(a.nulls_$c AS DOUBLE) / CAST(a.n AS DOUBLE) * 1e6
         |    + 0.5)/1e6 AS null_rate_a6,
         |  floor(CAST(b.nulls_$c AS DOUBLE) / CAST(b.n AS DOUBLE) * 1e6
         |    + 0.5)/1e6 AS null_rate_b6,
         |  (b.min_$c < a.min_$c OR b.max_$c > a.max_$c) AS range_expanded
         |FROM pa a CROSS JOIN pb b""".stripMargin
    }
    s"""WITH ${side("a", "l_shipdate < TIMESTAMP '1998-01-01'")},
       |${side("b", "l_shipdate >= TIMESTAMP '1998-01-01'")}
       |${rows.mkString("\n|UNION ALL\n|").stripMargin}
       |ORDER BY "column"""".stripMargin
  }) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val cut = lit("1998-01-01").cast("timestamp")
    graft.operators.Audit.driftReport(
        li.filter(col("l_shipdate") < cut),
        li.filter(col("l_shipdate") >= cut),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy(col("column"))
  }

  // Feature diagnostics: Pearson correlation matrix over the lineitem
  // measures in ONE combinable aggregate (all sums/squares/cross
  // products in a single scan; r is row-local arithmetic on the stat
  // row). The same textual formula runs in both engines — never each
  // engine's own corr() whose co-moment accumulation orders differ.
  q("q172_correlation_matrix", {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // index-keyed aliases, like the engine side (name-derived ones
    // collide for underscore-bearing names)
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (i, j)
    val sums = cols.indices.map(i =>
      s"sum(${cols(i)}) AS s_$i, sum(${cols(i)} * ${cols(i)}) AS ss_$i")
      .mkString(",\n       |    ")
    val crosses = pairs.map { case (i, j) =>
      s"sum(${cols(i)} * ${cols(j)}) AS sp_${i}_$j" }
      .mkString(",\n       |    ")
    val rows = pairs.map { case (i, j) =>
      s"""SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b,
         |  CASE WHEN CAST(n AS DOUBLE) * ss_$i - s_$i * s_$i > 0
         |        AND CAST(n AS DOUBLE) * ss_$j - s_$j * s_$j > 0
         |       THEN floor((CAST(n AS DOUBLE) * sp_${i}_$j - s_$i * s_$j)
         |         / sqrt((CAST(n AS DOUBLE) * ss_$i - s_$i * s_$i)
         |              * (CAST(n AS DOUBLE) * ss_$j - s_$j * s_$j))
         |         * 1e6 + 0.5)/1e6
         |  END AS corr6
         |FROM st""".stripMargin }
    s"""WITH st AS (SELECT count(*) AS n,
       |    $sums,
       |    $crosses
       |  FROM lineitem
       |  WHERE ${cols.map(c => s"$c IS NOT NULL").mkString(" AND ")})
       |${rows.mkString("\n|UNION ALL\n|").stripMargin}
       |ORDER BY col_a, col_b""".stripMargin
  }) { (s, d) =>
    graft.operators.Spectral.correlationMatrix(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy(col("col_a"), col("col_b"))
  }

  // R-5/R-20 sketch family at matrix scale: every pairwise
  // union/intersect/Jaccard estimate across the 5 language shingle
  // sets from ONE bottom-k sketch per language (q164's estimators per
  // pair) — S sources cost S·k sketch rows, never S² data passes.
  // Exact counts ride along from one hash self-join.
  q("q173_kmv_overlap_matrix",
    s"""WITH tk AS (SELECT lang, $sqlTokens AS l FROM documents),
       |shg AS (SELECT DISTINCT lang,
       |         unnest(list_transform(generate_series(1, len(l) - 2),
       |           i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
       |       FROM tk),
       |hx AS (SELECT DISTINCT lang AS g,
       |         CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h FROM shg),
       |sk AS (SELECT g, h FROM (SELECT g, h,
       |         row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM hx)
       |       WHERE rk <= 256),
       |gs AS (SELECT DISTINCT g FROM sk),
       |gp AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
       |un AS (SELECT DISTINCT ga, gb, h FROM (
       |        SELECT gp.ga, gp.gb, sk.h FROM gp JOIN sk ON sk.g = gp.ga
       |        UNION ALL
       |        SELECT gp.ga, gp.gb, sk.h FROM gp JOIN sk ON sk.g = gp.gb)),
       |mg AS (SELECT ga, gb, h FROM (SELECT ga, gb, h,
       |         row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rk
       |       FROM un) WHERE rk <= 256),
       |ms AS (SELECT ga, gb, count(*) AS n_merged, max(h) AS tau
       |       FROM mg GROUP BY 1, 2),
       |nb AS (SELECT mg.ga, mg.gb, count(*) AS n_both FROM mg
       |       JOIN sk x ON x.g = mg.ga AND x.h = mg.h
       |       JOIN sk y ON y.g = mg.gb AND y.h = mg.h
       |       GROUP BY 1, 2),
       |sz AS (SELECT g, count(*) AS sz FROM hx GROUP BY g),
       |ei AS (SELECT a.g AS ga, b.g AS gb, count(*) AS exact_inter
       |       FROM hx a JOIN hx b ON a.h = b.h AND a.g < b.g GROUP BY 1, 2),
       |es AS (SELECT ms.ga, ms.gb, n_merged,
       |         CASE WHEN n_merged < 256 THEN CAST(n_merged AS DOUBLE)
       |              ELSE 255e0 * 1152921504606846976e0 / CAST(tau AS DOUBLE)
       |         END AS u_raw,
       |         CAST(coalesce(nb.n_both, 0) AS DOUBLE)
       |           / CAST(n_merged AS DOUBLE) AS j_raw
       |       FROM ms LEFT JOIN nb ON nb.ga = ms.ga AND nb.gb = ms.gb)
       |SELECT es.ga, es.gb, n_merged,
       |  x.sz + y.sz - coalesce(ei.exact_inter, 0) AS exact_union,
       |  coalesce(ei.exact_inter, 0) AS exact_inter,
       |  floor(u_raw * 1e2 + 0.5)/1e2 AS union_est,
       |  floor(j_raw * u_raw * 1e2 + 0.5)/1e2 AS inter_est,
       |  floor(j_raw * 1e6 + 0.5)/1e6 AS jaccard_est
       |FROM es JOIN sz x ON x.g = es.ga JOIN sz y ON y.g = es.gb
       |LEFT JOIN ei ON ei.ga = es.ga AND ei.gb = es.gb
       |ORDER BY es.ga, es.gb""".stripMargin) { (s, d) =>
    val sh = Tables.documents(s, d)
      .select(col("lang"),
        explode(graft.functions.TextFns.textShingles(col("text"), 3)).as("s"))
    graft.operators.Sketches.kmvOverlapMatrix(sh, "lang", "s", k = 256)
      .orderBy(col("ga"), col("gb"))
  }

  // R-29: dispersion-allocated stratified sampling — budget flows to
  // the strata with more internal spread (Neyman's shape; the
  // VARIANCE-proportional weight keeps every quota an exact integer
  // cross-engine). 60 docs across langs by n_chars dispersion,
  // md5-ranked admission within each stratum.
  q("q174_stratified_alloc",
    """WITH st AS (SELECT lang AS g, count(*) AS n, sum(n_chars) AS sx,
      |         sum(n_chars * n_chars) AS sxx
      |       FROM documents GROUP BY lang),
      |vv AS (SELECT g, n * sxx - sx * sx AS v FROM st),
      |tt AS (SELECT sum(v) AS vw, count(*) AS ng FROM vv),
      |qt AS (SELECT g, CAST(greatest(1, CASE WHEN vw > 0 THEN (60 * v) // vw
      |         ELSE 60 // ng END) AS BIGINT) AS quota
      |       FROM vv CROSS JOIN tt),
      |rk AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
      |         ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
      |           1, 15) AS BIGINT), doc_id) AS rk
      |       FROM documents)
      |SELECT lang, quota, rk, doc_id
      |FROM rk JOIN qt ON qt.g = rk.lang
      |WHERE rk <= quota
      |ORDER BY lang, rk""".stripMargin) { (s, d) =>
    graft.operators.Curation.dispersionAllocatedSample(
        Tables.documents(s, d), "doc_id", "lang", "n_chars", budget = 60)
      .orderBy(col("lang"), col("rk"))
  }

  // R-19: containment pairs — the ASYMMETRIC Jaccard member (Broder
  // 1997): |A∩B|/min(|A|,|B|) catches the small-doc-inside-large-doc
  // cases the symmetric score dilutes. Same df-capped mining CTEs as
  // q33 with the containment denominator.
  q("q175_containment_pairs",
    s"""WITH toks AS (SELECT doc_id, lang, $sqlTokens AS l FROM documents),
       |sh0 AS (SELECT DISTINCT doc_id, lang,
       |         unnest(list_transform(generate_series(1, len(l) - 2),
       |                i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS shingle
       |       FROM toks),
       |sh AS (SELECT doc_id, lang, shingle FROM (
       |         SELECT *, count(*) OVER (PARTITION BY lang, shingle) AS df
       |         FROM sh0) WHERE df <= 1000),
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
       |                         AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2),
       |c AS (SELECT id_a, id_b,
       |        ${sqlRound("inter * 1.0 / least(x.sz, y.sz)", 4)} AS containment
       |      FROM p JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
       |      WHERE inter * 1.0 / least(x.sz, y.sz) >= 0.5)
       |SELECT id_a, id_b, containment FROM c
       |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
        "lang", n = 3, threshold = 0.5)
      .select(col("id_a"), col("id_b"),
        pround(col("containment"), 4).as("containment"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // Feature pipeline: quantile normalization of the second half of
  // January's event values against the first half's distribution —
  // all-integer rank mapping (ceil(r_B·n_A/n_B)), ranks from
  // range-partitioned prefix sums, lookup as one equi-join.
  q("q176_quantile_normalize",
    """WITH a AS (SELECT value, row_number() OVER (ORDER BY value, event_id)
      |         AS ra
      |       FROM events WHERE ts < TIMESTAMP '2024-01-16'),
      |b AS (SELECT event_id, value, row_number() OVER (ORDER BY value,
      |         event_id) AS rb
      |      FROM events WHERE ts >= TIMESTAMP '2024-01-16'),
      |b2 AS (SELECT event_id, value,
      |         ((rb * (SELECT count(*) FROM a)) + (SELECT count(*) FROM b)
      |           - 1) // (SELECT count(*) FROM b) AS mra
      |       FROM b)
      |SELECT b2.event_id, b2.value, a.value AS norm_value
      |FROM b2 JOIN a ON a.ra = b2.mra
      |ORDER BY b2.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val cut = lit("2024-01-16").cast("timestamp")
    graft.operators.ScaleOps.quantileNormalize(
        ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        "event_id", "value")
      .orderBy(col("event_id"))
  }

  // Behavior analytics: frequent session paths — top-20 event-type
  // trigrams over session-contiguous sequences (30-min q138 gaps; a
  // path never crosses a session, so idle gaps don't fabricate
  // transitions). One key sort carries sessions AND leads.
  q("q177_session_paths",
    """WITH lg AS (SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(epoch_ms(ts), 1) OVER w IS NULL
      |           OR epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER w > 1800000
      |         THEN 1 ELSE 0 END AS ns
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |ss AS (SELECT user_id, ts, event_id, event_type,
      |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      |  FROM lg),
      |ld AS (SELECT event_type AS t0,
      |    lead(event_type, 1) OVER w2 AS t1, lead(sess, 1) OVER w2 AS s1,
      |    lead(event_type, 2) OVER w2 AS t2, lead(sess, 2) OVER w2 AS s2,
      |    sess
      |  FROM ss
      |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |pc AS (SELECT t0 || '>' || t1 || '>' || t2 AS path, count(*) AS cnt
      |  FROM ld WHERE t0 IS NOT NULL AND t1 IS NOT NULL AND t2 IS NOT NULL
      |    AND s1 = sess AND s2 = sess
      |  GROUP BY 1)
      |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, path) AS INT)
      |    AS rn, path, cnt
      |FROM pc
      |QUALIFY rn <= 20
      |ORDER BY rn""".stripMargin) { (s, d) =>
    graft.operators.Behavior.sessionPaths(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type",
        gapMs = 1800000L, n = 3, topK = 20)
      .orderBy(col("rn"))
  }

  // R-21 keyword extraction: TextRank (Mihalcea & Tarau 2004) — q111's
  // PageRank run over the word ADJACENCY graph (distinct unordered
  // adjacent-token pairs) instead of the doc near-dup graph; the
  // corpus's top-20 words by stationary centrality. Vocab-sized graph;
  // the oracle unrolls the same 3 power steps over word nodes.
  q("q178_textrank_keywords", {
    val steps = (1 to 3).map { r =>
      val p = r - 1
      s"""s$r AS (SELECT ed.dst AS w, sum(p.pg / dg.deg) AS sm
         |       FROM ed JOIN i$p p ON p.w = ed.src
         |            JOIN dg ON dg.src = ed.src GROUP BY ed.dst),
         |i$r AS (SELECT nd.w,
         |         floor(((1.0 - 0.85) / n + 0.85 * coalesce(s$r.sm, 0))
         |           * 1000000.0 + 0.5)/1000000.0 AS pg
         |       FROM nd CROSS JOIN nn LEFT JOIN s$r USING (w))"""
        .stripMargin
    }.mkString(",\n|")
    s"""WITH tk AS (SELECT doc_id, $sqlTokens AS l FROM documents),
       |ww AS (SELECT l[i] AS w1, l[i + 1] AS w2
       |  FROM (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
       |        FROM tk WHERE len(l) >= 2)),
       |ed0 AS (SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
       |       FROM ww WHERE w1 <> w2),
       |ed AS (SELECT a AS src, b AS dst FROM ed0
       |       UNION ALL SELECT b, a FROM ed0),
       |dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
       |nd AS (SELECT DISTINCT unnest(l) AS w FROM tk),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nd),
       |i0 AS (SELECT w, floor(1.0 / n * 1000000.0 + 0.5)/1000000.0 AS pg
       |       FROM nd CROSS JOIN nn),
       |${steps.stripMargin}
       |SELECT CAST(row_number() OVER (ORDER BY pg DESC, w) AS INT) AS rn,
       |  w AS word, pg
       |FROM i3 QUALIFY rn <= 20 ORDER BY rn""".stripMargin
  }) { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(graft.functions.TextFns.tokens(col("text")).as("l"))
    val pairsAdj = toks.filter(size(col("l")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("l")) - 1),
        i => struct(element_at(col("l"), i).as("w1"),
          element_at(col("l"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1") =!= col("w2"))
      .select(least(col("w1"), col("w2")).as("id_a"),
        greatest(col("w1"), col("w2")).as("id_b"))
      .distinct()
    val nodes = toks.select(explode(col("l")).as("word")).distinct()
    val rk = org.apache.spark.sql.expressions.Window
      .orderBy(col("pg").desc, col("word"))
    graft.operators.GraphOps.pageRank(nodes, pairsAdj, "word",
        "id_a", "id_b", iterations = 3, damping = 0.85)
      .select(col("word"), col("pr").as("pg"))
      .withColumn("rn", row_number().over(rk).cast("int"))
      .filter(col("rn") <= 20)
      .select(col("rn"), col("word"), col("pg"))
      .orderBy(col("rn"))
  }

  // Data-ops audit: Benford first-significant-digit screen over
  // order totals — observed vs log10(1+1/d) expectation, the
  // fabricated-data / unit-mixup smell test. One 9-group combinable
  // aggregate; libm log10 digit extraction (q51/q85 precedent).
  q("q179_benford_audit",
    """WITH dv AS (SELECT CAST(floor(o_totalprice
      |         / power(10, floor(log10(o_totalprice)))) AS INT) AS digit
      |       FROM orders WHERE o_totalprice > 0),
      |ct AS (SELECT digit, count(*) AS cnt FROM dv GROUP BY digit),
      |tt AS (SELECT sum(cnt) AS n FROM ct)
      |SELECT digit, cnt,
      |  floor(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5)/1e6
      |    AS obs_rate6,
      |  floor(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 1e6 + 0.5)/1e6
      |    AS exp_rate6,
      |  floor((floor(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) * 1e6
      |      + 0.5)/1e6
      |    - floor(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 1e6
      |      + 0.5)/1e6) * 1e6 + 0.5)/1e6 AS dev6
      |FROM ct CROSS JOIN tt
      |ORDER BY digit""".stripMargin) { (s, d) =>
    graft.operators.Audit.benfordAudit(Tables.orders(s, d), "o_totalprice")
      .orderBy(col("digit"))
  }

  // Replication/warehouse reconciliation: snapshot diff — one
  // full-outer key join classifies every order key as added/removed/
  // changed/unchanged (null-safe compares) with per-column changed
  // counts. Snapshots derived deterministically from orders: A drops
  // keys %97==0, B drops %89==0 and rewrites the status of %7==0.
  q("q180_snapshot_diff",
    """WITH a AS (SELECT o_orderkey, o_orderstatus, o_totalprice
      |       FROM orders WHERE o_orderkey % 97 <> 0),
      |b AS (SELECT o_orderkey,
      |        CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
      |          AS o_orderstatus,
      |        o_totalprice
      |      FROM orders WHERE o_orderkey % 89 <> 0),
      |j AS (SELECT a.o_orderkey AS ka, b.o_orderkey AS kb,
      |        a.o_orderstatus AS s_a, b.o_orderstatus AS s_b,
      |        a.o_totalprice AS p_a, b.o_totalprice AS p_b
      |      FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey),
      |f AS (SELECT
      |        CASE WHEN ka IS NULL THEN 1 ELSE 0 END AS add_,
      |        CASE WHEN kb IS NULL THEN 1 ELSE 0 END AS rem_,
      |        CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
      |              AND (s_a IS DISTINCT FROM s_b
      |                OR p_a IS DISTINCT FROM p_b) THEN 1 ELSE 0 END AS chg_,
      |        CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
      |              AND s_a IS NOT DISTINCT FROM s_b
      |              AND p_a IS NOT DISTINCT FROM p_b THEN 1 ELSE 0 END
      |          AS unch_,
      |        CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
      |              AND s_a IS DISTINCT FROM s_b THEN 1 ELSE 0 END AS ds,
      |        CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
      |              AND p_a IS DISTINCT FROM p_b THEN 1 ELSE 0 END AS dp
      |      FROM j),
      |t AS (SELECT CAST(sum(add_) AS BIGINT) AS added,
      |        CAST(sum(rem_) AS BIGINT) AS removed,
      |        CAST(sum(chg_) AS BIGINT) AS changed,
      |        CAST(sum(unch_) AS BIGINT) AS unchanged,
      |        CAST(sum(ds) AS BIGINT) AS c_status,
      |        CAST(sum(dp) AS BIGINT) AS c_price
      |      FROM f)
      |SELECT chk, cnt FROM (
      |  SELECT 'added' AS chk, added AS cnt FROM t
      |  UNION ALL SELECT 'removed', removed FROM t
      |  UNION ALL SELECT 'changed', changed FROM t
      |  UNION ALL SELECT 'unchanged', unchanged FROM t
      |  UNION ALL SELECT 'changed:o_orderstatus', c_status FROM t
      |  UNION ALL SELECT 'changed:o_totalprice', c_price FROM t)
      |ORDER BY chk""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val snapA = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val snapB = o.filter(pmod(col("o_orderkey"), lit(89)) =!= 0)
      .select(col("o_orderkey"),
        when(pmod(col("o_orderkey"), lit(7)) === 0, lit("X"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        col("o_totalprice"))
    graft.operators.Cdc.snapshotDiff(snapA, snapB,
        Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"))
      .orderBy(col("chk"))
  }

  // Embedding-ops monitoring: drift between the even- and odd-id
  // embedding snapshots — cosine of the 6dp-staged mean vectors
  // (direction) and the mean norms (magnitude). Two (dim)-keyed
  // aggregates + a dims-sized join; corpora never co-shuffle.
  q("q181_embedding_drift",
    """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
      |         unnest(embedding)::DOUBLE AS x FROM embeddings),
      |ma AS (SELECT pos, count(*) AS na, floor(avg(x) * 1e6 + 0.5)/1e6 AS m
      |       FROM u WHERE vec_id % 2 = 0 GROUP BY pos),
      |mb AS (SELECT pos, count(*) AS nb, floor(avg(x) * 1e6 + 0.5)/1e6 AS m
      |       FROM u WHERE vec_id % 2 = 1 GROUP BY pos),
      |j AS (SELECT ma.na, mb.nb, ma.m AS x, mb.m AS y
      |      FROM ma JOIN mb USING (pos)),
      |t AS (SELECT max(na) AS n_a, max(nb) AS n_b, sum(x*y) AS dot,
      |        sum(x*x) AS sa, sum(y*y) AS sb FROM j)
      |SELECT n_a, n_b,
      |  CASE WHEN sa > 0 AND sb > 0
      |       THEN floor(dot / (sqrt(sa) * sqrt(sb)) * 1e6 + 0.5)/1e6
      |  END AS cos_means6,
      |  floor(sqrt(sa) * 1e6 + 0.5)/1e6 AS norm_a6,
      |  floor(sqrt(sb) * 1e6 + 0.5)/1e6 AS norm_b6
      |FROM t""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    graft.operators.Spectral.embeddingDrift(
      e.filter(pmod(col("vec_id"), lit(2)) === 0),
      e.filter(pmod(col("vec_id"), lit(2)) === 1), "embedding")
  }

  // Behavior analytics: association rules over session baskets
  // (Agrawal & Srikant 1994) — support/confidence/lift for directed
  // event-type pairs, baskets = q138's 30-min gap sessions. Baskets
  // reduce to distinct (session, type) rows before the pair join.
  q("q182_basket_rules",
    """WITH lg AS (SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(epoch_ms(ts), 1) OVER w IS NULL
      |           OR epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER w > 1800000
      |         THEN 1 ELSE 0 END AS ns
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |ss AS (SELECT user_id, event_type,
      |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      |  FROM lg),
      |it AS (SELECT DISTINCT user_id, sess, event_type AS t FROM ss),
      |nsx AS (SELECT count(*) AS n
      |        FROM (SELECT DISTINCT user_id, sess FROM it)),
      |nt AS (SELECT t, count(*) AS nt FROM it GROUP BY t),
      |ab AS (SELECT a.t AS antecedent, b.t AS consequent,
      |         count(*) AS n_ab
      |       FROM it a JOIN it b ON a.user_id = b.user_id
      |         AND a.sess = b.sess AND a.t <> b.t
      |       GROUP BY 1, 2 HAVING count(*) >= 5)
      |SELECT antecedent, consequent, n_ab,
      |  floor(CAST(n_ab AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5)/1e6
      |    AS support6,
      |  floor(CAST(n_ab AS DOUBLE) / CAST(na.nt AS DOUBLE) * 1e6 + 0.5)/1e6
      |    AS confidence6,
      |  floor(CAST(n_ab * n AS DOUBLE) / CAST(na.nt * nb.nt AS DOUBLE)
      |    * 1e6 + 0.5)/1e6 AS lift6
      |FROM ab JOIN nt na ON na.t = antecedent
      |        JOIN nt nb ON nb.t = consequent
      |        CROSS JOIN nsx
      |ORDER BY antecedent, consequent""".stripMargin) { (s, d) =>
    graft.operators.Behavior.basketRules(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type",
        gapMs = 1800000L, minSessions = 5L)
      .orderBy(col("antecedent"), col("consequent"))
  }

  // Model evaluation: reliability bins for the q85 NB quality scorer —
  // equal-count score deciles (integer rank cuts) vs the observed
  // heuristic-label rate. Monotone pos_rate = the scores order docs
  // the way the rule does; the check before trusting a threshold.
  q("q183_calibration_bins",
    s"""WITH $nbQualityCtes,
       |lo AS (SELECT sc85.doc_id,
       |    floor((raw + ln(n1 * 1.0 / n0)) * 1e6 + 0.5)/1e6 AS lo
       |  FROM sc85, pri85),
       |la AS (SELECT doc_id, $nbRuleSql AS y FROM f85),
       |rk AS (SELECT lo.doc_id, lo,
       |    row_number() OVER (ORDER BY lo, doc_id) - 1 AS r0 FROM lo),
       |bn AS (SELECT doc_id, lo,
       |    CAST((r0 * 10) // (SELECT count(*) FROM rk) AS INT) AS bin
       |  FROM rk)
       |SELECT bin, count(*) AS n_docs,
       |  floor(CAST(sum(CAST(floor(lo * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) + 0.5)/1e6 AS mean_log_odds6,
       |  floor(avg(CASE WHEN y THEN 1e0 ELSE 0e0 END) * 1e6 + 0.5)/1e6
       |    AS pos_rate6
       |FROM bn JOIN la USING (doc_id)
       |GROUP BY bin ORDER BY bin""".stripMargin) { (s, d) =>
    // reads the family's memoized NB-scored frame (q183 is the
    // family's first-alphabetical member, so Bench resets the memo on
    // IT — the mine is timed here; q185/q221/q223/q243 readouts price
    // their increments)
    graft.operators.QualityModel.calibrationBinsFrom(
        PipelineQueries.nbScored(s, d), "doc_id", bins = 10)
      .orderBy(col("bin"))
  }

  // R-19 link analytics: 2-core peeling over the staged near-dup pair
  // graph (Seidman 1983) — dense cores vs scattered pairs, the
  // density audit next to q126's clustering coefficient. 3 unrolled
  // rounds in the oracle (clique graphs converge in 1-2).
  q("q184_kcore", {
    // every a{p} is referenced twice per round: without MATERIALIZED,
    // DuckDB re-inlines the whole jaccard chain per reference and the
    // plan blows up exponentially with rounds (>580 s at the 10×
    // deck; 6 s materialized)
    val b = new StringBuilder
    b.append(s"""WITH $jaccardPairCtes,
       |ed AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pr
       |       UNION ALL SELECT id_b, id_a FROM pr),
       |a0 AS MATERIALIZED (SELECT doc_id AS id FROM documents)""".stripMargin)
    for (r <- 1 to 3) {
      val p = r - 1
      b.append(s""",
       |d$r AS (SELECT ed.src AS id, count(*) AS dg
       |       FROM ed JOIN a$p x ON x.id = ed.src
       |               JOIN a$p y ON y.id = ed.dst
       |       GROUP BY ed.src),
       |a$r AS MATERIALIZED (SELECT a$p.id FROM a$p JOIN d$r USING (id)
       |       WHERE d$r.dg >= 2)""".stripMargin)
    }
    b.append("""
       |SELECT n.doc_id, (a3.id IS NOT NULL) AS in_core
       |FROM documents n LEFT JOIN a3 ON a3.id = n.doc_id
       |ORDER BY n.doc_id""".stripMargin)
    b.toString
  }) { (s, d) =>
    graft.operators.GraphOps.kCore(
        Tables.documents(s, d), "doc_id", dedupStage(s, d).pairs,
        "id_a", "id_b", k = 2, rounds = 3)
      .orderBy(col("doc_id"))
  }

  // Scorer evaluation: exact tie-corrected ROC-AUC of the q85 NB
  // quality scorer against the q58 heuristic rule — does the model's
  // ORDERING separate the classes (q183's calibration bins ask a
  // different question: are the probabilities honest). Mann-Whitney
  // rank-sum identity over DOUBLED average ranks, so every cross-row
  // sum is an exact integer (RankStats discipline); the oracle
  // replays the same integers from the shared q85 CTE chain and the
  // only float is the final one-row division.
  q("q185_roc_auc",
    s"""WITH $nbQualityCtes,
       |lo185 AS (SELECT sc85.doc_id,
       |    CAST(floor((raw + ln(n1 * 1.0 / n0)) * 1e6 + 0.5) AS BIGINT) AS m
       |  FROM sc85, pri85),
       |la185 AS (SELECT doc_id, $nbRuleSql AS y FROM f85),
       |g185 AS (SELECT m, count(*) AS n_s,
       |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p_s
       |  FROM lo185 JOIN la185 USING (doc_id) GROUP BY m),
       |r185 AS (SELECT n_s, p_s,
       |    CAST(coalesce(sum(n_s) OVER (ORDER BY m
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS below
       |  FROM g185),
       |a185 AS (SELECT CAST(sum(p_s) AS BIGINT) AS n_pos,
       |    CAST(sum(n_s - p_s) AS BIGINT) AS n_neg,
       |    CAST(sum(p_s * (2 * below + n_s + 1)) AS BIGINT) AS sum2r
       |  FROM r185)
       |SELECT n_pos, n_neg, sum2r - n_pos * (n_pos + 1) AS u2,
       |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
       |    floor(CAST(sum2r - n_pos * (n_pos + 1) AS DOUBLE)
       |      / (2e0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
       |      * 1e6 + 0.5)/1e6
       |  END AS auc6
       |FROM a185""".stripMargin) { (s, d) =>
    val sc = PipelineQueries.nbScored(s, d)
      .select(col("doc_id"),
        floor(col("log_odds") * lit(1e6) + lit(0.5)).cast("long").as("m"),
        col("keep"))
    graft.operators.RankStats.rocAuc(sc, "m", "keep")
  }

  // Feature diagnostics, rank edition: Spearman correlation matrix
  // over the lineitem measures — q172's Pearson answers "linear in
  // the raw units"; Spearman answers "monotone at all", robust to
  // the heavy-tailed prices. Pearson over doubled average ranks:
  // rank moments are exact integer sums in BOTH engines (decimal
  // there, HUGEINT here) and the correlation is one row-local double
  // chain with the SAME text.
  q("q186_spearman_matrix", {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (i, j)
    val rankCtes = cols.indices.map { i =>
      s"""g186_$i AS (SELECT ${cols(i)} AS v, count(*) AS n_s
         |  FROM cl186 GROUP BY 1),
         |r186_$i AS (SELECT v,
         |    2 * CAST(coalesce(sum(n_s) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) + n_s + 1 AS r2
         |  FROM g186_$i)""".stripMargin
    }.mkString(",\n|")
    val sums = cols.indices.map(i =>
      s"sum(x$i) AS s_$i, sum(x$i * x$i) AS ss_$i")
      .mkString(",\n       |    ")
    val crosses = pairs.map { case (i, j) =>
      s"sum(x$i * x$j) AS sp_${i}_$j" }.mkString(",\n       |    ")
    def d(e: String) = s"CAST($e AS DOUBLE)"
    val rows = pairs.map { case (i, j) =>
      val va = s"${d("n")} * ${d(s"ss_$i")} - ${d(s"s_$i")} * ${d(s"s_$i")}"
      val vb = s"${d("n")} * ${d(s"ss_$j")} - ${d(s"s_$j")} * ${d(s"s_$j")}"
      val cov = s"${d("n")} * ${d(s"sp_${i}_$j")} - ${d(s"s_$i")} * ${d(s"s_$j")}"
      s"""SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b,
         |  CASE WHEN $va > 0 AND $vb > 0
         |       THEN floor(($cov) / sqrt(($va) * ($vb)) * 1e6 + 0.5)/1e6
         |  END AS rho6
         |FROM st186""".stripMargin }
    s"""WITH cl186 AS (SELECT ${cols.mkString(", ")} FROM lineitem
       |  WHERE ${cols.map(c => s"$c IS NOT NULL").mkString(" AND ")}),
       |$rankCtes,
       |rk186 AS (SELECT ${cols.indices.map(i => s"r186_$i.r2 AS x$i")
            .mkString(", ")}
       |  FROM cl186 ${cols.indices.map(i =>
            s"JOIN r186_$i ON r186_$i.v = cl186.${cols(i)}").mkString(" ")}),
       |st186 AS (SELECT count(*) AS n,
       |    $sums,
       |    $crosses
       |  FROM rk186)
       |${rows.mkString("\n|UNION ALL\n|").stripMargin}
       |ORDER BY col_a, col_b""".stripMargin
  }) { (s, d) =>
    graft.operators.RankStats.spearmanMatrix(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy(col("col_a"), col("col_b"))
  }

  // Corpus-health audit: Zipf-law fit over the top-256 token
  // frequencies — ln(freq) ~ ln(rank) OLS; a natural corpus reads
  // slope ≈ −1, boilerplate floods flatten it. Both logs snap to
  // integer micro-units BEFORE any sum (q163's order-independence
  // lesson applied at the source), so the five OLS moments are exact
  // int64 in both engines and slope/intercept/R² are one-row double
  // chains with identical text.
  q("q187_zipf_fit", {
    def d(e: String) = s"CAST($e AS DOUBLE)"
    val varL = s"${d("k")} * ${d("sll")} - ${d("sl")} * ${d("sl")}"
    val varF = s"${d("k")} * ${d("sff")} - ${d("sf")} * ${d("sf")}"
    val cov = s"${d("k")} * ${d("slf")} - ${d("sl")} * ${d("sf")}"
    s"""WITH t187 AS (SELECT unnest($sqlTokens) AS token FROM documents),
       |f187 AS (SELECT token, count(*) AS freq FROM t187 GROUP BY 1),
       |k187 AS (SELECT freq, r FROM (SELECT freq, token,
       |    row_number() OVER (ORDER BY freq DESC, token) AS r FROM f187)
       |  WHERE r <= 256),
       |m187 AS (SELECT
       |    CAST(floor(ln(CAST(r AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lr,
       |    CAST(floor(ln(CAST(freq AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lf
       |  FROM k187),
       |s187 AS (SELECT count(*) AS k,
       |    CAST(sum(lr) AS BIGINT) AS sl, CAST(sum(lf) AS BIGINT) AS sf,
       |    CAST(sum(lr * lr) AS BIGINT) AS sll,
       |    CAST(sum(lr * lf) AS BIGINT) AS slf,
       |    CAST(sum(lf * lf) AS BIGINT) AS sff
       |  FROM m187)
       |SELECT CAST(k AS BIGINT) AS n_terms,
       |  floor(($cov) / ($varL) * 1e6 + 0.5)/1e6 AS slope6,
       |  floor((${d("sf")} - ($cov) / ($varL) * ${d("sl")}) / ${d("k")} / 1e6
       |    * 1e6 + 0.5)/1e6 AS intercept6,
       |  CASE WHEN $varL > 0 AND $varF > 0
       |       THEN floor(($cov) * ($cov) / (($varL) * ($varF)) * 1e6 + 0.5)/1e6
       |  END AS r2_6
       |FROM s187""".stripMargin
  }) { (s, d) =>
    TextAnalysis.zipfFit(Tables.documents(s, d), "text", topK = 256)
  }

  // Corpus-health audit: Gini concentration of character mass across
  // documents + the top-decile share — how much of the corpus a
  // handful of giant documents actually is (the skew every
  // chunking/packing/budget step inherits). Sorted-rank identity over
  // a range-partitioned prefix sum; Σi·x is exact integer in both
  // engines and the two ratios are one-row double chains.
  q("q188_gini_concentration",
    """WITH v188 AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS x
      |  FROM documents WHERE n_chars IS NOT NULL),
      |r188 AS (SELECT x, row_number() OVER (ORDER BY x, doc_id) AS i
      |  FROM v188),
      |n188 AS (SELECT count(*) AS n FROM v188),
      |s188 AS (SELECT CAST(sum(x) AS BIGINT) AS sx, sum(i * x) AS six,
      |    CAST(sum(CASE WHEN i > n - n // 10 THEN x ELSE 0 END) AS BIGINT)
      |      AS topx
      |  FROM r188 CROSS JOIN n188)
      |SELECT CAST(n AS BIGINT) AS n_rows, sx AS total,
      |  floor((2e0 * CAST(six AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
      |    - (CAST(n AS DOUBLE) + 1e0) / CAST(n AS DOUBLE)) * 1e6 + 0.5)/1e6
      |    AS gini6,
      |  floor(CAST(topx AS DOUBLE) / CAST(sx AS DOUBLE) * 1e6 + 0.5)/1e6
      |    AS top_decile_share6
      |FROM s188 CROSS JOIN n188""".stripMargin) { (s, d) =>
    graft.operators.RankStats.giniConcentration(
      Tables.documents(s, d), "doc_id", "n_chars")
  }

  // Experimentation readout: two-variant A/B test on user-grain
  // purchase conversion (variant = user_id % 2 — the deterministic
  // split q96's family uses). Pooled two-proportion z + its χ² twin;
  // every count is an exact integer aggregate and the z/χ² chain is
  // ONE row of double arithmetic with identical text in both
  // engines; `significant` thresholds the ROUNDED z (q85's pred
  // discipline).
  q("q189_ab_test", {
    val pa = "CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
    val pb = "CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)"
    val pp = "CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)"
    val se2 = s"($pp) * (1e0 - ($pp)) * " +
      "(1e0 / CAST(n_a AS DOUBLE) + 1e0 / CAST(n_b AS DOUBLE))"
    val z = s"(($pb) - ($pa)) / sqrt($se2)"
    val z6 = s"floor(($z) * 1e6 + 0.5)/1e6"
    val ok = s"n_a > 0 AND n_b > 0 AND $se2 > 0"
    s"""WITH u189 AS (SELECT user_id, user_id % 2 AS v,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
       |  FROM events GROUP BY 1, 2),
       |s189 AS (SELECT
       |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN v = 0 THEN c ELSE 0 END) AS BIGINT) AS conv_a,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN v = 1 THEN c ELSE 0 END) AS BIGINT) AS conv_b
       |  FROM u189)
       |SELECT CAST(0 AS BIGINT) AS variant_a, CAST(1 AS BIGINT) AS variant_b,
       |  n_a, conv_a, n_b, conv_b,
       |  floor(($pa) * 1e6 + 0.5)/1e6 AS rate_a6,
       |  floor(($pb) * 1e6 + 0.5)/1e6 AS rate_b6,
       |  floor((($pb) - ($pa)) * 1e6 + 0.5)/1e6 AS lift6,
       |  CASE WHEN $ok THEN $z6 END AS z6,
       |  CASE WHEN $ok THEN floor(($z) * ($z) * 1e6 + 0.5)/1e6 END AS chi2_6,
       |  CASE WHEN $ok THEN abs($z6) >= 1.96 END AS significant
       |FROM s189""".stripMargin
  }) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), pmod(col("user_id"), lit(2L)).as("variant"),
        (col("event_type") === "purchase").as("converted"))
    graft.operators.Behavior.abTest(ev, "user_id", "variant", "converted")
  }

  // Metadata-association audit: mutual information + Cramér's V
  // between `lang` and `source` — is the stratification key
  // independent of the language mix, or is one column the other in
  // disguise (the leakage check before any per-source split is
  // trusted). χ² covers observed-zero grid cells; each cell term
  // snaps to integer micro-units before the sum (q163 discipline) so
  // partition order can never move the hash.
  q("q190_categorical_mi", {
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    val e = s"${dd("ni")} * ${dd("nj")} / ${dd("n")}"
    s"""WITH b190 AS (SELECT lang AS a, source AS b FROM documents
       |  WHERE lang IS NOT NULL AND source IS NOT NULL),
       |c190 AS (SELECT a, b, count(*) AS nij FROM b190 GROUP BY 1, 2),
       |ra190 AS (SELECT a, CAST(sum(nij) AS BIGINT) AS ni
       |  FROM c190 GROUP BY 1),
       |rb190 AS (SELECT b, CAST(sum(nij) AS BIGINT) AS nj
       |  FROM c190 GROUP BY 1),
       |t190 AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM c190),
       |g190 AS (SELECT ni, nj, coalesce(nij, 0) AS nij
       |  FROM ra190 CROSS JOIN rb190
       |  LEFT JOIN c190 ON c190.a = ra190.a AND c190.b = rb190.b),
       |m190 AS (SELECT
       |    CAST(sum(CASE WHEN nij > 0 THEN CAST(floor(
       |        (${dd("nij")} / ${dd("n")})
       |          * ln(${dd("n")} * ${dd("nij")} / (${dd("ni")} * ${dd("nj")}))
       |          * 1e6 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS mi_micro,
       |    CAST(sum(CAST(floor(
       |        (${dd("nij")} - $e) * (${dd("nij")} - $e) / ($e)
       |          * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS chi_micro
       |  FROM g190 CROSS JOIN t190),
       |d190 AS (SELECT count(*) AS r FROM ra190),
       |e190 AS (SELECT count(*) AS c FROM rb190)
       |SELECT n, CAST(r AS BIGINT) AS n_a_classes,
       |  CAST(c AS BIGINT) AS n_b_classes,
       |  CAST(mi_micro AS DOUBLE)/1e6 AS mi6,
       |  CAST(chi_micro AS DOUBLE)/1e6 AS chi2_6,
       |  CASE WHEN least(r, c) > 1
       |       THEN floor(sqrt((CAST(chi_micro AS DOUBLE)/1e6)
       |         / (CAST(n AS DOUBLE) * CAST(least(r, c) - 1 AS DOUBLE)))
       |         * 1e6 + 0.5)/1e6
       |  END AS cramers_v6
       |FROM m190 CROSS JOIN t190 CROSS JOIN d190 CROSS JOIN e190"""
      .stripMargin
  }) { (s, d) =>
    graft.operators.Audit.categoricalAssociation(
      Tables.documents(s, d), "lang", "source")
  }

  // Behavior analytics: last-touch revenue attribution — every
  // purchase credited to the user's latest click within 7 days
  // (campaign = props.k % 10), no-touch purchases reported in the
  // NULL row. The engine is ONE key shuffle (the as-of floor join's
  // union-tagged window, R-16 machinery — never a time-range join);
  // the oracle replays the floor as a max-over-join. Revenue sums in
  // integer micro-units (value is a double; raw double sums would be
  // partition-order-dependent).
  q("q191_attribution",
    """WITH cv191 AS (SELECT user_id, event_id, epoch_ms(ts) AS cts,
      |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS rev
      |  FROM events WHERE event_type = 'purchase'),
      |tc191 AS (SELECT user_id, epoch_ms(ts) AS tts,
      |    CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) % 10
      |      AS campaign
      |  FROM events WHERE event_type = 'click'),
      |mx191 AS (SELECT cv191.user_id, cv191.event_id, cv191.cts, cv191.rev,
      |    max(tc191.tts) AS mtts
      |  FROM cv191 LEFT JOIN tc191 ON tc191.user_id = cv191.user_id
      |    AND tc191.tts <= cv191.cts
      |  GROUP BY 1, 2, 3, 4),
      |cp191 AS (SELECT mx191.user_id, mx191.event_id,
      |    max(tc2.campaign) AS camp
      |  FROM mx191 JOIN tc191 tc2 ON tc2.user_id = mx191.user_id
      |    AND tc2.tts = mx191.mtts
      |  GROUP BY 1, 2),
      |at191 AS (SELECT mx.rev,
      |    CASE WHEN mx.mtts IS NOT NULL AND mx.mtts >= mx.cts - 604800000
      |         THEN cp.camp END AS campaign
      |  FROM mx191 mx
      |  LEFT JOIN cp191 cp ON cp.user_id = mx.user_id
      |    AND cp.event_id = mx.event_id)
      |SELECT campaign, count(*) AS n_conversions,
      |  CAST(sum(rev) AS DOUBLE)/1e6 AS revenue6
      |FROM at191 GROUP BY campaign
      |ORDER BY campaign NULLS FIRST""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("cts"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("rev"))
    val touch = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_millis(col("ts")).as("tts"),
        (regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long")
          % 10).as("campaign"))
    graft.operators.Behavior.lastTouchAttribution(conv, touch, "user_id",
        "cts", "tts", "rev", "campaign", windowMs = 604800000L)
      .orderBy(col("campaign"))
  }

  // Distribution-shift audit: two-sample Kolmogorov–Smirnov on
  // l_extendedprice across q171's shipdate split — the SHAPE-change
  // detector the mean/null/range drift report structurally cannot
  // be. D's numerator is the exact integer max |c_a·n_b − c_b·n_a|
  // (cross-multiplied cumulative counts — no float until the final
  // one-row division), cumulatives ride range-partitioned prefix
  // sums in the engine and a window in the oracle, and
  // `significant` compares 6dp-ROUNDED D against the 6dp-rounded
  // α=0.05 critical value.
  q("q192_ks_test", {
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    val d6 = s"floor(${dd("d_num")} / (${dd("n1")} * ${dd("n2")}) " +
      "* 1e6 + 0.5)/1e6"
    val crit6 = s"floor(1.358e0 * sqrt((${dd("n1")} + ${dd("n2")}) " +
      s"/ (${dd("n1")} * ${dd("n2")})) * 1e6 + 0.5)/1e6"
    s"""WITH u192 AS (
       |  SELECT l_extendedprice AS v,
       |    CASE WHEN l_shipdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END
       |      AS s1,
       |    CASE WHEN l_shipdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1 END
       |      AS s2
       |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
       |g192 AS (SELECT v, CAST(sum(s1) AS BIGINT) AS c1,
       |    CAST(sum(s2) AS BIGINT) AS c2
       |  FROM u192 GROUP BY v),
       |p192 AS (SELECT
       |    CAST(sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cc1,
       |    CAST(sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cc2
       |  FROM g192),
       |t192 AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
       |    CAST(sum(c2) AS BIGINT) AS n2 FROM g192),
       |m192 AS (SELECT max(abs(cc1 * n2 - cc2 * n1)) AS d_num
       |  FROM p192 CROSS JOIN t192)
       |SELECT n1 AS n_a, n2 AS n_b, d_num,
       |  $d6 AS d6,
       |  $crit6 AS crit6,
       |  ($d6) > ($crit6) AS significant
       |FROM m192 CROSS JOIN t192""".stripMargin
  }) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val cut = lit("1998-01-01").cast("timestamp")
    graft.operators.RankStats.ksTest(
      li.filter(col("l_shipdate") < cut),
      li.filter(col("l_shipdate") >= cut),
      "l_extendedprice")
  }

  // Time-to-event analytics: Kaplan–Meier survival from first signup
  // to first purchase, right-censored at the global event horizon —
  // the conversion readout that stays honest when observation
  // windows differ per user. Integer ms→day division on both sides;
  // the survival product is a cumulative integer-micro ln sum
  // (exp'd at the end), and a d=n day drives S to exact 0 via a
  // cumulative flag, never ln(0). Day-frame windows are
  // calendar-bounded (see the operator doc).
  q("q193_kaplan_meier",
    """WITH st193 AS (SELECT user_id, min(epoch_ms(ts)) AS s
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |hz193 AS (SELECT max(epoch_ms(ts)) AS h FROM events),
      |dt193 AS (SELECT st193.user_id, st193.s, min(epoch_ms(e.ts)) AS d
      |  FROM st193 LEFT JOIN events e ON e.user_id = st193.user_id
      |    AND e.event_type = 'purchase' AND epoch_ms(e.ts) >= st193.s
      |  GROUP BY 1, 2),
      |su193 AS (SELECT user_id,
      |    CASE WHEN d IS NOT NULL THEN (d - s) // 86400000
      |         ELSE (h - s) // 86400000 END AS day,
      |    (d IS NOT NULL) AS died
      |  FROM dt193 CROSS JOIN hz193),
      |ds193 AS (SELECT day,
      |    CAST(sum(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN died THEN 0 ELSE 1 END) AS BIGINT) AS w
      |  FROM su193 GROUP BY day),
      |nn193 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM su193),
      |rk193 AS (SELECT day, d, w,
      |    n - CAST(coalesce(sum(d + w) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS atrisk
      |  FROM ds193 CROSS JOIN nn193),
      |ev193 AS (SELECT day, d, w, atrisk,
      |    CASE WHEN d < atrisk THEN CAST(floor(
      |        ln(CAST(atrisk - d AS DOUBLE) / CAST(atrisk AS DOUBLE))
      |        * 1e6 + 0.5) AS BIGINT) ELSE 0 END AS tm,
      |    CASE WHEN d >= atrisk THEN 1 ELSE 0 END AS zf
      |  FROM rk193 WHERE d > 0),
      |cm193 AS (SELECT day, d, w, atrisk,
      |    CAST(sum(tm) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS ct,
      |    CAST(sum(zf) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cz
      |  FROM ev193)
      |SELECT day, atrisk AS n_at_risk, d AS n_events, w AS n_censored,
      |  CASE WHEN cz > 0 THEN 0e0
      |       ELSE floor(exp(CAST(ct AS DOUBLE) / 1e6) * 1e6 + 0.5)/1e6
      |  END AS survival6
      |FROM cm193 ORDER BY day""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val starts = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(unix_millis(col("ts"))).as("s0"))
    val deaths = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("e0"))
    val horizon = ev.agg(max(unix_millis(col("ts")))).head().getLong(0)
    graft.operators.Behavior.kaplanMeier(starts, deaths, "user_id",
        "s0", "e0", horizon)
      .orderBy(col("day"))
  }

  // Robust per-user outlier profile: median/MAD with the 1.4826
  // σ-consistency scale — the detector a single wild point cannot
  // poison (q121's rolling mean/stddev chases it). Both medians are
  // SELECTED lower-median order statistics (raw input values, never
  // averaged — bit-identical cross-engine); the outlier compare runs
  // on 6dp-rounded deviation vs 6dp-rounded threshold. The whole
  // operator rides ONE key exchange (both rank passes re-sort within
  // the same partitioning; plan-asserted in the spec).
  q("q194_mad_outliers",
    """WITH v194 AS (SELECT user_id, event_id, value AS x FROM events
      |  WHERE value IS NOT NULL),
      |r194 AS (SELECT user_id, event_id, x,
      |    row_number() OVER (PARTITION BY user_id ORDER BY x, event_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM v194),
      |m194 AS (SELECT user_id,
      |    max(CASE WHEN rn = (n + 1) // 2 THEN x END) AS med
      |  FROM r194 GROUP BY 1),
      |d194 AS (SELECT r194.user_id, r194.event_id, abs(x - med) AS dev,
      |    med, n
      |  FROM r194 JOIN m194 USING (user_id)),
      |r294 AS (SELECT user_id, med, n, dev,
      |    row_number() OVER (PARTITION BY user_id ORDER BY dev, event_id)
      |      AS rn2
      |  FROM d194),
      |md194 AS (SELECT user_id,
      |    max(CASE WHEN rn2 = (n + 1) // 2 THEN dev END) AS mad
      |  FROM r294 GROUP BY 1)
      |SELECT d194.user_id, CAST(max(n) AS BIGINT) AS n,
      |  max(med) AS median, max(mad) AS mad,
      |  CAST(sum(CASE WHEN floor(dev * 1e6 + 0.5)/1e6 >
      |      floor(3e0 * 1.4826e0 * mad * 1e6 + 0.5)/1e6
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM d194 JOIN md194 USING (user_id)
      |GROUP BY d194.user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    graft.operators.RankStats.robustOutliers(Tables.events(s, d),
        "user_id", "value", "event_id", k = 3.0)
      .orderBy(col("user_id"))
  }

  // Customer-value segmentation: RFM quartile scores (Hughes 1994)
  // over purchase events, horizon = the global max event time. All
  // three scores are integer rank-quartiles under (metric, user)
  // total orders — q183's equal-count binning, no percentile floats;
  // revenue aggregates in integer micro-units.
  q("q195_rfm_scores",
    """WITH pu195 AS (SELECT user_id, epoch_ms(ts) AS t,
      |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS rev
      |  FROM events WHERE event_type = 'purchase'),
      |hz195 AS (SELECT max(epoch_ms(ts)) AS h FROM events),
      |per195 AS (SELECT user_id,
      |    (h - max(t)) // 86400000 AS recency_days,
      |    CAST(count(*) AS BIGINT) AS frequency,
      |    CAST(sum(rev) AS BIGINT) AS mon
      |  FROM pu195 CROSS JOIN hz195 GROUP BY user_id, h),
      |nn195 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per195),
      |rk195 AS (SELECT user_id, recency_days, frequency, mon,
      |    row_number() OVER (ORDER BY recency_days, user_id) - 1 AS rr,
      |    row_number() OVER (ORDER BY frequency, user_id) - 1 AS rf,
      |    row_number() OVER (ORDER BY mon, user_id) - 1 AS rm
      |  FROM per195),
      |sc195 AS (SELECT user_id, recency_days, frequency, mon,
      |    5 - ((rr * 4) // n + 1) AS r_score,
      |    (rf * 4) // n + 1 AS f_score,
      |    (rm * 4) // n + 1 AS m_score
      |  FROM rk195 CROSS JOIN nn195)
      |SELECT user_id, recency_days, frequency,
      |  CAST(mon AS DOUBLE)/1e6 AS monetary6,
      |  CAST(r_score AS BIGINT) AS r_score,
      |  CAST(f_score AS BIGINT) AS f_score,
      |  CAST(m_score AS BIGINT) AS m_score,
      |  CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
      |FROM sc195 ORDER BY user_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("t"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("rev"))
    val horizon = ev.agg(max(unix_millis(col("ts")))).head().getLong(0)
    graft.operators.Behavior.rfmScores(purchases, "user_id", "t", "rev",
        horizonMs = horizon)
      .orderBy(col("user_id"))
  }

  // Uncertainty for corpus statistics: Poisson-bootstrap 95% CI for
  // the mean document length — the one-pass per-row-independent
  // bootstrap that works at data scale (64 md5-deterministic
  // Poisson(1) reweightings, map-side-combined to 64 integer sum
  // pairs; classic resampling would draw n per replicate). Every
  // weight replays in the oracle; replicate means are identical
  // doubles so the 2.5%/97.5% order-statistic selection agrees.
  q("q196_bootstrap_ci",
    """WITH x196 AS (SELECT CAST(doc_id AS VARCHAR) AS id,
      |    CAST(n_chars AS BIGINT) AS x
      |  FROM documents WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
      |r196 AS (SELECT id, x, j,
      |    CAST('0x' || substr(md5(id || ':' || CAST(j AS VARCHAR)), 1, 15)
      |      AS BIGINT) % 1000000 AS u
      |  FROM x196 CROSS JOIN (SELECT unnest(range(0, 64)) AS j)),
      |w196 AS (SELECT x, j,
      |    CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
      |         WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
      |         WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5
      |         ELSE 6 END AS w
      |  FROM r196),
      |m196 AS (SELECT j, CAST(sum(w * x) AS BIGINT) AS swx,
      |    CAST(sum(w) AS BIGINT) AS sw
      |  FROM w196 GROUP BY j),
      |mu196 AS (SELECT CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) AS mu
      |  FROM m196 WHERE sw > 0),
      |s196 AS (SELECT list_sort(list(mu)) AS l FROM mu196),
      |b196 AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx
      |  FROM x196)
      |SELECT n, CAST(64 AS BIGINT) AS b,
      |  floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5)/1e6
      |    AS mean6,
      |  floor(l[2] * 1e6 + 0.5)/1e6 AS ci_lo6,
      |  floor(l[63] * 1e6 + 0.5)/1e6 AS ci_hi6
      |FROM s196 CROSS JOIN b196""".stripMargin) { (s, d) =>
    graft.operators.RankStats.poissonBootstrapMean(
      Tables.documents(s, d), "doc_id", "n_chars", b = 64)
  }

  // Corpus-health audit, tail edition: Hill tail-index over the
  // top-256 document lengths — HOW heavy is the length tail (α ≤ 2 =
  // infinite variance, where mean-based chunk/packing budgets lie).
  // The quantitative companion to q187's Zipf slope and q188's Gini.
  // Micro-unit logs over a k+1-row TakeOrderedAndProject frame.
  q("q197_hill_tail",
    """WITH t197 AS (SELECT x, rn FROM (
      |    SELECT CAST(n_chars AS BIGINT) AS x, doc_id,
      |      row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
      |    FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
      |  WHERE rn <= 257),
      |k197 AS (SELECT x AS xmin FROM t197 WHERE rn = 257),
      |s197 AS (SELECT count(*) AS k,
      |    CAST(sum(CAST(floor(
      |      (ln(CAST(x AS DOUBLE)) - ln(CAST(xmin AS DOUBLE)))
      |      * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sl,
      |    max(xmin) AS xmin
      |  FROM t197 CROSS JOIN k197 WHERE rn <= 256)
      |SELECT CAST(k AS BIGINT) AS k, xmin AS x_kplus1,
      |  floor(CAST(sl AS DOUBLE) / CAST(k AS DOUBLE) / 1e6 * 1e6 + 0.5)/1e6
      |    AS gamma6,
      |  CASE WHEN sl > 0 THEN floor(1e0 /
      |      (CAST(sl AS DOUBLE) / CAST(k AS DOUBLE) / 1e6) * 1e6 + 0.5)/1e6
      |  END AS alpha6
      |FROM s197""".stripMargin) { (s, d) =>
    TextAnalysis.hillTailIndex(Tables.documents(s, d), "n_chars",
      "doc_id", k = 256)
  }

  // Cross-series analytics: CCF between daily view and purchase
  // counts at lags −3..+3 — does one stream LEAD the other, the
  // lagged dependence q172's same-bucket correlation cannot see.
  // Missing grid days are 0 (absent day = zero events); per-lag
  // Pearson over the overlap with exact integer moments; the shifted
  // columns ride ONE calendar-bounded ordered window.
  q("q198_ccf", {
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    def cN(l: Int) = if (l < 0) s"ym${-l}" else if (l > 0) s"yp$l" else "yv"
    val rows = (-3 to 3).map { l =>
      val c = cN(l)
      val n = dd(s"sum(CASE WHEN $c IS NOT NULL THEN 1 ELSE 0 END)")
      val sx = dd(s"sum(CASE WHEN $c IS NOT NULL THEN xv ELSE 0 END)")
      val sy = dd(s"sum(CASE WHEN $c IS NOT NULL THEN $c ELSE 0 END)")
      val sxx = dd(s"sum(CASE WHEN $c IS NOT NULL THEN xv * xv ELSE 0 END)")
      val syy = dd(s"sum(CASE WHEN $c IS NOT NULL THEN $c * $c ELSE 0 END)")
      val sxy = dd(s"sum(CASE WHEN $c IS NOT NULL THEN xv * $c ELSE 0 END)")
      val va = s"$n * $sxx - $sx * $sx"
      val vb = s"$n * $syy - $sy * $sy"
      val cov = s"$n * $sxy - $sx * $sy"
      s"""SELECT CAST($l AS BIGINT) AS lag,
         |  CAST(sum(CASE WHEN $c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pairs,
         |  CASE WHEN $va > 0 AND $vb > 0
         |       THEN floor(($cov) / sqrt(($va) * ($vb)) * 1e6 + 0.5)/1e6
         |  END AS ccf6
         |FROM s198""".stripMargin
    }
    s"""WITH e198 AS (SELECT epoch_ms(ts) // 86400000 AS t, event_type
       |  FROM events),
       |bx198 AS (SELECT t, CAST(count(*) AS BIGINT) AS xv FROM e198
       |  WHERE event_type = 'view' GROUP BY t),
       |by198 AS (SELECT t, CAST(count(*) AS BIGINT) AS yv FROM e198
       |  WHERE event_type = 'purchase' GROUP BY t),
       |bd198 AS (SELECT min(t) AS lo, max(t) AS hi FROM
       |  (SELECT t FROM bx198 UNION ALL SELECT t FROM by198)),
       |gr198 AS (SELECT unnest(range(lo, hi + 1)) AS t FROM bd198),
       |g198 AS (SELECT gr198.t, coalesce(xv, 0) AS xv,
       |    coalesce(yv, 0) AS yv
       |  FROM gr198 LEFT JOIN bx198 ON bx198.t = gr198.t
       |             LEFT JOIN by198 ON by198.t = gr198.t),
       |s198 AS (SELECT xv, yv,
       |    lag(yv, 3) OVER (ORDER BY t) AS ym3,
       |    lag(yv, 2) OVER (ORDER BY t) AS ym2,
       |    lag(yv, 1) OVER (ORDER BY t) AS ym1,
       |    lead(yv, 1) OVER (ORDER BY t) AS yp1,
       |    lead(yv, 2) OVER (ORDER BY t) AS yp2,
       |    lead(yv, 3) OVER (ORDER BY t) AS yp3
       |  FROM g198)
       |${rows.mkString("\n|UNION ALL\n|").stripMargin}
       |ORDER BY lag""".stripMargin
  }) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(expr("unix_millis(ts) div 86400000").as("t"),
        col("event_type"))
    val xs = ev.filter(col("event_type") === "view")
      .groupBy(col("t")).agg(count(lit(1)).as("v"))
    val ys = ev.filter(col("event_type") === "purchase")
      .groupBy(col("t")).agg(count(lit(1)).as("v"))
    graft.operators.TimeSeries.crossCorrelation(xs, ys, "t", "v",
        maxLag = 3)
      .orderBy(col("lag"))
  }

  // Cohort economics: the LTV curve — revenue per user accumulated
  // by (first-seen cohort day, week offset), q125's retention grid
  // with money on it. Revenue stays integer micro-units through the
  // per-cohort cumulative; the per-user ratio divides once per
  // output row, micro-rounded.
  q("q199_ltv_curve",
    """WITH r199 AS (SELECT user_id AS u, epoch_ms(ts) // 86400000 AS d,
      |    CASE WHEN event_type = 'purchase'
      |         THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT)
      |         ELSE 0 END AS r
      |  FROM events),
      |ch199 AS (SELECT u, min(d) AS c FROM r199 GROUP BY 1),
      |sz199 AS (SELECT c, CAST(count(*) AS BIGINT) AS cohort_size
      |  FROM ch199 GROUP BY 1),
      |wk199 AS (SELECT ch199.c, r199.u, (d - c) // 7 AS week_offset, r
      |  FROM r199 JOIN ch199 ON ch199.u = r199.u),
      |cl199 AS (SELECT c, week_offset,
      |    CAST(count(DISTINCT u) AS BIGINT) AS n_active,
      |    CAST(sum(r) AS BIGINT) AS wr
      |  FROM wk199 GROUP BY 1, 2),
      |cm199 AS (SELECT c, week_offset, n_active, wr,
      |    CAST(sum(wr) OVER (PARTITION BY c ORDER BY week_offset
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM cl199)
      |SELECT c AS cohort_epoch_day, week_offset, cohort_size, n_active,
      |  CAST(wr AS DOUBLE)/1e6 AS week_revenue6,
      |  CAST(cum AS DOUBLE)/1e6 AS cum_revenue6,
      |  floor(CAST(cum AS DOUBLE) / CAST(cohort_size AS DOUBLE) + 0.5)/1e6
      |    AS ltv_per_user6
      |FROM cm199 JOIN sz199 USING (c)
      |ORDER BY cohort_epoch_day, week_offset""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_millis(col("ts")).as("tms"),
        when(col("event_type") === "purchase",
          floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(0L).as("rev"))
    graft.operators.Behavior.ltvCurve(ev, "user_id", "tms", "rev")
      .orderBy(col("cohort_epoch_day"), col("week_offset"))
  }

  // Seasonality audit: the weekday profile of daily event volume +
  // η² (SS_between/SS_total — the one-way ANOVA effect size): is the
  // weekly pattern real or noise. dow = (epochDay + 4) % 7,
  // 0 = Sunday. Exact integer moments; the 7 group SS terms
  // micro-snap before summing.
  q("q200_dow_seasonality", {
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    val grand = s"${dd("sx")} * ${dd("sx")} / ${dd("n")}"
    val ssb = s"${dd("st")} / 1e6 - $grand"
    val sst = s"${dd("sxx")} - $grand"
    s"""WITH dl200 AS (SELECT epoch_ms(ts) // 86400000 AS t,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1),
       |dw200 AS (SELECT (t + 4) % 7 AS dow, x FROM dl200),
       |g200 AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
       |    CAST(sum(x) AS BIGINT) AS sg, CAST(sum(x * x) AS BIGINT) AS ssg
       |  FROM dw200 GROUP BY 1),
       |t200 AS (SELECT CAST(sum(n_days) AS BIGINT) AS n,
       |    CAST(sum(sg) AS BIGINT) AS sx, CAST(sum(ssg) AS BIGINT) AS sxx
       |  FROM g200),
       |s200 AS (SELECT CAST(sum(CAST(floor(
       |    ${dd("sg")} * ${dd("sg")} / ${dd("n_days")} * 1e6 + 0.5)
       |    AS BIGINT)) AS BIGINT) AS st FROM g200)
       |SELECT dow, n_days, sg AS total_events,
       |  floor(${dd("sg")} / ${dd("n_days")} * 1e6 + 0.5)/1e6 AS mean6,
       |  CASE WHEN $sst > 0 THEN floor(($ssb) / ($sst) * 1e6 + 0.5)/1e6
       |  END AS eta2_6
       |FROM g200 CROSS JOIN t200 CROSS JOIN s200
       |ORDER BY dow""".stripMargin
  }) { (s, d) =>
    val daily = Tables.events(s, d)
      .select(expr("unix_millis(ts) div 86400000").as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("x"))
    graft.operators.TimeSeries.dowSeasonality(daily, "t", "x")
      .orderBy(col("dow"))
  }

  // Sequential analysis: Wald's SPRT on the event stream — is the
  // purchase rate 0.2 (H0) or 0.3 (H1), decided the FIRST moment the
  // evidence suffices (α=β=0.05), the always-valid peeking q189's
  // fixed-horizon z forbids. LLR_t = s·A + (t−s)·B rides ONE
  // packed-counter prefix sum (q192's discipline); A/B/thresholds
  // are integer micro literals (405465, −133531, ±2944439), so every
  // crossing compare is exact integer arithmetic.
  q("q201_sprt",
    """WITH tr201 AS (SELECT epoch_ms(ts) AS t, event_id,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
      |  FROM events),
      |c201 AS (SELECT x,
      |    row_number() OVER (ORDER BY t, event_id) AS i,
      |    CAST(sum(x) OVER (ORDER BY t, event_id ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS s
      |  FROM tr201),
      |l201 AS (SELECT i, s, s * 405465 + (i - s) * (-133531) AS llr
      |  FROM c201),
      |a201 AS (SELECT
      |    CAST(min(CASE WHEN llr >= 2944439 THEN i END) AS BIGINT)
      |      AS up_idx,
      |    CAST(min(CASE WHEN llr <= -2944439 THEN i END) AS BIGINT)
      |      AS dn_idx
      |  FROM l201),
      |t201 AS (SELECT CAST(count(*) AS BIGINT) AS n_trials,
      |    CAST(sum(x) AS BIGINT) AS n_success FROM tr201)
      |SELECT n_trials, n_success, up_idx, dn_idx,
      |  CASE WHEN up_idx IS NOT NULL AND (dn_idx IS NULL OR up_idx < dn_idx)
      |       THEN 'accept_h1'
      |       WHEN dn_idx IS NOT NULL THEN 'accept_h0'
      |       ELSE 'continue' END AS decision,
      |  CAST(n_success * 405465 + (n_trials - n_success) * (-133531)
      |    AS DOUBLE) / 1e6 AS final_llr6
      |FROM a201 CROSS JOIN t201""".stripMargin) { (s, d) =>
    val tr = Tables.events(s, d)
      .select(unix_millis(col("ts")).as("t"), col("event_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("x"))
    graft.operators.RankStats.sprt(tr, Seq("t", "event_id"), "x",
      p0 = 0.2, p1 = 0.3)
  }

  // Continuous-outcome experimentation: per-event-type Welch's
  // unequal-variance t-test of `value` means between the q189 user
  // split (user_id % 2) — the readout for revenue/latency metrics
  // where q189's proportion z doesn't apply. Per-arm moments are
  // exact (Σx int64 micro, Σx² decimal128 micro²); the
  // t/df/p chain is one row of identical-text double math
  // (p via the A&S 7.1.26 normal polynomial — `exp` is the only
  // transcendental, 6dp-snapped).
  q("q202_welch_ttest", {
    val w = graft.operators.Hypothesis.welchSql(
      "n_a", "sa", "qa", "n_b", "sb", "qb")
    s"""WITH v202 AS (SELECT event_type, user_id % 2 AS arm,
       |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS xm
       |  FROM events WHERE value IS NOT NULL),
       |m202 AS (SELECT event_type,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN arm = 0 THEN xm ELSE 0 END) AS BIGINT) AS sa,
       |    sum(CASE WHEN arm = 0 THEN CAST(xm AS HUGEINT) * xm
       |        ELSE 0 END) AS qa,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN arm = 1 THEN xm ELSE 0 END) AS BIGINT) AS sb,
       |    sum(CASE WHEN arm = 1 THEN CAST(xm AS HUGEINT) * xm
       |        ELSE 0 END) AS qb
       |  FROM v202 GROUP BY 1)
       |SELECT event_type, n_a, n_b,
       |  ${w("mean_a6")} AS mean_a6, ${w("mean_b6")} AS mean_b6,
       |  ${w("diff6")} AS diff6, ${w("t6")} AS t6, ${w("df6")} AS df6,
       |  ${w("p6")} AS p6, ${w("significant")} AS significant
       |FROM m202 ORDER BY event_type""".stripMargin
  }) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("event_type"),
        pmod(col("user_id"), lit(2L)).as("arm"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("xm"))
    graft.operators.Hypothesis.welchTTest(ev, Seq("event_type"),
        "arm", "xm")
      .orderBy(col("event_type"))
  }

  private val zoneMapDirs = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), String]

  /** Memoized q210 fixture: lineitem sort-clustered by ship day into
    * 64 zone-mapped files (ScaleOps.zoneMapLayout). Built once per
    * (session, sf dir); the query then pays only the metadata read +
    * the overlapping files — which is the thing q210 measures.
    */
  private def zoneMappedLineitem(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    sweepDeadEntries(zoneMapDirs)
    zoneMapDirs.computeIfAbsent((s, d), _ => {
      val dir = scratchDir("graft-zonemap")
      // l_shipdate reads as TIMESTAMP_NTZ; sessions pin UTC so the
      // cast interprets the naive wall time as DuckDB's epoch_ms does
      val li = Tables.lineitem(s, d).select(
        expr("unix_millis(cast(l_shipdate as timestamp)) div 86400000")
          .as("ship_day"),
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice") * lit(100) + lit(0.5)).cast("long")
          .as("cents"))
      graft.operators.ScaleOps.zoneMapLayout(li,
        Seq("ship_day", "l_orderkey", "l_linenumber"), col("ship_day"),
        numFiles = 64, dir)
      dir
    })
  }

  // Zone-map file skipping: the file-level min/max index an
  // UNPARTITIONED lakehouse table uses where directory partitioning
  // (q157) is too coarse. The layout is 64 sort-clustered files with
  // a persisted per-file (min, max, count) zone map; a March-1996
  // range query reads the metadata-sized map, keeps only overlapping
  // files (a `__zfile` partition filter — the skipped files'
  // directories are pruned at planning time, real IO), and applies
  // the residual predicate to the boundary files. Output reports the
  // skip ratio next to the answer: files scanned vs total, rows
  // scanned vs matched. Revenue rides exact integer cents.
  q("q210_zonemap_skip", {
    val lo = "(epoch_ms(TIMESTAMP '1996-03-01 00:00:00') // 86400000)"
    val hi = "(epoch_ms(TIMESTAMP '1996-03-31 00:00:00') // 86400000)"
    s"""WITH c210 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
       |r210 AS (SELECT epoch_ms(l_shipdate) // 86400000 AS ship_day,
       |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
       |    row_number() OVER (ORDER BY epoch_ms(l_shipdate) // 86400000,
       |      l_orderkey, l_linenumber) - 1 AS rk
       |  FROM lineitem),
       |p210 AS (SELECT ship_day, cents,
       |    rk // greatest(1, (n + 63) // 64) AS zf
       |  FROM r210 CROSS JOIN c210),
       |zm210 AS (SELECT zf, min(ship_day) AS mn, max(ship_day) AS mx
       |  FROM p210 GROUP BY 1),
       |pk210 AS (SELECT zf FROM zm210 WHERE mx >= $lo AND mn <= $hi),
       |s210 AS (SELECT p210.ship_day, p210.cents
       |  FROM p210 JOIN pk210 ON pk210.zf = p210.zf),
       |t210 AS (SELECT CAST(count(*) AS BIGINT) AS rows_scanned,
       |    CAST(sum(CASE WHEN ship_day BETWEEN $lo AND $hi
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       |    CAST(sum(CASE WHEN ship_day BETWEEN $lo AND $hi
       |      THEN cents ELSE 0 END) AS BIGINT) AS cm
       |  FROM s210)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM zm210) AS n_files,
       |  (SELECT CAST(count(*) AS BIGINT) FROM pk210) AS n_files_scanned,
       |  rows_scanned, n_match, CAST(cm AS DOUBLE)/1e2 AS revenue2
       |FROM t210""".stripMargin
  }) { (s, d) =>
    val dir = zoneMappedLineitem(s, d)
    def loD = expr(
      "unix_millis(timestamp'1996-03-01 00:00:00') div 86400000")
    def hiD = expr(
      "unix_millis(timestamp'1996-03-31 00:00:00') div 86400000")
    val (scan, nFiles, nScanned) = graft.operators.ScaleOps
      .zoneMapPrunedScan(s, dir, col("ship_day"), loD, hiD)
    val inR = col("ship_day") >= loD && col("ship_day") <= hiD
    scan.agg(count(lit(1)).as("rows_scanned"),
        sum(when(inR, 1L).otherwise(0L)).as("n_match"),
        sum(when(inR, col("cents")).otherwise(0L)).as("__cm"))
      .select(lit(nFiles).as("n_files"),
        lit(nScanned).as("n_files_scanned"),
        col("rows_scanned"), col("n_match"),
        (col("__cm").cast("double") / lit(1e2)).as("revenue2"))
  }

  // HITS hubs/authorities over the bipartite customer→part purchase
  // graph (Kleinberg 1999, 2 rounds): authority(part) = Σ hub of its
  // buyers, mutually reinforced — the signal plain degree can't
  // see. Scores ride integer micro longs with per-round
  // MAX-normalization (order-free where an L2 norm would sum
  // floats); the oracle unrolls both rounds over the same distinct
  // edge frame.
  q("q215_hits", {
    // one normalize block: raw sums grid-filled over the node side,
    // then micro max-norm — identical text each round
    def step(side: String, nodes: String, idc: String, other: String,
        prevScores: String, tag: String) =
      s"""${tag}r AS (SELECT $idc, CAST(sum(sc) AS BIGINT) AS raw
         |  FROM e215 JOIN $prevScores USING ($other) GROUP BY $idc),
         |${tag}g AS (SELECT $nodes.$idc, coalesce(raw, 0) AS raw
         |  FROM $nodes LEFT JOIN ${tag}r ON ${tag}r.$idc = $nodes.$idc),
         |${tag}m AS (SELECT max(raw) AS mx FROM ${tag}g),
         |$tag AS (SELECT $idc, CASE WHEN mx > 0 THEN
         |    CAST(floor(CAST(raw AS DOUBLE) / CAST(mx AS DOUBLE)
         |      * 1e6 + 0.5) AS BIGINT) ELSE 0 END AS sc
         |  FROM ${tag}g CROSS JOIN ${tag}m)""".stripMargin
    s"""WITH e215 AS (SELECT DISTINCT o_custkey AS s, l_partkey AS d
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |sn AS (SELECT DISTINCT c_custkey AS s FROM customer),
       |dn AS (SELECT DISTINCT p_partkey AS d FROM part),
       |h0 AS (SELECT s, CAST(1000000 AS BIGINT) AS sc FROM sn),
       |${step("d", "dn", "d", "s", "h0", "a1")},
       |${step("s", "sn", "s", "d", "a1", "h1")},
       |${step("d", "dn", "d", "s", "h1", "a2")}
       |SELECT d AS p_partkey, CAST(sc AS DOUBLE)/1e6 AS authority6
       |FROM a2 ORDER BY p_partkey""".stripMargin
  }) { (s, d) =>
    val edges = Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
    val (_, auths) = graft.operators.GraphOps.hits(
      Tables.customer(s, d).select(col("c_custkey").as("cust")),
      Tables.part(s, d).select(col("p_partkey").as("part")),
      edges, "cust", "part", rounds = 2,
      nodesDistinct = true) // c_custkey/p_partkey are primary keys
    auths.select(col("part").as("p_partkey"), col("authority6"))
      .orderBy(col("p_partkey"))
  }

  // Additive seasonal decomposition of daily event volume:
  // x = trend (centered 7-day mean over the zero-filled grid)
  // + seasonal (per-weekday mean of the detrended series)
  // + residual — the "is Tuesday ALWAYS low or is this one broken"
  // split. Trend/seasonal snap to micro; detrended/residual are
  // exact integer arithmetic after. Edge days without a full ±3
  // window are excluded.
  q("q219_seasonal_decompose",
    """WITH d219 AS (SELECT epoch_ms(ts) // 86400000 AS t,
      |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
      |b219 AS (SELECT min(t) AS lo, max(t) AS hi FROM d219),
      |g219 AS (SELECT gr.t, coalesce(x, 0) AS x
      |  FROM (SELECT unnest(range(lo, hi + 1)) AS t FROM b219) gr
      |  LEFT JOIN d219 ON d219.t = gr.t),
      |f219 AS (SELECT t, x,
      |    CAST(sum(x) OVER (ORDER BY t
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
      |    count(*) OVER (ORDER BY t
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      |  FROM g219),
      |dt219 AS (SELECT t, x,
      |    CAST(floor(CAST(s7 AS DOUBLE) / 7e0 * 1e6 + 0.5) AS BIGINT)
      |      AS trend,
      |    (t + 4) % 7 AS dow,
      |    x * 1000000 - CAST(floor(CAST(s7 AS DOUBLE) / 7e0 * 1e6
      |      + 0.5) AS BIGINT) AS det
      |  FROM f219 WHERE c7 = 7),
      |se219 AS (SELECT dow, CAST(floor(CAST(sum(det) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS seas
      |  FROM dt219 GROUP BY 1)
      |SELECT t, x, dt219.dow, CAST(trend AS DOUBLE)/1e6 AS trend6,
      |  CAST(seas AS DOUBLE)/1e6 AS seasonal6,
      |  CAST(det - seas AS DOUBLE)/1e6 AS residual6
      |FROM dt219 JOIN se219 ON se219.dow = dt219.dow
      |ORDER BY t""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .select(expr("unix_millis(ts) div 86400000").as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("x"))
    graft.operators.TimeSeries.seasonalDecompose(daily, "t", "x")
      .orderBy(col("t"))
  }

  // Corpus planning: Heaps'-law fit V(N) ≈ k·N^β over ten doc_id-
  // order prefixes — "how much NEW vocabulary does the next 10× of
  // corpus buy" (β≈0.5 natural text; ≈1 id-pollution; ≈0 templated).
  // V_i = tokens whose FIRST-occurrence rank lands in prefix i (one
  // token aggregate, no per-checkpoint pass); ln terms nano-snap
  // before the 4-moment log-log OLS.
  q("q220_heaps_law", {
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    def nano(e: String) = s"CAST(floor(($e) * 1e9 + 0.5) AS BIGINT)"
    val (k, sx, sy, sxy, sxx) = (dd("k"), s"(${dd("sx9")} / 1e9)",
      s"(${dd("sy9")} / 1e9)", s"(${dd("sxy9")} / 1e9)",
      s"(${dd("sxx9")} / 1e9)")
    val den = s"($sxx - $sx * $sx / $k)"
    val beta = s"(($sxy - $sx * $sy / $k) / $den)"
    def p6(e: String) = s"floor(($e) * 1e6 + 0.5)/1e6"
    s"""WITH r220 AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY doc_id) - 1 AS rk
       |  FROM documents),
       |nd220 AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
       |cp220 AS (SELECT chk, (nd * chk + 9) // 10 AS thr
       |  FROM (SELECT unnest(range(1, 11)) AS chk) CROSS JOIN nd220),
       |tk220 AS (SELECT r220.rk, t.tok
       |  FROM (SELECT doc_id, unnest($sqlTokens) AS tok
       |    FROM documents) t
       |  JOIN r220 ON r220.doc_id = t.doc_id),
       |dc220 AS (SELECT rk, CAST(count(*) AS BIGINT) AS c
       |  FROM tk220 GROUP BY 1),
       |na220 AS (SELECT chk, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    CAST(max(thr) AS BIGINT) AS n_docs_prefix
       |  FROM dc220 JOIN cp220 ON dc220.rk < cp220.thr GROUP BY 1),
       |fa220 AS (SELECT tok, min(rk) AS fr FROM tk220 GROUP BY 1),
       |va220 AS (SELECT chk, CAST(count(*) AS BIGINT) AS vocab
       |  FROM fa220 JOIN cp220 ON fa220.fr < cp220.thr GROUP BY 1),
       |pt220 AS (SELECT na220.chk, n_docs_prefix, n_tokens, vocab
       |  FROM na220 JOIN va220 ON va220.chk = na220.chk),
       |m220 AS (SELECT CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(${nano(s"ln(${dd("n_tokens")})")}) AS BIGINT)
       |      AS sx9,
       |    CAST(sum(${nano(s"ln(${dd("vocab")})")}) AS BIGINT) AS sy9,
       |    CAST(sum(${nano(
             s"ln(${dd("n_tokens")}) * ln(${dd("vocab")})")})
       |      AS BIGINT) AS sxy9,
       |    CAST(sum(${nano(
             s"ln(${dd("n_tokens")}) * ln(${dd("n_tokens")})")})
       |      AS BIGINT) AS sxx9
       |  FROM pt220),
       |f220 AS (SELECT
       |    CASE WHEN $den > 0 THEN ${p6(beta)} END AS beta6,
       |    CASE WHEN $den > 0
       |      THEN ${p6(s"($sy / $k - $beta * ($sx / $k))")} END AS logk6
       |  FROM m220)
       |SELECT chk, n_docs_prefix, n_tokens, vocab, beta6, logk6
       |FROM pt220 CROSS JOIN f220 ORDER BY chk""".stripMargin
  }) { (s, d) =>
    graft.operators.TextAnalysis.heapsLaw(Tables.documents(s, d),
        "doc_id", "text", checkpoints = 10)
      .orderBy(col("chk"))
  }

  // Stratified experimentation: Cochran–Mantel–Haenszel pooled
  // arm→conversion test across signup-week cohorts + the MH pooled
  // odds ratio — association pooled WITHOUT mixing cohort base
  // rates (the Simpson guard q189's single 2×2 walks into). Cells
  // exact integers; per-stratum terms nano-snap before the
  // cross-stratum sums.
  q("q218_cmh_test", {
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    def nano(e: String) = s"CAST(floor(($e) * 1e9 + 0.5) AS BIGINT)"
    val (n1, n0, m1, m0) = ("(a + b)", "(c + d)", "(a + c)", "(b + d)")
    val nk = "(a + b + c + d)"
    val dev = s"(${dd("a")} - ${dd(n1)} * ${dd(m1)} / ${dd(nk)})"
    val vterm = s"(${dd(n1)} * ${dd(n0)} * ${dd(m1)} * ${dd(m0)} / " +
      s"(${dd(nk)} * ${dd(nk)} * (${dd(nk)} - 1e0)))"
    val ad = s"(${dd("a")} * ${dd("d")} / ${dd(nk)})"
    val bc = s"(${dd("b")} * ${dd("c")} / ${dd(nk)})"
    val chi2 = "((CAST(sd9 AS DOUBLE) / 1e9) * (CAST(sd9 AS DOUBLE) " +
      "/ 1e9) / (CAST(sv9 AS DOUBLE) / 1e9))"
    val p = graft.operators.Hypothesis.normP2Sql(s"sqrt($chi2)")
    val orMh = "((CAST(sad9 AS DOUBLE) / 1e9) / " +
      "(CAST(sbc9 AS DOUBLE) / 1e9))"
    def p6(e: String) = s"floor(($e) * 1e6 + 0.5)/1e6"
    s"""WITH e218 AS (SELECT user_id, epoch_ms(ts) // 86400000 AS d,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pur
       |  FROM events),
       |u218 AS (SELECT user_id, user_id % 2 AS arm, min(d) // 7 AS wk,
       |    max(pur) AS conv
       |  FROM e218 GROUP BY 1, 2),
       |c218 AS (SELECT wk,
       |    CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS a,
       |    CAST(sum(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS b,
       |    CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS c,
       |    CAST(sum(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS d
       |  FROM u218 GROUP BY 1),
       |t218 AS (SELECT
       |    CASE WHEN $nk > 1 THEN ${nano(dev)} ELSE 0 END AS dev9,
       |    CASE WHEN $nk > 1 THEN ${nano(vterm)} ELSE 0 END AS v9,
       |    CASE WHEN $nk > 1 THEN ${nano(ad)} ELSE 0 END AS ad9,
       |    CASE WHEN $nk > 1 THEN ${nano(bc)} ELSE 0 END AS bc9,
       |    CASE WHEN $nk > 1 THEN 1 ELSE 0 END AS use9,
       |    $nk AS nk
       |  FROM c218),
       |s218 AS (SELECT CAST(sum(use9) AS BIGINT) AS n_strata,
       |    CAST(sum(nk) AS BIGINT) AS n_units,
       |    CAST(sum(dev9) AS BIGINT) AS sd9,
       |    CAST(sum(v9) AS BIGINT) AS sv9,
       |    CAST(sum(ad9) AS BIGINT) AS sad9,
       |    CAST(sum(bc9) AS BIGINT) AS sbc9
       |  FROM t218)
       |SELECT n_strata, n_units,
       |  CASE WHEN sv9 > 0 THEN ${p6(chi2)} END AS chi2_6,
       |  CASE WHEN sv9 > 0 THEN ${p6(p)} END AS p6,
       |  CASE WHEN sv9 > 0 THEN ${p6(p)} <= 0.05 END AS significant,
       |  CASE WHEN sbc9 > 0 THEN ${p6(orMh)} END AS or_mh6
       |FROM s218""".stripMargin
  }) { (s, d) =>
    val ev = Tables.events(s, d).select(col("user_id"),
      expr("unix_millis(ts) div 86400000").as("day"),
      when(col("event_type") === "purchase", 1L).otherwise(0L)
        .as("pur"))
    val units = ev
      .groupBy(col("user_id"), pmod(col("user_id"), lit(2L)).as("arm"))
      .agg(expr("min(day) div 7").as("wk"), max(col("pur")).as("conv"))
    graft.operators.Hypothesis.cmhTest(units, "wk", "arm", "conv")
  }

  // Quantile treatment effects: the per-arm EXACT p25/p50/p75/p90
  // order statistics and their differences — where in the outcome
  // DISTRIBUTION the treatment acts (a mean diff can hide "only the
  // whales moved"). Integer ceil-ranks; per-arm ranks from the one
  // shared range-partitioned prefix pass (q214 machinery).
  q("q216_quantile_effects",
    """WITH v216 AS (SELECT user_id % 2 AS g,
      |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |c216 AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
      |  FROM v216 GROUP BY 1, 2),
      |p216 AS (SELECT g, v, c, CAST(coalesce(sum(c) OVER (
      |    PARTITION BY g ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS below FROM c216),
      |t216 AS (SELECT g, CAST(sum(c) AS BIGINT) AS n
      |  FROM c216 GROUP BY 1),
      |pr216 AS (SELECT unnest([25, 50, 75, 90]) AS pct),
      |q216 AS (SELECT p216.g, pct, CAST(min(v) AS BIGINT) AS q
      |  FROM p216 JOIN t216 ON t216.g = p216.g CROSS JOIN pr216
      |  WHERE below + c >= (n * pct + 99) // 100
      |  GROUP BY 1, 2)
      |SELECT a.pct, CAST(a.q AS DOUBLE)/1e6 AS q_a6,
      |  CAST(b.q AS DOUBLE)/1e6 AS q_b6,
      |  CAST(b.q - a.q AS DOUBLE)/1e6 AS effect6
      |FROM q216 a JOIN q216 b ON a.pct = b.pct AND a.g = 0 AND b.g = 1
      |ORDER BY a.pct""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
      .select(pmod(col("user_id"), lit(2L)).as("arm"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vm"))
    val q = graft.operators.RankStats.groupedExactQuantiles(
        ev, "arm", "vm", Seq(25, 50, 75, 90))
      .localCheckpoint(true) // both sides of the arm pivot below
    val a = q.filter(col("arm") === 0L)
      .select(col("pct"), col("q6").as("q_a6"))
    val b = q.filter(col("arm") === 1L)
      .select(col("pct"), col("q6").as("q_b6"))
    a.join(b, Seq("pct"))
      .select(col("pct"), col("q_a6"), col("q_b6"),
        // micro-exact subtraction: both sides are integer micro/1e6
        ((col("q_b6") * lit(1e6) - col("q_a6") * lit(1e6)) / lit(1e6))
          .as("effect6"))
      .orderBy(col("pct"))
  }

  // Difference-in-differences over the midpoint period split: the
  // (arm × period) 2×2 cell means and the interaction effect
  // (Δpost − Δpre) with its Welch-style standard error from exact
  // cell moments — the readout that separates a true treatment
  // effect from a pre-existing arm imbalance q212 corrects and q202
  // cannot see.
  q("q217_did", {
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    def m(c: String, n: String) = s"(${dd(c)} / 1e6 / ${dd(n)})"
    def va(q: String, sm: String, n: String) =
      s"((${dd(q)} / 1e12 - (${dd(sm)} / 1e6) * (${dd(sm)} / 1e6) / ${dd(n)}) / (${dd(n)} - 1e0))"
    val cells = Seq(("a0", "arm = 0 AND pre = 1"),
      ("a1", "arm = 0 AND pre = 0"),
      ("b0", "arm = 1 AND pre = 1"), ("b1", "arm = 1 AND pre = 0"))
    val moms = cells.map { case (t, w) =>
      s"""CAST(sum(CASE WHEN $w THEN 1 ELSE 0 END) AS BIGINT) AS n_$t,
         |    CAST(sum(CASE WHEN $w THEN y ELSE 0 END) AS BIGINT) AS s_$t,
         |    sum(CASE WHEN $w THEN CAST(y AS HUGEINT) * y
         |      ELSE 0 END) AS q_$t""".stripMargin
    }.mkString(",\n|    ")
    val did = s"((${m("s_b1", "n_b1")} - ${m("s_b0", "n_b0")}) - " +
      s"(${m("s_a1", "n_a1")} - ${m("s_a0", "n_a0")}))"
    val se2 = cells.map { case (t, _) =>
      s"${va(s"q_$t", s"s_$t", s"n_$t")} / ${dd(s"n_$t")}"
    }.mkString("(", " + ", ")")
    val tt = s"($did / sqrt($se2))"
    val p = graft.operators.Hypothesis.normP2Sql(tt)
    val ok = cells.map { case (t, _) => s"n_$t > 1" }.mkString(" AND ") +
      s" AND $se2 > 0"
    def p6(e: String) = s"floor(($e) * 1e6 + 0.5)/1e6"
    s"""WITH e217 AS (SELECT user_id, epoch_ms(ts) // 86400000 AS d,
       |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS xm
       |  FROM events WHERE value IS NOT NULL),
       |b217 AS (SELECT (min(d) + max(d)) // 2 AS mid FROM e217),
       |u217 AS (SELECT user_id, user_id % 2 AS arm,
       |    CASE WHEN d <= mid THEN 1 ELSE 0 END AS pre,
       |    CAST(sum(xm) AS BIGINT) AS y
       |  FROM e217 CROSS JOIN b217 GROUP BY 1, 2, 3),
       |m217 AS (SELECT
       |    $moms
       |  FROM u217)
       |SELECT n_a0, n_a1, n_b0, n_b1,
       |  ${p6(m("s_a0", "n_a0"))} AS mean_a_pre6,
       |  ${p6(m("s_a1", "n_a1"))} AS mean_a_post6,
       |  ${p6(m("s_b0", "n_b0"))} AS mean_b_pre6,
       |  ${p6(m("s_b1", "n_b1"))} AS mean_b_post6,
       |  CASE WHEN $ok THEN ${p6(did)} END AS did6,
       |  CASE WHEN $ok THEN ${p6(tt)} END AS t6,
       |  CASE WHEN $ok THEN ${p6(p)} END AS p6,
       |  CASE WHEN $ok THEN ${p6(p)} <= 0.05 END AS significant
       |FROM m217""".stripMargin
  }) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("user_id"),
        expr("unix_millis(ts) div 86400000").as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("xm"))
    val bounds = ev.agg(
      ((min(col("day")) + max(col("day"))) / lit(2)).cast("long")
        .as("mid"))
    val units = ev.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"), pmod(col("user_id"), lit(2L)).as("arm"),
        when(col("day") <= col("mid"), 1L).otherwise(0L).as("pre"))
      .agg(sum(col("xm")).as("y"))
    graft.operators.Hypothesis.diffInDiff(units, "arm", "pre", "y")
  }

  // CUPED variance-reduced experiment readout: each user's
  // second-half outcome adjusted by their first-half covariate
  // (θ = pooled cov/var), all from ONE exact-moment aggregate over
  // the unit frame — the adjusted diff and the variance-reduction
  // percentage are closed forms of the moments, no per-unit second
  // pass. The period split is the integer midpoint day.
  q("q212_cuped", {
    val c = graft.operators.Hypothesis.cupedSql(
      "n", "n_a", "n_b", "sx", "sy", "sxx", "sxy", "syy",
      "sxa", "sya", "sxb", "syb")
    s"""WITH e212 AS (SELECT user_id, epoch_ms(ts) // 86400000 AS d,
       |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS xm
       |  FROM events WHERE value IS NOT NULL),
       |b212 AS (SELECT (min(d) + max(d)) // 2 AS mid FROM e212),
       |u212 AS (SELECT user_id, user_id % 2 AS arm,
       |    CAST(sum(CASE WHEN d <= mid THEN xm ELSE 0 END) AS BIGINT)
       |      AS x,
       |    CAST(sum(CASE WHEN d > mid THEN xm ELSE 0 END) AS BIGINT)
       |      AS y
       |  FROM e212 CROSS JOIN b212 GROUP BY 1, 2),
       |m212 AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_b,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy,
       |    sum(CAST(y AS HUGEINT) * y) AS syy,
       |    CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT)
       |      AS sxa,
       |    CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT)
       |      AS sya,
       |    CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT)
       |      AS sxb,
       |    CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT)
       |      AS syb
       |  FROM u212)
       |SELECT n, n_a, n_b, ${c("theta6")} AS theta6,
       |  ${c("diff_raw6")} AS diff_raw6, ${c("diff_adj6")} AS diff_adj6,
       |  ${c("var_reduction6")} AS var_reduction6
       |FROM m212""".stripMargin
  }) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("user_id"),
        expr("unix_millis(ts) div 86400000").as("d"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("xm"))
    val bounds = ev.agg(
      ((min(col("d")) + max(col("d"))) / lit(2)).cast("long").as("mid"))
    val units = ev.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"),
        pmod(col("user_id"), lit(2L)).as("arm"))
      .agg(sum(when(col("d") <= col("mid"), col("xm")).otherwise(0L))
          .as("x"),
        sum(when(col("d") > col("mid"), col("xm")).otherwise(0L))
          .as("y"))
    graft.operators.Hypothesis.cuped(units, "arm", "x", "y")
  }

  // Experiment health panel: SRM (1-dof χ² of the unit split vs
  // 50/50 — the "is the assignment broken" alarm, flagged at the
  // conventional p < 0.001) and the minimum detectable effect at
  // α=0.05 / 80% power — both from ONE exact-moment aggregate over
  // the per-user outcome frame.
  q("q213_experiment_health", {
    val h = graft.operators.Hypothesis.experimentHealthSql(
      "n", "n_a", "n_b", "sy", "syy")
    s"""WITH u213 AS (SELECT user_id, user_id % 2 AS arm,
       |    CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT))
       |      AS BIGINT) AS y
       |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
       |m213 AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_b,
       |    CAST(sum(y) AS BIGINT) AS sy,
       |    sum(CAST(y AS HUGEINT) * y) AS syy
       |  FROM u213)
       |SELECT n, n_a, n_b, ${h("srm_chi2_6")} AS srm_chi2_6,
       |  ${h("srm_p6")} AS srm_p6, ${h("srm_flag")} AS srm_flag,
       |  ${h("sd6")} AS sd6, ${h("mde_abs6")} AS mde_abs6,
       |  ${h("mde_rel6")} AS mde_rel6
       |FROM m213""".stripMargin
  }) { (s, d) =>
    val units = Tables.events(s, d).filter(col("value").isNotNull)
      .groupBy(col("user_id"), pmod(col("user_id"), lit(2L)).as("arm"))
      .agg(sum(floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
        .as("y"))
    graft.operators.Hypothesis.experimentHealth(units, "arm", "y")
  }

  // Robust experiment readout: per-arm winsorized mean over EXACT
  // [p5, p95] order statistics — ranks in integer arithmetic
  // (ceil(pct·n/100) as (n·pct+99)//100; a float 0.05·n rounds the
  // rank UP on exact multiples), per-arm ranks from ONE shared
  // range-partitioned prefix sum (global prefix minus the arm's
  // offset — any number of groups, one pass).
  q("q214_winsorized_readout",
    """WITH v214 AS (SELECT user_id % 2 AS g,
      |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |c214 AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
      |  FROM v214 GROUP BY 1, 2),
      |p214 AS (SELECT g, v, c, CAST(coalesce(sum(c) OVER (
      |    PARTITION BY g ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS below FROM c214),
      |t214 AS (SELECT g, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(v * c) AS BIGINT) AS s FROM c214 GROUP BY 1),
      |k214 AS (SELECT p214.g, v, c, below + c AS cum,
      |    (n * 5 + 99) // 100 AS klo, (n * 95 + 99) // 100 AS khi
      |  FROM p214 JOIN t214 ON t214.g = p214.g),
      |st214 AS (SELECT g,
      |    CAST(min(CASE WHEN cum >= klo THEN v END) AS BIGINT) AS lo,
      |    CAST(min(CASE WHEN cum >= khi THEN v END) AS BIGINT) AS hi
      |  FROM k214 GROUP BY 1),
      |w214 AS (SELECT k214.g, CAST(sum((CASE WHEN v < lo THEN lo
      |    WHEN v > hi THEN hi ELSE v END) * c) AS BIGINT) AS ws
      |  FROM k214 JOIN st214 ON st214.g = k214.g GROUP BY 1)
      |SELECT t214.g AS arm, n,
      |  floor(CAST(s AS DOUBLE)/1e6/CAST(n AS DOUBLE) * 1e6 + 0.5)/1e6
      |    AS mean6,
      |  CAST(lo AS DOUBLE)/1e6 AS lo6, CAST(hi AS DOUBLE)/1e6 AS hi6,
      |  floor(CAST(ws AS DOUBLE)/1e6/CAST(n AS DOUBLE) * 1e6 + 0.5)/1e6
      |    AS winsorized_mean6
      |FROM t214 JOIN st214 ON st214.g = t214.g
      |JOIN w214 ON w214.g = t214.g
      |ORDER BY arm""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
      .select(pmod(col("user_id"), lit(2L)).as("arm"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vm"))
    graft.operators.RankStats.winsorizedMeans(ev, "arm", "vm")
      .orderBy(col("arm"))
  }

  // Weak-supervision label aggregation: one Dawid–Skene EM round
  // over three synthetic labelers (votes are md5-replayed flips of a
  // latent md5 label at 10/20/35% rates — the oracle regenerates
  // them bit-for-bit). Confusion counts are Laplace-smoothed exact
  // integers; log-weights snap to micro at the 3-row labeler grain,
  // so the per-item relabel is a pure int64 sum compared to 0.
  q("q211_dawid_skene", {
    def h(e: String) =
      s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"
    def lab(l: Int, f: Int) =
      s"""SELECT doc_id, $l AS labeler,
         |  CASE WHEN ${h(s"'lab$l:' || CAST(doc_id AS VARCHAR)")}
         |    % 1000000 < $f THEN 1 - g ELSE g END AS v
         |FROM g211""".stripMargin
    val sens = "(CAST(cp + 1 AS DOUBLE) / CAST(np + 2 AS DOUBLE))"
    val spec = "(CAST(cn + 1 AS DOUBLE) / CAST(nn + 2 AS DOUBLE))"
    val pi = "(CAST(n1 + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))"
    s"""WITH g211 AS (SELECT doc_id,
       |    ${h("CAST(doc_id AS VARCHAR)")} % 2 AS g
       |  FROM documents),
       |v211 AS (${lab(1, 100000)}
       |  UNION ALL ${lab(2, 200000)}
       |  UNION ALL ${lab(3, 350000)}),
       |z211 AS (SELECT doc_id,
       |    CASE WHEN 2 * sum(v) > count(*) THEN 1 ELSE 0 END AS z
       |  FROM v211 GROUP BY 1),
       |m211 AS (SELECT labeler, CAST(count(*) AS BIGINT) AS n_votes,
       |    CAST(sum(CASE WHEN z = 1 AND v = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cp,
       |    CAST(sum(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np,
       |    CAST(sum(CASE WHEN z = 0 AND v = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cn,
       |    CAST(sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nn
       |  FROM v211 JOIN z211 USING (doc_id) GROUP BY 1),
       |w211 AS (SELECT labeler, n_votes,
       |    floor($sens * 1e6 + 0.5)/1e6 AS sens6,
       |    floor($spec * 1e6 + 0.5)/1e6 AS spec6,
       |    CAST(floor(ln($sens / (1e0 - $spec)) * 1e6 + 0.5) AS BIGINT)
       |      AS w1,
       |    CAST(floor(ln((1e0 - $sens) / $spec) * 1e6 + 0.5) AS BIGINT)
       |      AS w0
       |  FROM m211),
       |p211 AS (SELECT CAST(floor(ln($pi / (1e0 - $pi)) * 1e6 + 0.5)
       |    AS BIGINT) AS pm
       |  FROM (SELECT CAST(sum(z) AS BIGINT) AS n1,
       |      CAST(count(*) AS BIGINT) AS n FROM z211)),
       |e211 AS (SELECT doc_id, CAST(sum(CASE WHEN v = 1 THEN w1
       |    ELSE w0 END) AS BIGINT) AS sw
       |  FROM v211 JOIN w211 USING (labeler) GROUP BY 1),
       |f211 AS (SELECT doc_id,
       |    CASE WHEN sw + pm > 0 THEN 1 ELSE 0 END AS z1
       |  FROM e211 CROSS JOIN p211),
       |a211 AS (SELECT labeler,
       |    floor(CAST(sum(CASE WHEN v = z1 THEN 1 ELSE 0 END) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE) * 1e6 + 0.5)/1e6 AS final_agree6
       |  FROM v211 JOIN f211 USING (doc_id) GROUP BY 1)
       |SELECT w211.labeler, n_votes, sens6, spec6, final_agree6
       |FROM w211 JOIN a211 ON a211.labeler = w211.labeler
       |ORDER BY 1""".stripMargin
  }) { (s, d) =>
    import graft.functions.PortableHash.md5Long60
    val base = Tables.documents(s, d).select(col("doc_id"),
      (md5Long60(col("doc_id").cast("string")) % lit(2L)).as("g"))
    val arms = Seq((1, 100000L), (2, 200000L), (3, 350000L))
    val votes = base.select(col("doc_id"), explode(array(arms.map {
      case (l, f) => struct(lit(l).as("labeler"),
        when(md5Long60(concat(lit(s"lab$l:"),
            col("doc_id").cast("string"))) % lit(1000000L) < f,
          lit(1L) - col("g")).otherwise(col("g")).as("v"))
    }: _*)).as("__lv"))
      .select(col("doc_id"), col("__lv.labeler").as("labeler"),
        col("__lv.v").as("v"))
    graft.operators.WeakLabels.dawidSkene(votes, "doc_id", "labeler",
        "v")
      .orderBy(col("labeler"))
  }

  // Distribution-shift monitoring: PSI of the doc-length
  // distribution per source against baseline src0 (fixed-width
  // 50-char bins ×16, clamped; Laplace +1 smoothing keeps ln(p/q)
  // defined on empty bins with exact integer arithmetic). Each bin
  // term nano-snaps before the per-source sum (q190 discipline at
  // 1e-9 — PSI terms are O(1e-4)). One corpus aggregate to the
  // grid; everything after is grid-sized.
  q("q203_psi_drift", {
    val bin = "least(CAST(floor(CAST(greatest(CAST(n_chars AS BIGINT), 0)" +
      " AS DOUBLE) / 50e0) AS BIGINT), 15)"
    val psi = "floor(CAST(s9 AS DOUBLE)/1e9*1e6 + 0.5)/1e6"
    s"""WITH v203 AS (SELECT source AS g, $bin AS bin
       |  FROM documents WHERE n_chars IS NOT NULL),
       |c203 AS (SELECT g, bin, CAST(count(*) AS BIGINT) AS c
       |  FROM v203 GROUP BY 1, 2),
       |gr203 AS (SELECT g, b.bin FROM (SELECT DISTINCT g FROM c203) s
       |  CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b),
       |f203 AS (SELECT gr203.g, gr203.bin, coalesce(c, 0) AS c
       |  FROM gr203 LEFT JOIN c203
       |    ON c203.g = gr203.g AND c203.bin = gr203.bin),
       |t203 AS (SELECT g, CAST(sum(c) AS BIGINT) AS n
       |  FROM f203 GROUP BY 1),
       |p203 AS (SELECT f203.g, bin, n,
       |    CAST(c + 1 AS DOUBLE) / CAST(n + 16 AS DOUBLE) AS p
       |  FROM f203 JOIN t203 ON t203.g = f203.g),
       |b203 AS (SELECT bin, p AS q FROM p203 WHERE g = 'src0'),
       |s203 AS (SELECT p203.g, CAST(max(n) AS BIGINT) AS n_rows,
       |    CAST(sum(CAST(floor((p - q) * ln(p / q) * 1e9 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS s9
       |  FROM p203 JOIN b203 ON b203.bin = p203.bin
       |  WHERE g <> 'src0' GROUP BY 1)
       |SELECT g AS source, n_rows, $psi AS psi6, $psi > 0.2 AS drifted
       |FROM s203 ORDER BY source""".stripMargin
  }) { (s, d) =>
    graft.operators.Audit.psiDrift(Tables.documents(s, d),
        "source", "n_chars", baseline = "src0",
        binWidth = 50L, nBins = 16)
      .orderBy(col("source"))
  }

  // Pairwise source drift MATRIX: Jensen–Shannon divergence between
  // every source pair's unigram distributions over the top-64 global
  // tokens + a rest bucket (profile-bounded: the pair grid is
  // G²·65 whatever the corpus vocabulary does; the top-k is a
  // distributed TakeOrderedAndProject with (count desc, token)
  // ties, never a vocab window). Bucket terms nano-snap before the
  // per-pair sum.
  q("q204_jsd_sources", {
    val term =
      "CASE WHEN a.p > 0 THEN 0.5 * a.p * ln(2e0 * a.p / (a.p + b2.p))" +
      " ELSE 0e0 END + CASE WHEN b2.p > 0 THEN 0.5 * b2.p *" +
      " ln(2e0 * b2.p / (a.p + b2.p)) ELSE 0e0 END"
    s"""WITH t204 AS (SELECT source AS g, unnest($sqlTokens) AS tok
       |  FROM documents),
       |c204 AS (SELECT g, tok, CAST(count(*) AS BIGINT) AS c
       |  FROM t204 GROUP BY 1, 2),
       |pr204 AS (SELECT tok FROM (SELECT tok, sum(c) AS cg
       |    FROM c204 GROUP BY 1)
       |  ORDER BY cg DESC, tok LIMIT 64),
       |bk204 AS (SELECT g, CASE WHEN pr204.tok IS NOT NULL
       |      THEN c204.tok ELSE ' __rest__' END AS b,
       |    CAST(sum(c) AS BIGINT) AS c
       |  FROM c204 LEFT JOIN pr204 ON pr204.tok = c204.tok
       |  GROUP BY 1, 2),
       |al204 AS (SELECT tok AS b FROM pr204
       |  UNION ALL SELECT ' __rest__'),
       |gr204 AS (SELECT g, b
       |  FROM (SELECT DISTINCT g FROM bk204) CROSS JOIN al204),
       |f204 AS (SELECT gr204.g, gr204.b, coalesce(bk204.c, 0) AS c
       |  FROM gr204 LEFT JOIN bk204
       |    ON bk204.g = gr204.g AND bk204.b = gr204.b),
       |tt204 AS (SELECT g, CAST(sum(c) AS BIGINT) AS n
       |  FROM f204 GROUP BY 1),
       |p204 AS (SELECT f204.g, b, n,
       |    CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p
       |  FROM f204 JOIN tt204 ON tt204.g = f204.g),
       |j204 AS (SELECT a.g AS group_a, b2.g AS group_b,
       |    a.n AS na, b2.n AS nb,
       |    CAST(floor(($term) * 1e9 + 0.5) AS BIGINT) AS t9
       |  FROM p204 a JOIN p204 b2 ON a.b = b2.b AND a.g < b2.g),
       |s204 AS (SELECT group_a, group_b,
       |    CAST(max(na) AS BIGINT) AS n_tokens_a,
       |    CAST(max(nb) AS BIGINT) AS n_tokens_b,
       |    CAST(sum(t9) AS BIGINT) AS s9
       |  FROM j204 GROUP BY 1, 2)
       |SELECT group_a, group_b, n_tokens_a, n_tokens_b,
       |  floor(CAST(s9 AS DOUBLE)/1e9*1e6 + 0.5)/1e6 AS jsd6
       |FROM s204 ORDER BY group_a, group_b""".stripMargin
  }) { (s, d) =>
    graft.operators.TextAnalysis.jsdProfilePairs(
        Tables.documents(s, d), "source", "text", profileK = 64)
      .orderBy(col("group_a"), col("group_b"))
  }

  // Nonparametric per-user trend screen: Mann–Kendall over each
  // user's daily event counts — S = Σ sign pairs (exact integers,
  // deliberately quadratic in the calendar-bounded SERIES length,
  // linear in users), tie-corrected variance carried as the exact
  // integer 18·Var, continuity-corrected z, A&S normal p. Users
  // with < 10 active days are dropped.
  q("q206_mann_kendall", {
    val varD = "(CAST(var18 AS DOUBLE) / 18e0)"
    val z = "CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / " +
      s"sqrt($varD) WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / " +
      s"sqrt($varD) ELSE 0e0 END"
    val p = graft.operators.Hypothesis.normP2Sql(z)
    val p6 = s"floor(($p) * 1e6 + 0.5)/1e6"
    s"""WITH d206 AS (SELECT user_id AS k, epoch_ms(ts) // 86400000 AS t,
       |    CAST(count(*) AS BIGINT) AS v
       |  FROM events GROUP BY 1, 2),
       |n206 AS (SELECT k, CAST(count(*) AS BIGINT) AS n_obs
       |  FROM d206 GROUP BY 1 HAVING count(*) >= 10),
       |k206 AS (SELECT d206.k, t, v, n_obs
       |  FROM d206 JOIN n206 ON n206.k = d206.k),
       |s206 AS (SELECT a.k, CAST(max(a.n_obs) AS BIGINT) AS n_obs,
       |    CAST(sum(CASE WHEN b.v > a.v THEN 1
       |      WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
       |  FROM k206 a JOIN k206 b ON a.k = b.k AND a.t < b.t
       |  GROUP BY 1),
       |g206 AS (SELECT k, v, CAST(count(*) AS BIGINT) AS tg
       |  FROM k206 GROUP BY 1, 2),
       |t206 AS (SELECT k, CAST(sum(tg * (tg - 1) * (2 * tg + 5))
       |    AS BIGINT) AS tie18 FROM g206 GROUP BY 1),
       |v206 AS (SELECT s206.k, n_obs, s_stat,
       |    n_obs * (n_obs - 1) * (2 * n_obs + 5) - tie18 AS var18
       |  FROM s206 JOIN t206 ON t206.k = s206.k)
       |SELECT k AS user_id, n_obs, s_stat, var18,
       |  CASE WHEN var18 > 0 THEN floor(($z) * 1e6 + 0.5)/1e6 END AS z6,
       |  CASE WHEN var18 > 0 THEN $p6 END AS p6,
       |  CASE WHEN var18 <= 0 THEN NULL
       |       WHEN $p6 <= 0.05 AND s_stat > 0 THEN 'increasing'
       |       WHEN $p6 <= 0.05 AND s_stat < 0 THEN 'decreasing'
       |       ELSE 'none' END AS trend
       |FROM v206 ORDER BY user_id""".stripMargin
  }) { (s, d) =>
    val daily = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_millis(ts) div 86400000").as("t"))
      .groupBy(col("user_id"), col("t")).agg(count(lit(1)).as("v"))
    graft.operators.TimeSeries.mannKendall(daily, "user_id", "t", "v",
        minN = 10)
      .orderBy(col("user_id"))
  }

  // Lakehouse compaction planning: coalesce an ordered small-file
  // list (here: per-(source, doc_id%4) shards of `documents`, bytes
  // = Σ n_chars) into ~10 KB output bins — bin = floor(cumulative
  // bytes before / target) over ONE range-partitioned prefix sum of
  // the metadata-sized file-stats frame. The data is never read;
  // the plan is what a rewrite job executes.
  q("q207_compaction_plan",
    """WITH f207 AS (SELECT source || '#' || CAST(doc_id % 4 AS VARCHAR)
      |    AS f, CAST(sum(n_chars) AS BIGINT) AS bytes
      |  FROM documents GROUP BY 1),
      |c207 AS (SELECT f, bytes, CAST(coalesce(sum(bytes) OVER (
      |    ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    0) AS BIGINT) AS cb FROM f207)
      |SELECT cb // 10000 AS bin_id, CAST(count(*) AS BIGINT) AS n_files,
      |  CAST(sum(bytes) AS BIGINT) AS total_bytes,
      |  floor(CAST(sum(bytes) AS DOUBLE) / 10000e0 * 1e6 + 0.5)/1e6
      |    AS fill6
      |FROM c207 GROUP BY 1 ORDER BY bin_id""".stripMargin) { (s, d) =>
    val files = Tables.documents(s, d)
      .groupBy(concat(col("source"), lit("#"),
        pmod(col("doc_id"), lit(4L)).cast("string")).as("f"))
      .agg(sum(col("n_chars")).as("bytes"))
    graft.operators.ScaleOps.compactionPlan(files, Seq("f"), "bytes",
        targetBytes = 10000L)
      .orderBy(col("bin_id"))
  }

  // Closed-form OLS: value ~ β₀ + β₁·hour + β₂·weekday over events —
  // the normal equations from ONE exact-moment aggregate pass
  // (features are small ints, y is micro int64, Σy² decimal128),
  // Cramer-solved in one row of identical-text double math. No
  // iteration, no driver loop, nothing but a map-side-combinable
  // aggregate at any scale.
  q("q208_ols_regression", {
    val o = graft.operators.Regression.olsSql(
      "n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y", "syy")
    s"""WITH v208 AS (SELECT (epoch_ms(ts) // 3600000) % 24 AS x1,
       |    (epoch_ms(ts) // 86400000 + 4) % 7 AS x2,
       |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS ym
       |  FROM events WHERE value IS NOT NULL),
       |m208 AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
       |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
       |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
       |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
       |    CAST(sum(ym) AS BIGINT) AS sy,
       |    CAST(sum(x1 * ym) AS BIGINT) AS s1y,
       |    CAST(sum(x2 * ym) AS BIGINT) AS s2y,
       |    sum(CAST(ym AS HUGEINT) * ym) AS syy
       |  FROM v208)
       |SELECT n, ${o("beta0_6")} AS beta0_6, ${o("beta1_6")} AS beta1_6,
       |  ${o("beta2_6")} AS beta2_6, ${o("r2_6")} AS r2_6
       |FROM m208""".stripMargin
  }) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
      .select(
        pmod(expr("unix_millis(ts) div 3600000"), lit(24L)).as("x1"),
        pmod(expr("unix_millis(ts) div 86400000") + lit(4L), lit(7L))
          .as("x2"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("ym"))
    graft.operators.Regression.olsFit(ev, "ym", "x1", "x2")
  }

  // Monotone calibration: isotonic regression of mean event value
  // over the 24 hour-of-day bins via the max–min minimax identity —
  // PAV's answer without PAV's sequential merge (B² intervals, B³
  // expansion, all constants once the corpus is binned). The fitted
  // curve is non-decreasing by construction; interval means are
  // exact-integer ratios.
  q("q209_isotonic_calibration",
    """WITH v209 AS (SELECT (epoch_ms(ts) // 3600000) % 24 AS bin,
      |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS ym
      |  FROM events WHERE value IS NOT NULL),
      |b209 AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(ym) AS BIGINT) AS s FROM v209 GROUP BY 1),
      |sp209 AS (SELECT i.bin AS i, j.bin AS j
      |  FROM b209 i JOIN b209 j ON i.bin <= j.bin),
      |iv209 AS (SELECT sp209.i, sp209.j, CAST(sum(b.n) AS BIGINT) AS wn,
      |    CAST(sum(b.s) AS BIGINT) AS ws
      |  FROM sp209 JOIN b209 b ON b.bin >= sp209.i AND b.bin <= sp209.j
      |  GROUP BY 1, 2),
      |mv209 AS (SELECT i, j,
      |    CAST(ws AS DOUBLE) / 1e6 / CAST(wn AS DOUBLE) AS m
      |  FROM iv209 WHERE wn > 0),
      |in209 AS (SELECT k.bin AS k, mv209.i, min(m) AS im
      |  FROM b209 k JOIN mv209 ON mv209.i <= k.bin AND mv209.j >= k.bin
      |  GROUP BY 1, 2),
      |f209 AS (SELECT k, max(im) AS fit FROM in209 GROUP BY 1)
      |SELECT b209.bin, n,
      |  CASE WHEN n > 0 THEN floor(CAST(s AS DOUBLE) / 1e6 /
      |    CAST(n AS DOUBLE) * 1e6 + 0.5)/1e6 END AS mean6,
      |  floor(fit * 1e6 + 0.5)/1e6 AS fitted6
      |FROM b209 JOIN f209 ON f209.k = b209.bin
      |ORDER BY bin""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
      .select(
        pmod(expr("unix_millis(ts) div 3600000"), lit(24L)).as("bin"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("ym"))
    val bins = ev.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("ym")).as("s"))
    graft.operators.Regression.isotonicFit(bins, "bin", "n", "s")
      .orderBy(col("bin"))
  }

  // Multiple-testing control: screen every (event_type, weekday)
  // cell's mean value against its complement (Welch vs the rest of
  // the week, complement moments = group totals minus the cell — the
  // corpus is aggregated once), then Benjamini–Hochberg the 35-cell
  // family at FDR 0.05. Rank + suffix-min ride one window over the
  // hypothesis frame (grid-sized, never corpus-sized); the BH
  // ordering totals on (p6, event_type, dow) so rounded-p ties can't
  // float the ranks.
  q("q205_bh_fdr", {
    val w = graft.operators.Hypothesis.welchSql(
      "nc", "sc", "qc", "(nt - nc)", "(st - sc)", "(qt - qc)")
    s"""WITH v205 AS (SELECT event_type,
       |    (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
       |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS xm
       |  FROM events WHERE value IS NOT NULL),
       |c205 AS (SELECT event_type, dow,
       |    CAST(count(*) AS BIGINT) AS nc,
       |    CAST(sum(xm) AS BIGINT) AS sc,
       |    sum(CAST(xm AS HUGEINT) * xm) AS qc
       |  FROM v205 GROUP BY 1, 2),
       |t205 AS (SELECT event_type, CAST(sum(nc) AS BIGINT) AS nt,
       |    CAST(sum(sc) AS BIGINT) AS st, sum(qc) AS qt
       |  FROM c205 GROUP BY 1),
       |w205 AS (SELECT c205.event_type, dow,
       |    nc AS n_a, (nt - nc) AS n_b,
       |    ${w("mean_a6")} AS mean_a6, ${w("mean_b6")} AS mean_b6,
       |    ${w("diff6")} AS diff6, ${w("t6")} AS t6, ${w("df6")} AS df6,
       |    ${w("p6")} AS p6, ${w("significant")} AS significant
       |  FROM c205 JOIN t205 ON t205.event_type = c205.event_type),
       |m205 AS (SELECT CAST(count(*) AS BIGINT) AS m FROM w205
       |  WHERE p6 IS NOT NULL),
       |r205 AS (SELECT w205.*, m,
       |    CAST(row_number() OVER (ORDER BY p6, event_type, dow)
       |      AS INTEGER) AS rank
       |  FROM w205 CROSS JOIN m205 WHERE p6 IS NOT NULL),
       |a205 AS (SELECT *, least(min(
       |      p6 * CAST(m AS DOUBLE) / CAST(rank AS DOUBLE))
       |    OVER (ORDER BY p6 DESC, event_type DESC, dow DESC
       |      ROWS UNBOUNDED PRECEDING), 1e0) AS adjr
       |  FROM r205),
       |f205 AS (SELECT event_type, dow, n_a, n_b, mean_a6, mean_b6,
       |    diff6, t6, df6, p6, significant, rank,
       |    floor(adjr * 1e6 + 0.5)/1e6 AS adj_p6,
       |    floor(adjr * 1e6 + 0.5)/1e6 <= 0.05 AS rejected
       |  FROM a205
       |  UNION ALL
       |  SELECT event_type, dow, n_a, n_b, mean_a6, mean_b6,
       |    diff6, t6, df6, p6, significant,
       |    CAST(NULL AS INTEGER) AS rank,
       |    CAST(NULL AS DOUBLE) AS adj_p6,
       |    CAST(NULL AS BOOLEAN) AS rejected
       |  FROM w205 WHERE p6 IS NULL)
       |SELECT * FROM f205 ORDER BY event_type, dow""".stripMargin
  }) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("event_type"),
        pmod(expr("unix_millis(ts) div 86400000") + lit(4L), lit(7L))
          .as("dow"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("xm"))
    val screened = graft.operators.Hypothesis.welchScreen(
      ev, Seq("event_type"), "dow", "xm")
    graft.operators.Hypothesis.bhFdr(screened,
        Seq("event_type", "dow"), "p6")
      .orderBy(col("event_type"), col("dow"))
  }

  /** BUILDING-segment co-purchase graph, shared by q224/q225:
    * customer and part nodes with parity-disambiguated ids (2c for
    * customers, 2p+1 for parts — the keyspaces overlap numerically),
    * one undirected edge per distinct (customer, part) purchase.
    * `edG` is the canonical a<b edge list; `adG` both directions.
    */
  private val copurchaseCtes: String =
    """bpG AS (SELECT DISTINCT 2 * o_custkey AS a, 2 * l_partkey + 1 AS b
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  WHERE c_mktsegment = 'BUILDING'),
      |edG AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
      |  FROM bpG WHERE a <> b),
      |adG AS (SELECT a AS w, b AS u FROM edG
      |  UNION ALL SELECT b AS w, a AS u FROM edG)""".stripMargin

  /** Engine twin of [[copurchaseCtes]]'s bpG: the distinct
    * parity-coded (customer, part) edge frame.
    */
  /** Memoized per (session, dir) — q224 (link prediction) and q225
    * (BFS) are two readouts of the SAME mined co-purchase graph, so
    * the 3-table join + distinct runs once (the nbScored/dedupStages
    * discipline; Bench resets on the alphabetical owner q224 so the
    * mine is still timed every round and q225's number is the BFS
    * increment).
    */
  private val copurchaseEdgeCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String),
      org.apache.spark.sql.DataFrame]

  private def copurchaseEdges(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    PipelineQueries.sweepDeadEntries(copurchaseEdgeCache)
    copurchaseEdgeCache.computeIfAbsent((s, d), _ =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING"),
          col("c_custkey") === col("o_custkey"))
        .select((lit(2L) * col("o_custkey")).as("id_a"),
          (lit(2L) * col("l_partkey") + lit(1L)).as("id_b"))
        .distinct()
        .localCheckpoint(true))
  }

  /** Bench hook: forget the memoized co-purchase edge frame. */
  def resetCopurchase(s: org.apache.spark.sql.SparkSession,
      d: String): Unit = {
    copurchaseEdgeCache.remove((s, d))
    ()
  }

  /** Bench warm-up hook — see [[PipelineQueries.warmMemos]]. */
  def warmMemos(s: org.apache.spark.sql.SparkSession, d: String,
      include: String => Boolean): Unit = {
    if (Seq("q224_link_prediction", "q225_bfs_hops")
        .exists(include)) { copurchaseEdges(s, d); () }
  }

  // Scorer evaluation, imbalanced edition: the precision–recall curve
  // + step-function average precision of the q85 NB quality scorer
  // against the q58 rule labels — ROC (q185) asks "does it order?",
  // PR asks "what does a cut COST?" where the negative flood makes
  // FPR blind (Davis & Goadrich 2006). One distinct-score aggregate,
  // one packed-counter prefix sum, exact int64 micro-sum AP; the
  // inline (never named — the q138 lesson) oracle windows replay the
  // cumulative counters.
  q("q221_pr_curve", {
    s"""WITH $nbQualityCtes,
       |lo221 AS (SELECT sc85.doc_id,
       |    CAST(floor((raw + ln(n1 * 1.0 / n0)) * 1e6 + 0.5) AS BIGINT) AS m
       |  FROM sc85, pri85),
       |la221 AS (SELECT doc_id, $nbRuleSql AS y FROM f85),
       |g221 AS (SELECT m, CAST(count(*) AS BIGINT) AS n_s,
       |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p_s
       |  FROM lo221 JOIN la221 USING (doc_id) GROUP BY m),
       |r221 AS (SELECT m, n_s, p_s,
       |    CAST(coalesce(sum(n_s) OVER (ORDER BY m
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS below_n,
       |    CAST(coalesce(sum(p_s) OVER (ORDER BY m
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS below_p
       |  FROM g221),
       |t221 AS (SELECT CAST(sum(p_s) AS BIGINT) AS np,
       |    CAST(sum(n_s) AS BIGINT) AS nt FROM g221),
       |c221 AS (SELECT m, p_s, np, np - below_p AS tp, nt - below_n AS pp
       |  FROM r221, t221),
       |a221 AS (SELECT CAST(sum(CAST(floor(
       |      CAST(p_s AS DOUBLE) * CAST(tp AS DOUBLE) * 1e6
       |      / (CAST(pp AS DOUBLE) * CAST(np AS DOUBLE)) + 0.5)
       |      AS BIGINT)) AS BIGINT) AS apm,
       |    max(np) AS np2 FROM c221)
       |SELECT m AS score, tp, pp - tp AS fp,
       |  floor((CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE)) * 1e6 + 0.5)/1e6
       |    AS prec6,
       |  CASE WHEN np > 0 THEN
       |    floor((CAST(tp AS DOUBLE) / CAST(np AS DOUBLE)) * 1e6 + 0.5)/1e6
       |  END AS rec6,
       |  CASE WHEN np2 > 0 THEN CAST(apm AS DOUBLE) / 1e6 END AS ap6
       |FROM c221, a221 ORDER BY score""".stripMargin
  }) { (s, d) =>
    val sc = PipelineQueries.nbScored(s, d)
      .select(col("doc_id"),
        floor(col("log_odds") * lit(1e6) + lit(0.5)).cast("long").as("m"),
        col("keep"))
    graft.operators.RankStats.prCurve(sc, "m", "keep")
      .orderBy(col("score"))
  }

  // GLM classification: does purchase probability move with
  // hour-of-day / weekday? Logistic regression by 3 Newton-IRLS
  // rounds from beta=0 — q208's OLS asks the linear-mean question,
  // this asks the log-odds one. Per-round micro-snapped integer
  // moments (order-free), one Cramer solve per round with the betas
  // re-snapped to the 1e-6 grid, oracle = the same rounds unrolled
  // as CTEs (Regression.irlsSql — op order shared token-for-token).
  q("q222_logistic_irls", {
    val ctes = graft.operators.Regression.irlsSql("v222", 3)
    s"""WITH v222 AS (SELECT
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
       |    (epoch_ms(ts) // 3600000) % 24 AS x1,
       |    (epoch_ms(ts) // 86400000 + 4) % 7 AS x2
       |  FROM events),
       |$ctes
       |SELECT n, n_pos, b0 AS beta0_6, b1 AS beta1_6, b2 AS beta2_6,
       |  CASE WHEN n > 0 THEN
       |    floor((CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE))
       |      * 1e6 + 0.5)/1e6
       |  END AS acc6
       |FROM irf, ir3""".stripMargin
  }) { (s, d) =>
    val ev = Tables.events(s, d).select(
      (col("event_type") === "purchase").as("y"),
      pmod(expr("unix_millis(ts) div 3600000"), lit(24L)).as("x1"),
      pmod(expr("unix_millis(ts) div 86400000") + lit(4L), lit(7L))
        .as("x2"))
    graft.operators.Regression.logisticFit(ev, "y", "x1", "x2", steps = 3)
  }

  // Annotator agreement: Cohen's kappa between the q58 heuristic rule
  // and the q85 NB scorer's cut over the same documents — the
  // chance-corrected number behind "the model agrees with the rule
  // 9x% of the time" (Cohen 1960). Confusion cells, marginals, and
  // the chance numerator are exact int64; one corpus aggregate, then
  // label-pair-sized frames only.
  q("q223_cohens_kappa", {
    s"""WITH $nbQualityCtes,
       |ra223 AS (SELECT doc_id,
       |    CASE WHEN $nbRuleSql THEN 1 ELSE 0 END AS a FROM f85),
       |rb223 AS (SELECT sc85.doc_id,
       |    CASE WHEN floor((raw + ln(n1 * 1.0 / n0)) * 1e6 + 0.5)/1e6 > 0
       |      THEN 1 ELSE 0 END AS b
       |  FROM sc85, pri85),
       |c223 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
       |  FROM ra223 JOIN rb223 USING (doc_id) GROUP BY 1, 2),
       |t223 AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n,
       |    CAST(coalesce(sum(CASE WHEN a = b THEN c ELSE 0 END), 0)
       |      AS BIGINT) AS agree
       |  FROM c223),
       |pa223 AS (SELECT a AS k, CAST(sum(c) AS BIGINT) AS na
       |  FROM c223 GROUP BY 1),
       |pb223 AS (SELECT b AS k, CAST(sum(c) AS BIGINT) AS nb
       |  FROM c223 GROUP BY 1),
       |pe223 AS (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT)
       |    AS pe_num
       |  FROM pa223 JOIN pb223 USING (k))
       |SELECT n, agree, pe_num,
       |  CASE WHEN n > 0 THEN floor((CAST(agree AS DOUBLE)
       |    / CAST(n AS DOUBLE)) * 1e6 + 0.5)/1e6 END AS po6,
       |  CASE WHEN n > 0 THEN floor((CAST(pe_num AS DOUBLE)
       |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) * 1e6 + 0.5)/1e6
       |  END AS pe6,
       |  CASE WHEN n > 0 AND (1e0 - CAST(pe_num AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) <> 0e0 THEN
       |    floor(((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
       |      - CAST(pe_num AS DOUBLE)
       |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
       |      / (1e0 - CAST(pe_num AS DOUBLE)
       |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
       |      * 1e6 + 0.5)/1e6
       |  END AS kappa6
       |FROM t223, pe223""".stripMargin
  }) { (s, d) =>
    val sc = PipelineQueries.nbScored(s, d).select(
      when(col("keep"), 1L).otherwise(0L).as("a"),
      when(col("log_odds") > 0, 1L).otherwise(0L).as("b"))
    graft.operators.WeakLabels.cohensKappa(sc, "a", "b")
  }

  // Link prediction on the BUILDING-segment co-purchase graph
  // (customer and part nodes, parity-disambiguated ids 2c / 2p+1):
  // non-adjacent node pairs at distance 2 scored by common-neighbor
  // count and the resource-allocation index — part–part wedges ride
  // shared buyers (the collaborative-filtering readout), customer–
  // customer wedges shared parts. The mined near-dup graph was
  // deliberately NOT used here: its clusters are cliques, so it has
  // no open wedges and the query would be vacuously empty. Wedge
  // enumeration keyed on the intermediary with a deg<=64 hub cap;
  // per-neighbor 1/deg terms micro-snapped, summed in int64.
  q("q224_link_prediction",
    s"""WITH $copurchaseCtes,
       |dg224 AS (SELECT w, CAST(count(*) AS BIGINT) AS dw
       |  FROM adG GROUP BY 1),
       |wf224 AS (SELECT adG.w, adG.u, dw
       |  FROM adG JOIN dg224 USING (w) WHERE dw <= 64),
       |wd224 AS (SELECT x.u AS ua, y.u AS ub, x.dw
       |  FROM wf224 x JOIN wf224 y ON x.w = y.w AND x.u < y.u),
       |ca224 AS (SELECT ua, ub, CAST(count(*) AS BIGINT) AS cn,
       |    CAST(sum(CAST(floor(1e6 / CAST(dw AS DOUBLE) + 0.5)
       |      AS BIGINT)) AS BIGINT) AS ram
       |  FROM wd224 GROUP BY 1, 2)
       |SELECT ua AS id_a, ub AS id_b, cn, CAST(ram AS DOUBLE)/1e6 AS ra6
       |FROM ca224 LEFT JOIN edG ON edG.a = ua AND edG.b = ub
       |WHERE edG.a IS NULL AND cn >= 2
       |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    graft.operators.GraphOps.linkPredict(copurchaseEdges(s, d),
        "id_a", "id_b", maxDeg = 64,
        // the memo is a distinct (2c, 2p+1) edge list: no self-loops
        // (even vs odd ids), no duplicates — skip the defensive
        // normalize+distinct exchange
        pairsNormalized = true)
      .filter(col("cn") >= 2) // singleton-wedge pairs are noise-level
      .orderBy(col("id_a"), col("id_b"))
  }

  // Multi-source BFS: hop distance from the flagged-customer seed
  // set (custkey % 13 = 0, BUILDING segment) over the co-purchase
  // graph — "how much of the corpus is within k hops of the flagged
  // set", the reachability probe behind contamination-spread and
  // recall-region audits. Pure integer set algebra, one frontier
  // join per hop; the oracle unrolls 4 MATERIALIZED rounds.
  q("q225_bfs_hops",
    s"""WITH $copurchaseCtes,
       |s225 AS (SELECT DISTINCT 2 * c_custkey AS id FROM customer
       |  WHERE c_mktsegment = 'BUILDING' AND c_custkey % 13 = 0),
       |d0 AS MATERIALIZED (SELECT id, 0 AS hops FROM s225),
       |n1 AS (SELECT DISTINCT u AS id FROM adG
       |  JOIN d0 ON w = d0.id AND d0.hops = 0),
       |d1 AS MATERIALIZED (SELECT * FROM d0 UNION ALL
       |  SELECT n1.id, 1 FROM n1 LEFT JOIN d0 ON d0.id = n1.id
       |  WHERE d0.id IS NULL),
       |n2 AS (SELECT DISTINCT u AS id FROM adG
       |  JOIN d1 ON w = d1.id AND d1.hops = 1),
       |d2 AS MATERIALIZED (SELECT * FROM d1 UNION ALL
       |  SELECT n2.id, 2 FROM n2 LEFT JOIN d1 ON d1.id = n2.id
       |  WHERE d1.id IS NULL),
       |n3 AS (SELECT DISTINCT u AS id FROM adG
       |  JOIN d2 ON w = d2.id AND d2.hops = 2),
       |d3 AS MATERIALIZED (SELECT * FROM d2 UNION ALL
       |  SELECT n3.id, 3 FROM n3 LEFT JOIN d2 ON d2.id = n3.id
       |  WHERE d2.id IS NULL),
       |n4 AS (SELECT DISTINCT u AS id FROM adG
       |  JOIN d3 ON w = d3.id AND d3.hops = 3),
       |d4 AS MATERIALIZED (SELECT * FROM d3 UNION ALL
       |  SELECT n4.id, 4 FROM n4 LEFT JOIN d3 ON d3.id = n4.id
       |  WHERE d3.id IS NULL)
       |SELECT id, CAST(hops AS BIGINT) AS hops FROM d4
       |ORDER BY id""".stripMargin) { (s, d) =>
    val seeds = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING" &&
        col("c_custkey") % 13 === 0)
      .select((lit(2L) * col("c_custkey")).as("seed"))
    graft.operators.GraphOps.bfsHops(copurchaseEdges(s, d),
        "id_a", "id_b", seeds, "seed", maxHops = 4)
      .orderBy(col("id"))
  }

  // Gaps-and-islands coverage: each event occupies [ts, ts+30min);
  // per user, overlapping/touching intervals coalesce into maximal
  // islands — the occupancy readout q138's point-gap sessionize
  // can't give (durations, set semantics). Integer-ms math, one key
  // exchange carrying both windows and the rollup.
  q("q226_interval_merge",
    """WITH v226 AS (SELECT user_id, epoch_ms(ts) AS s,
      |    epoch_ms(ts) + 1800000 AS e FROM events),
      |r226 AS (SELECT user_id, s, e,
      |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
      |  FROM v226),
      |f226 AS (SELECT user_id, s, e,
      |    CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END AS nf
      |  FROM r226),
      |i226 AS (SELECT user_id, s, e,
      |    sum(nf) OVER (PARTITION BY user_id ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      |  FROM f226)
      |SELECT user_id, CAST(min(s) AS BIGINT) AS start_ms,
      |  CAST(max(e) AS BIGINT) AS end_ms,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM i226 GROUP BY user_id, isl
      |ORDER BY user_id, start_ms""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(col("user_id"),
      expr("unix_millis(ts)").as("s"),
      (expr("unix_millis(ts)") + lit(1800000L)).as("e"))
    graft.operators.Behavior.mergeIntervals(ev, "user_id", "s", "e")
      .orderBy(col("user_id"), col("start_ms"))
  }

  // Pareto/ABC inventory classes over part revenue: inclusive
  // cumulative share under the (revenue DESC, partkey) total order,
  // A/B/C at 80/95 — integer cross-products decide every class, the
  // prefix sum is range-partitioned, and only the reported share is
  // a (6dp) double. The long-tail-cut readout q186's Gini summarizes
  // but can't itemize.
  q("q227_pareto_abc",
    """WITH r227 AS (SELECT l_partkey,
      |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e6
      |      + 0.5) AS BIGINT)) AS BIGINT) AS rm
      |  FROM lineitem GROUP BY 1),
      |c227 AS (SELECT l_partkey, rm,
      |    CAST(sum(rm) OVER (ORDER BY rm DESC, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM r227),
      |t227 AS (SELECT CAST(sum(rm) AS BIGINT) AS tot FROM r227)
      |SELECT l_partkey AS p_partkey, CAST(rm AS DOUBLE)/1e6 AS value6,
      |  floor((CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e6 + 0.5)/1e6
      |    AS cum_share6,
      |  CASE WHEN CAST(cum AS HUGEINT) * 100 <= 80 * CAST(tot AS HUGEINT)
      |         THEN 'A'
      |       WHEN CAST(cum AS HUGEINT) * 100 <= 95 * CAST(tot AS HUGEINT)
      |         THEN 'B'
      |       ELSE 'C' END AS abc_class
      |FROM c227, t227 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .select(col("l_partkey"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          lit(1e6) + lit(0.5)).cast("long").as("rm"))
      .groupBy(col("l_partkey")).agg(sum(col("rm")).as("rm"))
    graft.operators.RankStats.paretoAbc(rev, "l_partkey", "rm")
      .withColumnRenamed("l_partkey", "p_partkey")
      .orderBy(col("p_partkey"))
  }

  // Per-segment drift: for every event_type, the OLS slope of value
  // over day-in-corpus — "which segments are trending, how fast"
  // where q208 fits one global plane. One combinable aggregate
  // carries all six moments per key; x is offset to the corpus's
  // first day (exact integer min, broadcast) so the cross products
  // stay small.
  q("q228_grouped_ols", {
    val o = graft.operators.Regression.olsSimpleSql(
      "n", "sx", "sxx", "sy", "sxy", "syy")
    s"""WITH b228 AS (SELECT CAST(min(epoch_ms(ts) // 86400000)
       |    AS BIGINT) AS d0 FROM events WHERE value IS NOT NULL),
       |v228 AS (SELECT event_type,
       |    (epoch_ms(ts) // 86400000) - d0 AS x,
       |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS ym
       |  FROM events, b228 WHERE value IS NOT NULL),
       |m228 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(ym) AS BIGINT) AS sy,
       |    CAST(sum(x * ym) AS BIGINT) AS sxy,
       |    sum(CAST(ym AS HUGEINT) * ym) AS syy
       |  FROM v228 GROUP BY 1)
       |SELECT event_type, n, ${o("slope6")} AS slope6,
       |  ${o("intercept6")} AS intercept6, ${o("r2_6")} AS r2_6
       |FROM m228 ORDER BY event_type""".stripMargin
  }) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("ym"))
    val d0 = ev.agg(min(col("day")).as("d0"))
    val v = ev.crossJoin(broadcast(d0))
      .select(col("event_type"), (col("day") - col("d0")).as("x"),
        col("ym"))
    graft.operators.Regression.groupedOls(v, "event_type", "x", "ym")
      .orderBy(col("event_type"))
  }

  // Multimodal q41 family, MP3 member: real MPEG-1 Layer III frame
  // walk (HeaderCodec.mp3) over deterministic payloads sweeping the
  // full bitrate table, all three samplerates, per-frame padding
  // bits, ID3v2 prefixes and ID3v1 trailers — duration and frame
  // count come out of the walk, the oracle predicts both from pure
  // doc_id arithmetic.
  q("q229_mp3_duration",
    """WITH p229 AS (SELECT doc_id, 1 + doc_id % 5 AS frames,
      |    ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[
      |      CAST(1 + doc_id % 14 AS INT)] AS kbps,
      |    CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
      |      ELSE 32000 END AS sr
      |  FROM documents)
      |SELECT doc_id AS asset_id,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN 10 + doc_id % 17 ELSE 0 END
      |    + frames * ((144000 * kbps) // sr)
      |    + (frames + 1 - doc_id % 2) // 2
      |    + CASE WHEN doc_id % 4 = 0 THEN 128 ELSE 0 END AS INT)
      |    AS n_bytes,
      |  CAST((frames * 1152000) // sr AS BIGINT) AS duration_ms,
      |  CAST(frames AS INT) AS n_frames,
      |  true AS header_parsed
      |FROM p229 ORDER BY asset_id""".stripMargin) { (s, d) =>
    Multimodal.extractFeatures(
        Multimodal.syntheticMp3Assets(Tables.documents(s, d)))
      .select(col("asset_id"),
        col("features.n_bytes").as("n_bytes"),
        col("features.duration_ms").as("duration_ms"),
        col("features.n_frames").as("n_frames"),
        col("features.header_parsed").as("header_parsed"))
      .orderBy(col("asset_id"))
  }

  // Forecasting: Holt's linear-trend smoothing over the per-type
  // daily event counts, emitting each day's one-step-ahead forecast
  // BEFORE folding the day in — the self-backtesting forecaster
  // q165's trendless EWMA can't be. Dyadic gains (0.5/0.25) make
  // every product exact; the fold is the q156 row-local per-key
  // aggregate and the oracle replays the identical chain with a
  // recursive CTE, no tolerance.
  q("q230_holt_forecast",
    """WITH RECURSIVE d230 AS (SELECT event_type,
      |    epoch_ms(ts) // 86400000 AS t, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |o230 AS (SELECT event_type, t, CAST(n AS DOUBLE) AS x,
      |    row_number() OVER (PARTITION BY event_type ORDER BY t) AS rn
      |  FROM d230),
      |c230(event_type, rn, t, x, l, b, fc) AS (
      |  SELECT event_type, rn, t, x, x, 0e0, CAST(NULL AS DOUBLE)
      |  FROM o230 WHERE rn = 1
      |  UNION ALL
      |  SELECT o230.event_type, o230.rn, o230.t, o230.x,
      |    0.5 * o230.x + (1e0 - 0.5) * (c230.l + c230.b),
      |    0.25 * ((0.5 * o230.x + (1e0 - 0.5) * (c230.l + c230.b))
      |      - c230.l) + (1e0 - 0.25) * c230.b,
      |    c230.l + c230.b
      |  FROM c230 JOIN o230 ON o230.event_type = c230.event_type
      |    AND o230.rn = c230.rn + 1)
      |SELECT event_type, t, x, floor(l * 1e6 + 0.5)/1e6 AS level6,
      |  floor(b * 1e6 + 0.5)/1e6 AS trend6,
      |  CASE WHEN fc IS NOT NULL THEN floor(fc * 1e6 + 0.5)/1e6 END
      |    AS fc6
      |FROM c230 ORDER BY event_type, t""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("t"))
      .agg(count(lit(1)).cast("double").as("x"))
    graft.operators.TimeSeries.holtSmooth(daily, "event_type", "t", "x",
        alpha = 0.5, beta = 0.25)
      .orderBy(col("event_type"), col("t"))
  }

  // Retrieval eval, first-hit edition: MRR@10 of five single-term
  // BM25 queries against the binary doc_id%4=3 relevance — "how fast
  // does the ranker surface ONE good answer", next to q135's graded
  // nDCG. One corpus pass scores all five queries (shared dl/df
  // aggregates, per-query WindowGroupLimit top-k); reciprocals are
  // micro-snapped so the mean is an exact int64 sum.
  q("q231_mrr_eval",
    s"""WITH toks AS (SELECT doc_id, unnest($sqlTokens) AS w FROM documents),
       |dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       |stats AS (SELECT (SELECT count(*) FROM documents) AS n,
       |    (SELECT sum(dl) * 1.0 / count(*) FROM dls) AS avgdl),
       |tf231 AS (SELECT doc_id, w, count(*) AS tf FROM toks
       |  WHERE w IN ('spark', 'join', 'stream', 'data', 'query')
       |  GROUP BY doc_id, w),
       |df231 AS (SELECT w, count(*) AS df FROM tf231 GROUP BY w),
       |sc231 AS (SELECT w AS query, tf231.doc_id,
       |    floor((ln((n - df + 0.5) / (df + 0.5) + 1.0) *
       |      ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))))
       |      * 1e6 + 0.5)/1e6 AS score
       |  FROM tf231 JOIN df231 USING (w) JOIN dls USING (doc_id)
       |  CROSS JOIN stats),
       |rk231 AS (SELECT query, doc_id, score, row_number() OVER (
       |    PARTITION BY query ORDER BY score DESC, doc_id) AS rank
       |  FROM sc231),
       |fr231 AS (SELECT query, CAST(min(rank) AS BIGINT) AS first_rank
       |  FROM rk231 WHERE rank <= 10 AND doc_id % 4 = 3 GROUP BY 1),
       |qs231 AS (SELECT DISTINCT query FROM rk231),
       |pq231 AS (SELECT qs231.query, first_rank,
       |    CASE WHEN first_rank IS NOT NULL THEN
       |      CAST(floor(1e6 / CAST(first_rank AS DOUBLE) + 0.5) AS BIGINT)
       |    ELSE 0 END AS rrm
       |  FROM qs231 LEFT JOIN fr231 ON fr231.query = qs231.query),
       |t231 AS (SELECT CAST(count(*) AS BIGINT) AS nq,
       |    CAST(coalesce(sum(rrm), 0) AS BIGINT) AS srrm FROM pq231)
       |SELECT query, first_rank, CAST(rrm AS DOUBLE)/1e6 AS rr6,
       |  CASE WHEN nq > 0 THEN floor(CAST(srrm AS DOUBLE)
       |    / CAST(nq AS DOUBLE) + 0.5)/1e6 END AS mrr6
       |FROM pq231, t231 ORDER BY query""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val ranked = TextAnalysis.bm25PerTerm(docs, "doc_id", "text",
      Seq("spark", "join", "stream", "data", "query"), topK = 10)
    val rels = docs.select(col("doc_id"),
      (col("doc_id") % 4 === 3).as("rel"))
    graft.operators.Retrieval.mrrAtK(ranked, rels,
        "query", "doc_id", "rank", "rel", k = 10)
      .orderBy(col("query"))
  }

  // Burstiness monitor: index of dispersion (variance/mean) of the
  // per-type daily arrival counts — Poisson arrivals read ~1,
  // retry storms >> 1. One combinable aggregate per key over the
  // daily grid; the flag compares the rounded ratio.
  q("q232_dispersion_index",
    """WITH d232 AS (SELECT event_type, epoch_ms(ts) // 86400000 AS t,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |m232 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM d232 GROUP BY 1)
      |SELECT event_type, n_days,
      |  floor((CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))
      |    * 1e6 + 0.5)/1e6 AS mean6,
      |  floor((CAST(sxx AS DOUBLE) / CAST(n_days AS DOUBLE)
      |    - (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))
      |      * (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)))
      |    * 1e6 + 0.5)/1e6 AS var6,
      |  CASE WHEN sx > 0 THEN
      |    floor(((CAST(sxx AS DOUBLE) / CAST(n_days AS DOUBLE)
      |      - (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))
      |        * (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)))
      |      / (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)))
      |      * 1e6 + 0.5)/1e6
      |  END AS dispersion6,
      |  CASE WHEN sx > 0 THEN
      |    floor(((CAST(sxx AS DOUBLE) / CAST(n_days AS DOUBLE)
      |      - (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))
      |        * (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)))
      |      / (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)))
      |      * 1e6 + 0.5)/1e6 > 1.5
      |  END AS overdispersed
      |FROM m232 ORDER BY event_type""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("t"))
      .agg(count(lit(1)).as("x"))
    graft.operators.TimeSeries.dispersionIndex(daily, "event_type", "x")
      .orderBy(col("event_type"))
  }

  // Cross-validation splitter: stratified 5-fold assignment — within
  // every source stratum, docs rank under the md5-uniform (u, id)
  // order and fold = rank mod 5, so every (source, fold) cell is
  // exactly balanced (±1). One shared range-partitioned prefix pass;
  // per-stratum ranks = global prefix minus the stratum offset.
  q("q233_stratified_kfold",
    """WITH u233 AS (SELECT doc_id, source,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) % 1000000 AS u
      |  FROM documents WHERE doc_id IS NOT NULL),
      |r233 AS (SELECT doc_id, source, u,
      |    row_number() OVER (PARTITION BY source ORDER BY u, doc_id)
      |      - 1 AS rk
      |  FROM u233)
      |SELECT doc_id, source, u, CAST(rk % 5 AS BIGINT) AS fold
      |FROM r233 ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Curation.stratifiedKFold(
        Tables.documents(s, d), "doc_id", "source", k = 5)
      .orderBy(col("doc_id"))
  }

  // Duplication-leakage readout: Newman modularity of the SOURCE
  // partition over the mined near-dup graph — Q near its maximum
  // means duplicates stay inside sources; Q ~ 0 means cross-source
  // contamination. Exact integer edge/degree aggregates; per-source
  // terms micro-snapped then int64-summed.
  q("q234_modularity",
    s"""WITH $jaccardPairCtes,
       |ed234 AS MATERIALIZED (SELECT DISTINCT least(id_a, id_b) AS a,
       |    greatest(id_a, id_b) AS b
       |  FROM pr WHERE id_a <> id_b),
       |t234 AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ed234),
       |wl234 AS (SELECT la.source AS ca, lb.source AS cb
       |  FROM ed234 JOIN documents la ON la.doc_id = a
       |  JOIN documents lb ON lb.doc_id = b),
       |in234 AS (SELECT ca AS community,
       |    CAST(count(*) AS BIGINT) AS in_edges
       |  FROM wl234 WHERE ca = cb GROUP BY 1),
       |dg234 AS (SELECT d.source AS community,
       |    CAST(count(*) AS BIGINT) AS deg_sum
       |  FROM (SELECT a AS id FROM ed234
       |        UNION ALL SELECT b AS id FROM ed234) e
       |  JOIN documents d ON d.doc_id = e.id GROUP BY 1),
       |tm234 AS (SELECT community,
       |    CAST(coalesce(in_edges, 0) AS BIGINT) AS in_edges, deg_sum,
       |    CASE WHEN m > 0 THEN CAST(floor(
       |      (CAST(coalesce(in_edges, 0) AS DOUBLE) / CAST(m AS DOUBLE)
       |       - (CAST(deg_sum AS DOUBLE) / (2e0 * CAST(m AS DOUBLE)))
       |         * (CAST(deg_sum AS DOUBLE) / (2e0 * CAST(m AS DOUBLE))))
       |      * 1e6 + 0.5) AS BIGINT) ELSE 0 END AS tm
       |  FROM dg234 LEFT JOIN in234 USING (community), t234),
       |qq234 AS (SELECT CAST(coalesce(sum(tm), 0) AS BIGINT) AS qm
       |  FROM tm234)
       |SELECT community, in_edges, deg_sum,
       |  CAST(tm AS DOUBLE)/1e6 AS term6,
       |  CAST(qm AS DOUBLE)/1e6 AS modularity6
       |FROM tm234, qq234 ORDER BY community""".stripMargin) { (s, d) =>
    graft.operators.GraphOps.modularity(dedupStage(s, d).pairs,
        "id_a", "id_b",
        Tables.documents(s, d), "doc_id", "source")
      .orderBy(col("community"))
  }

  // Data-chosen head/tail cut: the knee of q227's descending revenue
  // curve — the rank maximizing height above the (0,0)->(n,total)
  // chord, picked by an exact decimal cross-product (no float ever
  // decides), ties to the smallest rank.
  q("q235_knee_detection",
    """WITH r235 AS (SELECT l_partkey,
      |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e6
      |      + 0.5) AS BIGINT)) AS BIGINT) AS rm
      |  FROM lineitem GROUP BY 1),
      |c235 AS (SELECT l_partkey, rm,
      |    CAST(sum(rm) OVER (ORDER BY rm DESC, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(row_number() OVER (ORDER BY rm DESC, l_partkey)
      |      AS BIGINT) AS i
      |  FROM r235),
      |t235 AS (SELECT CAST(sum(rm) AS BIGINT) AS tot,
      |    CAST(count(*) AS BIGINT) AS n FROM r235),
      |s235 AS (SELECT l_partkey, i, cum, tot, n,
      |    CAST(cum AS HUGEINT) * n - CAST(i AS HUGEINT) * tot AS score
      |  FROM c235, t235 WHERE tot > 0)
      |SELECT i AS knee_rank, l_partkey AS knee_id,
      |  floor((CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e6 + 0.5)
      |    /1e6 AS cum_share6,
      |  floor((CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
      |    - CAST(i AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6 + 0.5)/1e6
      |    AS dist6
      |FROM s235 ORDER BY score DESC, i ASC LIMIT 1""".stripMargin) {
    (s, d) =>
    val rev = Tables.lineitem(s, d)
      .select(col("l_partkey"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          lit(1e6) + lit(0.5)).cast("long").as("rm"))
      .groupBy(col("l_partkey")).agg(sum(col("rm")).as("rm"))
    graft.operators.RankStats.kneePoint(rev, "l_partkey", "rm")
  }

  // Dedup-recall audit with NO ground truth: capture–recapture over
  // the two independent near-dup detectors — MinHash-LSH (band
  // collisions) and SimHash (hamming chunks) miss pairs for
  // unrelated reasons, so the Lincoln–Petersen estimate n_a·n_b/m
  // reads the true duplicate population and each detector's implied
  // recall. Composes the q34 and q35 oracle chains verbatim.
  q("q236_capture_recapture",
    s"""WITH $minhashPairCtes,
       |$simhashPairCtes,
       |ma236 AS (SELECT DISTINCT id_a, id_b FROM sc
       |  WHERE est_jaccard >= 0.5),
       |mb236 AS (SELECT DISTINCT id_a, id_b FROM p35),
       |ca236 AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM ma236),
       |cb236 AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM mb236),
       |cm236 AS (SELECT CAST(count(*) AS BIGINT) AS n_both
       |  FROM ma236 JOIN mb236 USING (id_a, id_b))
       |SELECT n_a, n_b, n_both,
       |  CASE WHEN n_both > 0 THEN
       |    floor((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
       |      / CAST(n_both AS DOUBLE)) * 1e6 + 0.5)/1e6
       |  END AS est_total6,
       |  CASE WHEN n_both > 0 AND n_b > 0 THEN
       |    floor((CAST(n_both AS DOUBLE) / CAST(n_b AS DOUBLE))
       |      * 1e6 + 0.5)/1e6
       |  END AS recall_a6,
       |  CASE WHEN n_both > 0 AND n_a > 0 THEN
       |    floor((CAST(n_both AS DOUBLE) / CAST(n_a AS DOUBLE))
       |      * 1e6 + 0.5)/1e6
       |  END AS recall_b6
       |FROM ca236, cb236, cm236""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val mh = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 32, bands = 8, estThreshold = 0.5,
      portable = true)
    val sh = Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 3, numChunks = 4, portable = true)
    Dedup.captureRecapture(mh, sh, "id_a", "id_b")
  }

  // Arrival-uniformity screen: χ² goodness-of-fit of each type's
  // weekday distribution against uniform, p-value via the
  // Wilson–Hilferty cube-root normal (dof=6 — beyond q213's 1-dof
  // SRM). Zero-filled grid, decimal square sums; cube root spelled
  // pow(x, 1/3) — probed bit-identical across engines where cbrt()
  // is not.
  q("q237_chisq_gof", {
    val pz = graft.operators.Hypothesis.normP2Sql("z")
    s"""WITH v237 AS (SELECT event_type,
       |    (epoch_ms(ts) // 86400000 + 4) % 7 AS c FROM events),
       |o237 AS (SELECT event_type, c, CAST(count(*) AS BIGINT) AS o
       |  FROM v237 GROUP BY 1, 2),
       |k237 AS (SELECT DISTINCT event_type FROM o237),
       |g237 AS (SELECT event_type, gc AS c FROM k237
       |  CROSS JOIN (SELECT unnest(range(0, 7)) AS gc)),
       |f237 AS (SELECT g237.event_type, g237.c, coalesce(o, 0) AS o
       |  FROM g237 LEFT JOIN o237 ON o237.event_type = g237.event_type
       |    AND o237.c = g237.c),
       |t237 AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS n
       |  FROM f237 GROUP BY 1),
       |d237 AS (SELECT f237.event_type, n, 7 * o - n AS dv
       |  FROM f237 JOIN t237 USING (event_type)),
       |m237 AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       |    sum(CAST(dv AS HUGEINT) * dv) AS ss
       |  FROM d237 GROUP BY 1),
       |c237 AS (SELECT event_type, n,
       |    CAST(ss AS DOUBLE) / (7e0 * CAST(n AS DOUBLE)) AS chisq
       |  FROM m237),
       |z237 AS (SELECT event_type, n, chisq,
       |    (pow(chisq / 6e0, 1e0 / 3e0) - (1e0 - 2e0 / 54e0))
       |      / sqrt(2e0 / 54e0) AS z
       |  FROM c237),
       |p237 AS (SELECT event_type, n, chisq, z,
       |    CASE WHEN z >= 0 THEN $pz / 2e0
       |         ELSE 1e0 - $pz / 2e0 END AS p
       |  FROM z237)
       |SELECT event_type, n, floor(chisq * 1e6 + 0.5)/1e6 AS chisq6,
       |  floor(z * 1e6 + 0.5)/1e6 AS z6,
       |  floor(p * 1e6 + 0.5)/1e6 AS p6,
       |  floor(p * 1e6 + 0.5)/1e6 < 0.05 AS significant
       |FROM p237 ORDER BY event_type""".stripMargin
  }) { (s, d) =>
    val ev = Tables.events(s, d).select(col("event_type"),
      pmod(expr("unix_millis(ts) div 86400000") + lit(4L), lit(7L))
        .as("c"))
    graft.operators.Hypothesis.chisqUniformGof(ev, "event_type", "c",
        nCells = 7)
      .orderBy(col("event_type"))
  }

  // Mass-weighted quantiles: per source, the doc length holding the
  // 25/50/75th percentile of TOKEN mass — where the tokens live, not
  // where the docs do (a handful of huge docs can carry most of the
  // mass). Pure integers: one shared prefix pass, cross-product
  // threshold compares, the answer is a raw input value.
  q("q238_weighted_quantiles",
    s"""WITH b238 AS (SELECT source, n_chars AS v, doc_id,
       |    CAST(len($sqlTokens) AS BIGINT) AS w FROM documents),
       |c238 AS (SELECT source, v, doc_id, w,
       |    CAST(sum(w) OVER (PARTITION BY source ORDER BY v, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum
       |  FROM b238),
       |t238 AS (SELECT source, CAST(sum(w) AS BIGINT) AS w_total
       |  FROM b238 GROUP BY 1)
       |SELECT c238.source, p AS pct,
       |  CAST(min(CASE WHEN CAST(cum AS HUGEINT) * 100
       |      >= p * CAST(w_total AS HUGEINT) THEN v END)
       |    AS BIGINT) AS value,
       |  w_total
       |FROM c238 JOIN t238 USING (source)
       |CROSS JOIN (SELECT unnest([25, 50, 75]) AS p)
       |GROUP BY c238.source, p, w_total
       |ORDER BY source, pct""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val w = docs.select(col("source"), col("n_chars").as("v"),
      col("doc_id"),
      size(graft.functions.TextFns.tokens(col("text"))).as("w"))
    graft.operators.RankStats.groupedWeightedQuantiles(w,
        "source", "v", "doc_id", "w", Seq(25, 50, 75))
      .orderBy(col("source"), col("pct"))
  }

  // Robust trend SLOPE: Theil–Sen lower-median of pairwise slopes
  // over each user's daily counts — q206's Mann–Kendall says whether
  // a user trends, this says how fast, and a single spike moves at
  // most n−1 of the ~n²/2 slopes. Same quadratic-in-series,
  // linear-in-keys shape; the median is a SELECTED slope, never an
  // average.
  q("q239_theil_sen",
    """WITH d239 AS (SELECT user_id AS k, epoch_ms(ts) // 86400000 AS t,
      |    CAST(count(*) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |n239 AS (SELECT k, CAST(count(*) AS BIGINT) AS n_obs
      |  FROM d239 GROUP BY 1 HAVING count(*) >= 10),
      |k239 AS (SELECT d239.k, t, v, n_obs
      |  FROM d239 JOIN n239 ON n239.k = d239.k),
      |p239 AS (SELECT a.k, a.n_obs, a.t AS ta, b.t AS tb,
      |    CAST(b.v - a.v AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s
      |  FROM k239 a JOIN k239 b ON a.k = b.k AND a.t < b.t),
      |r239 AS (SELECT k, n_obs, s,
      |    row_number() OVER (PARTITION BY k ORDER BY s, ta, tb) AS rn,
      |    count(*) OVER (PARTITION BY k) AS np
      |  FROM p239)
      |SELECT k AS user_id, n_obs, CAST(np AS BIGINT) AS n_pairs,
      |  floor(s * 1e6 + 0.5)/1e6 AS slope6
      |FROM r239 WHERE rn = (np + 1) // 2
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("user_id").as("k"),
        expr("unix_millis(ts) div 86400000").as("t"))
      .agg(count(lit(1)).as("v"))
    graft.operators.TimeSeries.theilSen(daily, "k", "t", "v", minN = 10)
      .withColumnRenamed("k", "user_id")
      .orderBy(col("user_id"))
  }

  // ANN quality audit: recall@3 of the q46 IVF configuration against
  // the brute-force baseline, per probe + mean — q170's recall idea
  // pointed at the ANN family. The oracle shares u/nrm between the
  // exact and IVF chains and replays both verbatim.
  q("q240_ivf_recall_audit",
    """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |             unnest(embedding)::DOUBLE AS x FROM embeddings),
      |nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nr FROM u GROUP BY vec_id),
      |dx AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
      |         sum(p.x*c.x) AS dp
      |       FROM u p JOIN u c ON p.i = c.i
      |       WHERE p.vec_id < 10 AND c.vec_id >= 10 GROUP BY 1, 2),
      |csx AS (SELECT probe_id, neighbor_id,
      |          floor((dp / (x.nr * y.nr)) * 1000000.0 + 0.5) / 1000000.0
      |            AS cos
      |        FROM dx JOIN nrm x ON x.vec_id = probe_id
      |                JOIN nrm y ON y.vec_id = neighbor_id),
      |rx AS (SELECT probe_id, neighbor_id,
      |         row_number() OVER (PARTITION BY probe_id
      |           ORDER BY cos DESC, neighbor_id) AS rnk
      |       FROM csx),
      |cent AS (SELECT vec_id AS cvid, CAST(vec_id - 10 AS INT) AS cell
      |         FROM embeddings WHERE vec_id >= 10 AND vec_id < 18),
      |vc0 AS (SELECT a.vec_id AS vid, c.cell AS cell, c.cvid AS cvid,
      |          sum(a.x * b.x) AS dp
      |        FROM u a JOIN cent c ON true
      |        JOIN u b ON b.vec_id = c.cvid AND a.i = b.i
      |        GROUP BY 1, 2, 3),
      |vc AS (SELECT vid, cell,
      |         floor((dp / (x.nr * y.nr)) * 1000000.0 + 0.5) / 1000000.0
      |           AS ccos
      |       FROM vc0 JOIN nrm x ON x.vec_id = vid
      |               JOIN nrm y ON y.vec_id = cvid),
      |assign AS (SELECT vid, cell FROM (
      |  SELECT vid, cell, row_number() OVER (PARTITION BY vid
      |           ORDER BY (1.0 - ccos) ASC, cell) AS rn FROM vc)
      |  WHERE rn = 1),
      |pc AS (SELECT vid, cell FROM (
      |  SELECT vid, cell, row_number() OVER (PARTITION BY vid
      |           ORDER BY (1.0 - ccos) ASC, cell) AS rn FROM vc)
      |  WHERE rn <= 2),
      |cand AS (SELECT p.vid AS probe_id, n.vid AS neighbor_id
      |         FROM pc p JOIN assign n USING (cell)
      |         WHERE p.vid < 10 AND n.vid >= 10),
      |d AS (SELECT probe_id, neighbor_id, sum(pu.x * cu.x) AS dp
      |      FROM cand JOIN u pu ON pu.vec_id = probe_id
      |                JOIN u cu ON cu.vec_id = neighbor_id AND pu.i = cu.i
      |      GROUP BY 1, 2),
      |cs AS (SELECT probe_id, neighbor_id,
      |         floor((dp / (x.nr * y.nr)) * 1000000.0 + 0.5) / 1000000.0
      |           AS cos
      |       FROM d JOIN nrm x ON x.vec_id = probe_id
      |               JOIN nrm y ON y.vec_id = neighbor_id),
      |r AS (SELECT probe_id, neighbor_id,
      |        row_number() OVER (PARTITION BY probe_id
      |          ORDER BY cos DESC, neighbor_id) AS rnk
      |      FROM cs),
      |ex240 AS (SELECT probe_id, neighbor_id FROM rx WHERE rnk <= 3),
      |ap240 AS (SELECT probe_id, neighbor_id FROM r WHERE rnk <= 3),
      |ne240 AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS n_exact
      |  FROM ex240 GROUP BY 1),
      |hi240 AS (SELECT ex240.probe_id, CAST(count(*) AS BIGINT) AS nh
      |  FROM ex240 JOIN ap240 USING (probe_id, neighbor_id) GROUP BY 1),
      |pe240 AS (SELECT ne240.probe_id, n_exact,
      |    CAST(coalesce(nh, 0) AS BIGINT) AS n_hit,
      |    CAST(floor(CAST(coalesce(nh, 0) AS DOUBLE)
      |      / CAST(n_exact AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS rm
      |  FROM ne240 LEFT JOIN hi240 ON hi240.probe_id = ne240.probe_id),
      |t240 AS (SELECT CAST(count(*) AS BIGINT) AS np,
      |    CAST(coalesce(sum(rm), 0) AS BIGINT) AS srm FROM pe240)
      |SELECT probe_id, n_exact, n_hit, CAST(rm AS DOUBLE)/1e6 AS recall6,
      |  CASE WHEN np > 0 THEN floor(CAST(srm AS DOUBLE)
      |    / CAST(np AS DOUBLE) + 0.5)/1e6 END AS mean_recall6
      |FROM pe240, t240 ORDER BY probe_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val probes = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val exact = Similarity.bruteForceTopK(probes, corpus,
      "vec_id", "embedding", k = 3)
    val ivf = Similarity.ivfTopK(probes, corpus,
      "vec_id", "embedding", numCells = 8, nprobe = 2, k = 3)
    Similarity.annRecallAudit(exact, ivf,
        "probe_id", "neighbor_id", "rnk", k = 3)
      .orderBy(col("probe_id"))
  }

  /** q242's oracle: the unigram-LM hard-EM round with the q139 DP
    * replay — per-prefix-length MATERIALIZED layers whose branch
    * scores come from the LEARNED piece table (ugV) instead of
    * q139's literal len², then the recursive backtrack, then the
    * usage re-estimation. maxW = 12 covers the fixture (8) and the
    * deck suffixes (11), the q139 bound.
    */
  private val q242Oracle: String = {
    val maxW = 12
    val maxP = 4
    val layers = (1 to maxW).map { i =>
      val branches = (math.max(0, i - maxP) until i).map { j =>
        s"""SELECT p.word, p.wf, p.s + v.sc AS s, $j AS j
           |FROM ug$j p JOIN ugV v
           |  ON v.piece = substr(p.word, ${j + 1}, ${i - j})
           |WHERE length(p.word) >= $i""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""ug$i AS MATERIALIZED (SELECT word, wf, s, j FROM (
         |  SELECT word, wf, s, j,
         |    row_number() OVER (PARTITION BY word ORDER BY s DESC, j)
         |      AS rn
         |  FROM ($branches)) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val dpAll = (1 to maxW)
      .map(i => s"SELECT word, $i AS i, j FROM ug$i")
      .mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE
       |ugT AS (SELECT unnest($sqlTokens) AS word FROM documents),
       |ugW AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS wf
       |  FROM ugT GROUP BY 1),
       |ugP AS (SELECT word, wf,
       |    unnest(generate_series(1, length(word))) AS pos FROM ugW),
       |ugO AS (SELECT word, wf, pos,
       |    unnest(generate_series(1, least($maxP,
       |      length(word) - pos + 1))) AS l FROM ugP),
       |ugOP AS (SELECT word, wf, pos, l, substr(word, pos, l) AS piece
       |  FROM ugO),
       |ugS AS (SELECT piece, CAST(sum(wf) AS BIGINT) AS c
       |  FROM ugOP GROUP BY 1),
       |ugK AS MATERIALIZED (SELECT piece, c FROM ugS
       |  WHERE c >= 50 OR length(piece) = 1),
       |ugTT AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM ugK),
       |ugV AS MATERIALIZED (SELECT piece, c AS seed_count,
       |    CAST(floor(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
       |      * 1e6 + 0.5) AS BIGINT) AS sc
       |  FROM ugK, ugTT),
       |ug0 AS (SELECT word, wf, CAST(0 AS BIGINT) AS s FROM ugW),
       |$layers,
       |ugDp AS ($dpAll),
       |ugWalk AS (
       |  SELECT word, wf, length(word) AS i, CAST([] AS VARCHAR[]) AS ps
       |  FROM ugW
       |  UNION ALL
       |  SELECT w.word, w.wf, d.j,
       |    list_prepend(substr(w.word, d.j + 1, w.i - d.j), w.ps)
       |  FROM ugWalk w JOIN ugDp d ON d.word = w.word AND d.i = w.i
       |  WHERE w.i > 0),
       |ugDone AS (SELECT word, wf, ps FROM ugWalk WHERE i = 0),
       |ugU AS (SELECT unnest(ps) AS piece, wf FROM ugDone),
       |ugUs AS MATERIALIZED (SELECT piece, CAST(sum(wf) AS BIGINT)
       |    AS usage
       |  FROM ugU GROUP BY 1),
       |ugUT AS (SELECT CAST(sum(usage) AS BIGINT) AS u FROM ugUs)
       |SELECT ugUs.piece, seed_count, usage,
       |  floor(ln(CAST(usage AS DOUBLE) / CAST(u AS DOUBLE))
       |    * 1e6 + 0.5)/1e6 AS score6
       |FROM ugUs JOIN ugV ON ugV.piece = ugUs.piece, ugUT
       |ORDER BY usage DESC, ugUs.piece LIMIT 50""".stripMargin
  }

  // Forecast gate: is q230's Holt actually better than "same day
  // last week"? MASE-shaped readout per event_type — both absolute
  // errors micro-snapped per day, exact int64 sums, the ratio NULL
  // only if the naive is perfect. A model that reads >= 1 here
  // should not ship.
  q("q245_forecast_mase",
    """WITH RECURSIVE d245 AS (SELECT event_type,
      |    epoch_ms(ts) // 86400000 AS t, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |o245 AS (SELECT event_type, t, CAST(n AS DOUBLE) AS x,
      |    row_number() OVER (PARTITION BY event_type ORDER BY t) AS rn
      |  FROM d245),
      |c245(event_type, rn, t, x, l, b, fc) AS (
      |  SELECT event_type, rn, t, x, x, 0e0, CAST(NULL AS DOUBLE)
      |  FROM o245 WHERE rn = 1
      |  UNION ALL
      |  SELECT o245.event_type, o245.rn, o245.t, o245.x,
      |    0.5 * o245.x + (1e0 - 0.5) * (c245.l + c245.b),
      |    0.25 * ((0.5 * o245.x + (1e0 - 0.5) * (c245.l + c245.b))
      |      - c245.l) + (1e0 - 0.25) * c245.b,
      |    c245.l + c245.b
      |  FROM c245 JOIN o245 ON o245.event_type = c245.event_type
      |    AND o245.rn = c245.rn + 1),
      |f245 AS (SELECT event_type, t, x,
      |    CASE WHEN fc IS NOT NULL THEN floor(fc * 1e6 + 0.5)/1e6 END
      |      AS fc6,
      |    lag(x, 7) OVER (PARTITION BY event_type ORDER BY t) AS nv
      |  FROM c245),
      |e245 AS (SELECT event_type,
      |    CAST(floor(abs(x - fc6) * 1e6 + 0.5) AS BIGINT) AS eh,
      |    CAST(floor(abs(x - nv) * 1e6 + 0.5) AS BIGINT) AS en
      |  FROM f245 WHERE fc6 IS NOT NULL AND nv IS NOT NULL),
      |m245 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(eh) AS BIGINT) AS sh, CAST(sum(en) AS BIGINT) AS sn
      |  FROM e245 GROUP BY 1)
      |SELECT event_type, n,
      |  floor((CAST(sh AS DOUBLE) / CAST(n AS DOUBLE) / 1e6)
      |    * 1e6 + 0.5)/1e6 AS mae_holt6,
      |  floor((CAST(sn AS DOUBLE) / CAST(n AS DOUBLE) / 1e6)
      |    * 1e6 + 0.5)/1e6 AS mae_naive6,
      |  CASE WHEN sn > 0 THEN floor((CAST(sh AS DOUBLE)
      |    / CAST(sn AS DOUBLE)) * 1e6 + 0.5)/1e6 END AS mase6
      |FROM m245 ORDER BY event_type""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("t"))
      .agg(count(lit(1)).cast("double").as("x"))
    graft.operators.TimeSeries.holtVsSeasonalNaive(daily,
        "event_type", "t", "x", alpha = 0.5, beta = 0.25, period = 7)
      .orderBy(col("event_type"))
  }

  // Series memory: the autocorrelation function of the TOTAL daily
  // arrival series at lags ±3 — crossCorrelation pointed at itself
  // (lag 0 reads exactly 1, the symmetry is the sanity check, and a
  // slow decay is the "yesterday predicts today" signal q230's Holt
  // gains exploit). Same zero-filled grid, one bounded window.
  q("q244_acf", {
    def dd(e: String) = s"CAST($e AS DOUBLE)"
    def cN(l: Int) = if (l < 0) s"ym${-l}" else if (l > 0) s"yp$l" else "yv"
    val rows = (-3 to 3).map { l =>
      val c = cN(l)
      val n = dd(s"sum(CASE WHEN $c IS NOT NULL THEN 1 ELSE 0 END)")
      val sx = dd(s"sum(CASE WHEN $c IS NOT NULL THEN xv ELSE 0 END)")
      val sy = dd(s"sum(CASE WHEN $c IS NOT NULL THEN $c ELSE 0 END)")
      val sxx = dd(s"sum(CASE WHEN $c IS NOT NULL THEN xv * xv ELSE 0 END)")
      val syy = dd(s"sum(CASE WHEN $c IS NOT NULL THEN $c * $c ELSE 0 END)")
      val sxy = dd(s"sum(CASE WHEN $c IS NOT NULL THEN xv * $c ELSE 0 END)")
      val va = s"$n * $sxx - $sx * $sx"
      val vb = s"$n * $syy - $sy * $sy"
      val cov = s"$n * $sxy - $sx * $sy"
      s"""SELECT CAST($l AS BIGINT) AS lag,
         |  CAST(sum(CASE WHEN $c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pairs,
         |  CASE WHEN $va > 0 AND $vb > 0
         |       THEN floor(($cov) / sqrt(($va) * ($vb)) * 1e6 + 0.5)/1e6
         |  END AS ccf6
         |FROM s244""".stripMargin
    }
    s"""WITH b244 AS (SELECT epoch_ms(ts) // 86400000 AS t,
       |    CAST(count(*) AS BIGINT) AS v
       |  FROM events GROUP BY 1),
       |bd244 AS (SELECT min(t) AS lo, max(t) AS hi FROM b244),
       |gr244 AS (SELECT unnest(range(lo, hi + 1)) AS t FROM bd244),
       |g244 AS (SELECT gr244.t, coalesce(v, 0) AS xv, coalesce(v, 0)
       |    AS yv
       |  FROM gr244 LEFT JOIN b244 ON b244.t = gr244.t),
       |s244 AS (SELECT xv, yv,
       |    lag(yv, 3) OVER (ORDER BY t) AS ym3,
       |    lag(yv, 2) OVER (ORDER BY t) AS ym2,
       |    lag(yv, 1) OVER (ORDER BY t) AS ym1,
       |    lead(yv, 1) OVER (ORDER BY t) AS yp1,
       |    lead(yv, 2) OVER (ORDER BY t) AS yp2,
       |    lead(yv, 3) OVER (ORDER BY t) AS yp3
       |  FROM g244)
       |${rows.mkString("\nUNION ALL\n")}
       |ORDER BY lag""".stripMargin
  }) { (s, d) =>
    val daily = Tables.events(s, d)
      .select(expr("unix_millis(ts) div 86400000").as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("v"))
    graft.operators.TimeSeries.crossCorrelation(daily, daily, "t", "v",
        maxLag = 3)
      .orderBy(col("lag"))
  }

  // Campaign-targeting readout: decile lift/gains of the q85 NB
  // scorer against the q58 rule labels — "keep the top k deciles,
  // capture X% of the good docs at Y× random". Equal-count integer
  // rank cuts (q183's discipline) over one range-partitioned prefix
  // pass; the cumulative runs on the 10-row bin frame.
  q("q243_lift_table", {
    s"""WITH $nbQualityCtes,
       |lo243 AS (SELECT sc85.doc_id,
       |    CAST(floor((raw + ln(n1 * 1.0 / n0)) * 1e6 + 0.5) AS BIGINT)
       |      AS m
       |  FROM sc85, pri85),
       |la243 AS (SELECT doc_id, $nbRuleSql AS y FROM f85),
       |j243 AS (SELECT lo243.doc_id, m,
       |    CASE WHEN y THEN 1 ELSE 0 END AS y
       |  FROM lo243 JOIN la243 USING (doc_id)),
       |r243 AS (SELECT doc_id, m, y,
       |    CAST(row_number() OVER (ORDER BY m DESC, doc_id) - 1
       |      AS BIGINT) AS rk
       |  FROM j243),
       |t243 AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(y) AS BIGINT) AS pos FROM j243),
       |b243 AS (SELECT (rk * 10) // n AS bin, y FROM r243, t243),
       |g243 AS (SELECT bin, CAST(count(*) AS BIGINT) AS nb,
       |    CAST(sum(y) AS BIGINT) AS pb
       |  FROM b243 GROUP BY 1),
       |c243 AS (SELECT bin, nb, pb,
       |    CAST(sum(pb) OVER (ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cp
       |  FROM g243)
       |SELECT bin, nb AS n, pb AS n_pos,
       |  floor((CAST(pb AS DOUBLE) / CAST(nb AS DOUBLE)) * 1e6 + 0.5)
       |    /1e6 AS pos_rate6,
       |  CASE WHEN pos > 0 THEN floor((CAST(cp AS DOUBLE)
       |    / CAST(pos AS DOUBLE)) * 1e6 + 0.5)/1e6 END AS capture6,
       |  CASE WHEN pos > 0 THEN
       |    floor(((CAST(pb AS DOUBLE) / CAST(nb AS DOUBLE))
       |      / (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)))
       |      * 1e6 + 0.5)/1e6
       |  END AS lift6
       |FROM c243, t243 ORDER BY bin""".stripMargin
  }) { (s, d) =>
    val sc = PipelineQueries.nbScored(s, d)
      .select(col("doc_id"),
        floor(col("log_odds") * lit(1e6) + lit(0.5)).cast("long").as("m"),
        col("keep"))
    graft.operators.RankStats.liftTable(sc, "doc_id", "m", "keep",
        bins = 10)
      .orderBy(col("bin"))
  }

  // The FOURTH tokenizer discipline: unigram-LM (SentencePiece
  // shape), one hard-EM round — seed substring counts → ln-prob
  // scores micro-snapped → Viterbi E-step per distinct word (the
  // q139 DP with LEARNED scores in place of len²) → usage-weighted
  // M-step re-estimation. Top-50 re-estimated pieces.
  q("q242_unigram_em", q242Oracle) { (s, d) =>
    graft.operators.UnigramLm.emRound(Tables.documents(s, d), "text",
      maxPieceLen = 4, minCount = 50L, topK = 50)
  }

  // Consistent work assignment: rendezvous (HRW) hashing of the
  // (event_type × 16-partition) topic grid onto 5 workers — the
  // reference's partition→sync-worker fan-out as a first-class
  // operator: removing one worker moves ONLY its ~1/W of the
  // partitions. One row-local codegen'd greatest() fold; the oracle
  // replays the argmax as an (h DESC, w DESC) window.
  q("q241_rendezvous_assign",
    """WITH pt241 AS (SELECT DISTINCT event_type FROM events),
      |pp241 AS (SELECT event_type, pp FROM pt241
      |  CROSS JOIN (SELECT unnest(range(0, 16)) AS pp)),
      |wk241 AS (SELECT unnest(['w0','w1','w2','w3','w4']) AS w),
      |h241 AS (SELECT event_type, pp, w,
      |    CAST('0x' || substr(md5(w || '|' || event_type || '#'
      |      || CAST(pp AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM pp241 CROSS JOIN wk241),
      |a241 AS (SELECT event_type, pp, w,
      |    row_number() OVER (PARTITION BY event_type, pp
      |      ORDER BY h DESC, w DESC) AS rn
      |  FROM h241)
      |SELECT event_type, CAST(pp AS BIGINT) AS p, w AS worker
      |FROM a241 WHERE rn = 1
      |ORDER BY event_type, p""".stripMargin) { (s, d) =>
    val parts = Tables.events(s, d).select(col("event_type")).distinct()
      .crossJoin(s.range(16).select(col("id").as("p")))
    graft.operators.ScaleOps.rendezvousAssign(parts,
        Seq("event_type", "p"),
        Seq("w0", "w1", "w2", "w3", "w4"))
      .orderBy(col("event_type"), col("p"))
  }

  // Data-mixing allocation: WATER-FILL the per-source character mass
  // against a 60%-of-total budget — the max-min-fair cap ("every
  // source keeps up to one common level L, small sources keep all")
  // that q87's temperature mix reshapes and this CAPS. Pure int64:
  // the level solve is integer division over the source-sized sorted
  // frame; the oracle replays the identical first-infeasible-rank
  // selection.
  q("q246_water_fill",
    """WITH g246 AS (SELECT source, CAST(sum(n_chars) AS BIGINT)
      |    AS n_tokens
      |  FROM documents GROUP BY 1),
      |b246 AS (SELECT (CAST(sum(n_tokens) AS BIGINT) * 6) // 10 AS b
      |  FROM g246),
      |r246 AS (SELECT source, n_tokens,
      |    CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT)
      |      AS r,
      |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY n_tokens, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS pb,
      |    (SELECT CAST(count(*) AS BIGINT) FROM g246) AS k
      |  FROM g246),
      |c246 AS (SELECT source, n_tokens, r,
      |    (b - pb) // (k - r + 1) AS lvl
      |  FROM r246, b246),
      |l246 AS (SELECT min(CASE WHEN lvl < n_tokens THEN r END) AS rs
      |  FROM c246),
      |lv246 AS (SELECT lvl AS level FROM c246, l246 WHERE c246.r = l246.rs)
      |SELECT g246.source, n_tokens,
      |  (SELECT level FROM lv246) AS level,
      |  CAST(CASE WHEN (SELECT count(*) FROM lv246) = 0 THEN n_tokens
      |       ELSE least(n_tokens, (SELECT level FROM lv246)) END
      |    AS BIGINT) AS alloc,
      |  (CASE WHEN (SELECT count(*) FROM lv246) = 0 THEN n_tokens
      |       ELSE least(n_tokens, (SELECT level FROM lv246)) END)
      |    = n_tokens AS funded
      |FROM g246 ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val total = docs.agg(
      sum(col("n_chars").cast("long"))).head().getLong(0)
    graft.operators.Curation.waterFill(docs, "source", "n_chars",
        budget = total * 6 / 10)
      .orderBy(col("source"))
  }

  // Data-CONSTRAINED mixing: when the token budget exceeds the unique
  // corpus, repeat sources — up to the published ~4-epoch usefulness
  // ceiling (Muennighoff et al. 2023) — by water-filling the budget
  // against per-source CAPACITY = 4·n_tokens. The readout is the
  // epoch schedule: how many passes each source gets under a 2×-corpus
  // budget (small sources saturate at 4.0, the largest are capped at
  // the common level). Same int64 solve as q246, one derived frame up.
  q("q263_epoch_schedule",
    """WITH s263 AS (SELECT source, CAST(sum(n_chars) AS BIGINT)
      |    AS n_tokens
      |  FROM documents GROUP BY 1),
      |g263 AS (SELECT source, n_tokens, n_tokens * 4 AS cap FROM s263),
      |b263 AS (SELECT CAST(sum(n_tokens) AS BIGINT) * 2 AS b FROM s263),
      |r263 AS (SELECT source, cap,
      |    CAST(row_number() OVER (ORDER BY cap, source) AS BIGINT) AS r,
      |    CAST(coalesce(sum(cap) OVER (ORDER BY cap, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS pb,
      |    (SELECT CAST(count(*) AS BIGINT) FROM g263) AS k
      |  FROM g263),
      |c263 AS (SELECT source, cap, r,
      |    (b - pb) // (k - r + 1) AS lvl
      |  FROM r263, b263),
      |l263 AS (SELECT min(CASE WHEN lvl < cap THEN r END) AS rs
      |  FROM c263),
      |lv263 AS (SELECT lvl AS level FROM c263, l263 WHERE c263.r = l263.rs),
      |a263 AS (SELECT g263.source, g263.n_tokens,
      |    CAST(cap AS BIGINT) AS capacity,
      |    (SELECT level FROM lv263) AS level,
      |    CAST(CASE WHEN (SELECT count(*) FROM lv263) = 0 THEN cap
      |         ELSE least(cap, (SELECT level FROM lv263)) END
      |      AS BIGINT) AS alloc
      |  FROM g263)
      |SELECT source, n_tokens, capacity, level, alloc,
      |  CASE WHEN n_tokens > 0 THEN
      |    floor(CAST(alloc AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      |      * 1e6 + 0.5)/1e6 END AS epochs6,
      |  alloc = capacity AS saturated
      |FROM a263 ORDER BY source""".stripMargin) { (s, d) =>
    val perSrc = Tables.documents(s, d).groupBy(col("source"))
      .agg(sum(col("n_chars").cast("long")).as("n_tokens"))
    val total = perSrc.agg(sum(col("n_tokens"))).head().getLong(0)
    val caps = perSrc.select(col("source"),
      (col("n_tokens") * lit(4L)).as("capacity"))
    graft.operators.Curation.waterFill(caps, "source", "capacity",
        budget = total * 2)
      .withColumnRenamed("n_tokens", "capacity")
      .join(perSrc, Seq("source"))
      .select(col("source"), col("n_tokens"), col("capacity"),
        col("level"), col("alloc"),
        when(col("n_tokens") > 0,
          pround(col("alloc").cast("double") / col("n_tokens"), 6))
          .otherwise(lit(null).cast("double")).as("epochs6"),
        (col("alloc") === col("capacity")).as("saturated"))
      .orderBy(col("source"))
  }

  // Vocabulary mass: Good-Turing frequency-of-frequencies — the
  // unseen-token probability P0 = N1/N next to q220's Heaps exponent
  // and q187's Zipf slope, plus the smoothed counts r* the q168 KN
  // smoother builds on. Two aggregates and a 5-row grid; NULL r*
  // where a frequency class is empty.
  q("q247_good_turing",
    s"""WITH t247 AS (SELECT unnest($sqlTokens) AS w FROM documents),
       |tc247 AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM t247
       |  GROUP BY 1),
       |cc247 AS (SELECT c, CAST(count(*) AS BIGINT) AS n_c FROM tc247
       |  GROUP BY 1),
       |tot247 AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM t247),
       |n247 AS (SELECT CAST(coalesce((SELECT n_c FROM cc247 WHERE c = 1),
       |    0) AS BIGINT) AS n_1),
       |g247 AS (SELECT CAST(unnest(range(1, 6)) AS BIGINT) AS r)
       |SELECT r, CAST(coalesce(c1.n_c, 0) AS BIGINT) AS n_r,
       |  CAST(coalesce(c2.n_c, 0) AS BIGINT) AS n_r1,
       |  CASE WHEN coalesce(c1.n_c, 0) > 0 AND coalesce(c2.n_c, 0) > 0
       |    THEN floor(CAST(r + 1 AS DOUBLE) * CAST(c2.n_c AS DOUBLE)
       |      / CAST(c1.n_c AS DOUBLE) * 1e6 + 0.5)/1e6
       |  END AS rstar6,
       |  n_tokens, n_1,
       |  floor(CAST(n_1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1e6
       |    + 0.5)/1e6 AS p0_6
       |FROM g247 LEFT JOIN cc247 c1 ON c1.c = g247.r
       |LEFT JOIN cc247 c2 ON c2.c = g247.r + 1, tot247, n247
       |ORDER BY r""".stripMargin) { (s, d) =>
    TextAnalysis.goodTuring(Tables.documents(s, d), "text", maxR = 5)
      .orderBy(col("r"))
  }
}
