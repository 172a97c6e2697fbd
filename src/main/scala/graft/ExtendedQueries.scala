package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.AsOfJoin

/** Extended operator surface (SURVEY §2B R-16…R-30 + U-3 fan-out). */
object ExtendedQueries extends QueryGroup {

  // --------------------------------------------------------------- R-16
  // As-of (floor) join via graft.operators.AsOfJoin — the reference's
  // SparseMap floor lookup with no-match ⇒ null instead of an NPE.
  // Probe: error events; build: click events; floor per user_id.
  q("q17_asof_join",
    """WITH b AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      |     p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error')
      |SELECT p.event_id AS event_id, l.bid, l.bts
      |FROM p LEFT JOIN LATERAL (
      |  SELECT event_id AS bid, epoch_ms(ts) AS bts FROM b
      |  WHERE b.user_id = p.user_id AND b.ts <= p.ts
      |  ORDER BY ts DESC, event_id DESC LIMIT 1) l ON true
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val probe = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val build = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("bid"), unix_millis(col("ts")).as("bts"))
    AsOfJoin.floorJoin(probe, build,
        keys = Seq("user_id"), probeTs = "ts", buildTs = "ts",
        payload = Seq("bid", "bts"))
      .select(col("event_id"), col("bid"), col("bts"))
      .orderBy(col("event_id"))
  }

  // R-16 forward direction: earliest click AT-OR-AFTER each error
  // (pandas merge_asof direction='forward'); same single-shuffle
  // union-window machinery as the floor, sort reversed.
  q("q67_asof_forward",
    """WITH b AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      |     p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error')
      |SELECT p.event_id AS event_id, l.bid, l.bts
      |FROM p LEFT JOIN LATERAL (
      |  SELECT event_id AS bid, epoch_ms(ts) AS bts FROM b
      |  WHERE b.user_id = p.user_id AND b.ts >= p.ts
      |  ORDER BY ts ASC, event_id DESC LIMIT 1) l ON true
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val probe = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val build = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("bid"), unix_millis(col("ts")).as("bts"))
    AsOfJoin.ceilJoin(probe, build,
        keys = Seq("user_id"), probeTs = "ts", buildTs = "ts",
        payload = Seq("bid", "bts"))
      .select(col("event_id"), col("bid"), col("bts"))
      .orderBy(col("event_id"))
  }

  // R-16 nearest direction with a tolerance: the click closest in
  // time to each error (either side), distance ties to the floor
  // side, and hits farther than 10 minutes nulled out (pandas
  // merge_asof direction='nearest', tolerance=). The lateral ranks
  // ALL candidate clicks by (distance, side, payload-convention) —
  // provably the same row the two-frame window pass selects.
  q("q68_asof_nearest",
    """WITH b AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      |     p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error')
      |SELECT p.event_id AS event_id, l.bid, l.bts
      |FROM p LEFT JOIN LATERAL (
      |  SELECT event_id AS bid, epoch_ms(ts) AS bts FROM b
      |  WHERE b.user_id = p.user_id
      |    AND abs(epoch_ms(b.ts) - epoch_ms(p.ts)) <= 600000
      |  ORDER BY abs(epoch_ms(b.ts) - epoch_ms(p.ts)) ASC,
      |    CASE WHEN b.ts <= p.ts THEN 0 ELSE 1 END ASC,
      |    CASE WHEN b.ts <= p.ts THEN -event_id ELSE event_id END ASC
      |  LIMIT 1) l ON true
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val probe = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val build = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("bid"), unix_millis(col("ts")).as("bts"))
    AsOfJoin.nearestJoin(probe, build,
        keys = Seq("user_id"), probeTs = "ts", buildTs = "ts",
        payload = Seq("bid", "bts"),
        distance = (a, b) => abs(unix_millis(a) - unix_millis(b)),
        tolerance = Some((a, b) =>
          abs(unix_millis(a) - unix_millis(b)) <= 600000L))
      .select(col("event_id"), col("bid"), col("bts"))
      .orderBy(col("event_id"))
  }

  // --------------------------------------------------------------- R-17
  q("q18_setops",
    """WITH a AS (SELECT p_partkey FROM part WHERE p_size < 25),
      |     b AS (SELECT p_partkey FROM part WHERE p_retailprice < 1500)
      |SELECT 'both' AS op, p_partkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      |UNION ALL
      |SELECT 'only_a' AS op, p_partkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      |UNION ALL
      |SELECT 'all' AS op, p_partkey FROM (SELECT * FROM a UNION SELECT * FROM b)
      |ORDER BY op, p_partkey""".stripMargin) { (s, d) =>
    val part = Tables.part(s, d)
    val a = part.filter(col("p_size") < 25).select(col("p_partkey"))
    val b = part.filter(col("p_retailprice") < 1500).select(col("p_partkey"))
    val both = a.intersect(b).select(lit("both").as("op"), col("p_partkey"))
    val onlyA = a.except(b).select(lit("only_a").as("op"), col("p_partkey"))
    val union = a.union(b).distinct().select(lit("all").as("op"), col("p_partkey"))
    both.unionAll(onlyA).unionAll(union).orderBy(col("op"), col("p_partkey"))
  }

  // --------------------------------------------------------------- R-18
  // Deterministic exact dedup: keep the min-event_id row per
  // (user_id, event_type) — dropDuplicates keeps an arbitrary row, so
  // the oracle-checked form pins the survivor explicitly (same rule as
  // the reference's cursorPositionSet dedup, SURVEY §2A A19).
  q("q19_dedup_exact",
    s"""SELECT user_id, event_type, event_id, ${sqlRound("value", 2)} AS value
       |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
       |      FROM events) t
       |WHERE rn = 1
       |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        pround(col("value"), 2).as("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  // --------------------------------------------------------------- R-22
  q("q20_string_fns",
    """SELECT p_partkey,
      |  CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
      |  upper(substring(p_name, 1, 8)) AS name8,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
      |  length(p_type) AS type_len,
      |  levenshtein(p_brand, 'Brand#11') AS lev,
      |  concat(p_brand, ':', CAST(p_size AS VARCHAR)) AS tag
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).cast("int").as("brand_num"),
        upper(substring(col("p_name"), 1, 8)).as("name8"),
        lpad(col("p_size").cast("string"), 4, "0").as("size4"),
        length(col("p_type")).as("type_len"),
        levenshtein(col("p_brand"), lit("Brand#11")).as("lev"),
        concat(col("p_brand"), lit(":"), col("p_size").cast("string")).as("tag"))
      .orderBy(col("p_partkey"))
  }

  // --------------------------------------------------------------- R-23
  q("q21_datetime_month",
    s"""SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
       |  count(*) AS n, ${sqlRound("sum(o_totalprice)", 2)} AS rev
       |FROM orders
       |GROUP BY year(o_orderdate), month(o_orderdate)
       |ORDER BY y, m""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"), pround(sum(col("o_totalprice")), 2).as("rev"))
      .orderBy(col("y"), col("m"))
  }

  // R-23 row-level: trunc to hour/minute (the reference's 60 s
  // sampling bucket, PulsarPartitionSyncWorker.java:236), day diff.
  q("q22_datetime_row",
    """SELECT event_id,
      |  epoch_ms(date_trunc('hour', ts)) AS hour_ms,
      |  epoch_ms(date_trunc('minute', ts)) AS minute_ms,
      |  year(ts) AS y, month(ts) AS m,
      |  date_diff('day', DATE '2024-01-01', ts::DATE) AS d_since
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
        unix_millis(date_trunc("minute", col("ts"))).as("minute_ms"),
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("d_since"))
      .orderBy(col("event_id"))
  }

  // --------------------------------------------------------------- R-24
  q("q23_math_fns",
    s"""SELECT p_partkey,
       |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       |  abs(p_size - 25) AS size_dev,
       |  ${sqlRound("sqrt(p_retailprice)", 4)} AS price_sqrt,
       |  p_size * p_size AS size_sq,
       |  ${sqlRound("ln(p_retailprice)", 6)} AS price_ln
       |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        floor(col("p_retailprice")).as("price_floor"),
        ceil(col("p_retailprice")).as("price_ceil"),
        abs(col("p_size") - 25).as("size_dev"),
        pround(sqrt(col("p_retailprice")), 4).as("price_sqrt"),
        (col("p_size") * col("p_size")).as("size_sq"),
        pround(log(col("p_retailprice")), 6).as("price_ln"))
      .orderBy(col("p_partkey"))
  }

  // --------------------------------------------------------------- R-25
  // Higher-order array functions over the embedding column; the dot
  // product stays in codegen (no UDF).
  q("q24_array_fns",
    s"""SELECT vec_id,
       |  len(embedding) AS dim,
       |  ${sqlRound("sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x)))", 4)} AS l2,
       |  ${sqlRound("embedding[1]::DOUBLE", 6)} AS e1,
       |  ${sqlRound("list_max(embedding)::DOUBLE", 6)} AS emax,
       |  ${sqlRound("list_min(embedding)::DOUBLE", 6)} AS emin
       |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        pround(sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))), 4).as("l2"),
        pround(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
        pround(array_max(col("embedding")).cast("double"), 6).as("emax"),
        pround(array_min(col("embedding")).cast("double"), 6).as("emin"))
      .orderBy(col("vec_id"))
  }

  // -------------------------------------------------------- R-26 / R-27
  // Map + JSON over events.props (the reference's message `properties`
  // map, PulsarPartitionSyncWorker.java:230).
  q("q25_map_json",
    """SELECT event_id,
      |  json_keys(props)[1] AS k0,
      |  json_extract(props, '$.' || json_keys(props)[1])::INT AS v,
      |  length(props) AS plen
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    val m = from_json(col("props"),
      org.apache.spark.sql.types.DataType.fromDDL("map<string,int>"))
    Tables.events(s, d)
      .select(col("event_id"),
        element_at(map_keys(m), 1).as("k0"),
        element_at(m, element_at(map_keys(m), 1)).as("v"),
        length(col("props")).as("plen"))
      .orderBy(col("event_id"))
  }

  // R-27 serialization direction: struct -> JSON text (from_json is
  // covered by q25).
  q("q43_json_roundtrip",
    """SELECT event_id,
      |  to_json(struct_pack(t := event_type, u := user_id))::VARCHAR AS j
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        to_json(struct(col("event_type").as("t"), col("user_id").as("u"))).as("j"))
      .orderBy(col("event_id"))
  }

  // R-4 statistical aggregates: exact interpolated percentiles
  // (Spark percentile = DuckDB quantile_cont), sample stddev,
  // correlation.
  q("q44_stats_agg",
    s"""SELECT o_orderpriority,
       |  ${sqlRound("quantile_cont(o_totalprice, 0.5)", 2)} AS med,
       |  ${sqlRound("quantile_cont(o_totalprice, 0.9)", 2)} AS p90,
       |  ${sqlRound("stddev_samp(o_totalprice)", 2)} AS sd,
       |  ${sqlRound("corr(o_totalprice, o_custkey)", 6)} AS price_cust_corr
       |FROM orders
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        pround(expr("percentile(o_totalprice, 0.5)"), 2).as("med"),
        pround(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        pround(stddev_samp(col("o_totalprice")), 2).as("sd"),
        pround(corr(col("o_totalprice"), col("o_custkey")), 6).as("price_cust_corr"))
      .orderBy(col("o_orderpriority"))
  }

  // Correlated-subquery semantics (SURVEY §4.2), fused: the oracle
  // keeps the three-subquery SQL text (scalar max, scalar count,
  // NOT EXISTS), but the engine side computes all three in ONE
  // aggregate over orders + ONE left join — a single shuffle of
  // orders instead of three decorrelated aggregate-join passes.
  // SqlSurfaceSpec asserts the same SQL text run through spark.sql
  // (Catalyst decorrelation) produces identical rows.
  private[graft] val subqSql =
    s"""SELECT c_custkey,
       |  ${sqlRound("(SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey)", 2)} AS max_order,
       |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
       |FROM customer
       |WHERE NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
       |ORDER BY c_custkey""".stripMargin

  q("q45_subqueries", subqSql) { (s, d) =>
    val agg = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_totalprice")).as("__max_raw"),
        count(lit(1)).as("__cnt"),
        max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("__has_f"))
    Tables.customer(s, d)
      .join(agg, col("c_custkey") === col("o_custkey"), "left")
      // NOT EXISTS(status='F'): no orders at all (null) also passes
      .filter(coalesce(col("__has_f"), lit(0)) === 0)
      .select(col("c_custkey"),
        pround(col("__max_raw"), 2).as("max_order"), // null when no orders
        coalesce(col("__cnt"), lit(0L)).as("n_orders")) // count() of none = 0
      .orderBy(col("c_custkey"))
  }

  // --------------------------------------------------------------- R-28
  // when/otherwise + nullif + coalesce + null-safe equality — the
  // reference's `key != null` / `eventTime != 0` copy rules (A14).
  q("q26_conditional",
    """SELECT event_id,
      |  CASE WHEN event_type = 'error' THEN 'E'
      |       WHEN event_type = 'click' THEN 'C'
      |       ELSE 'other' END AS cls,
      |  coalesce(nullif(user_id, 13), -1) AS uid_masked,
      |  (user_id IS NOT DISTINCT FROM 13) AS is13
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        when(col("event_type") === "error", "E")
          .when(col("event_type") === "click", "C")
          .otherwise("other").as("cls"),
        coalesce(nullif(col("user_id"), lit(13)), lit(-1)).as("uid_masked"),
        (col("user_id") <=> lit(13)).as("is13"))
      .orderBy(col("event_id"))
  }

  // --------------------------------------------------------------- R-29
  // Deterministic sampling: key-mod filter (portable across engines;
  // df.sample(fraction, seed) uses an engine-specific PRNG so it can't
  // be oracle-checked).
  q("q27_sample_mod",
    """SELECT l_orderkey, l_linenumber FROM lineitem
      |WHERE l_orderkey % 97 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 97 === 0)
      .select(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  // R-29 stratified deterministic sampling: the k docs per stratum
  // (lang) with the smallest md5-of-id — a reproducible per-stratum
  // reservoir whose membership is stable across engines, re-runs, and
  // repartitioning (the property PRNG-based sampling lacks). One
  // shuffle on the stratum key.
  q("q48_stratified_sample",
    """SELECT lang, rn, doc_id FROM (
      |  SELECT lang, doc_id,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select(col("lang"), col("rn"), col("doc_id"))
      .orderBy(col("lang"), col("rn"))
  }

  // --------------------------------------------------------------- R-30
  q("q28_pivot",
    s"""SELECT n_name,
       |  ${sqlRound("sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END)", 2)} AS p1_urgent,
       |  ${sqlRound("sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END)", 2)} AS p2_high,
       |  ${sqlRound("sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END)", 2)} AS p3_medium,
       |  ${sqlRound("sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END)", 2)} AS p4_notspec,
       |  ${sqlRound("sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END)", 2)} AS p5_low
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin) { (s, d) =>
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val names = Seq("p1_urgent", "p2_high", "p3_medium", "p4_notspec", "p5_low")
    val piv = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("o_orderpriority", priorities)
      .agg(sum(col("o_totalprice")))
    piv.select(col("n_name") +:
        priorities.zip(names).map { case (p, n) => pround(col(p), 2).as(n) }: _*)
      .orderBy(col("n_name"))
  }

  // ---------------------------------------------------------------- U-3
  // Partition fan-out generator — the reference's topic × [0, n)
  // expansion (A13, Const.java:24) as explode(sequence(...)).
  q("q29_fanout",
    """SELECT p_partkey, i, 'p' || p_partkey || '-partition-' || i AS pname
      |FROM (SELECT p_partkey, unnest(generate_series(0, p_size - 1)) AS i FROM part)
      |ORDER BY p_partkey, i""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      // guard p_size <= 0: Spark's sequence(0, -1) counts DOWN while
      // DuckDB's generate_series is empty (same trap as
      // TextFns.wordShingles / Multimodal.sampleChunks); TPC-H has
      // p_size >= 1 but the operator must not depend on that
      .select(col("p_partkey"),
        explode(when(col("p_size") > 0, sequence(lit(0), col("p_size") - 1))
          .otherwise(array())).as("i"))
      .withColumn("pname", concat(lit("p"), col("p_partkey").cast("string"),
        lit("-partition-"), col("i").cast("string")))
      .orderBy(col("p_partkey"), col("i"))
  }

  // ------------------------------------------------------ round 13
  // CDC latest-wins upsert compaction: current state of each user
  // from the append-only event log. The engine path is a hash
  // AGGREGATE (max over a version-ordered struct, map-side
  // combinable) — never a row_number window over the corpus; the
  // oracle states the same semantics as the window, proving the
  // aggregate formulation is result-identical.
  q("q132_upsert_latest",
    """SELECT user_id, epoch_ms(ts) AS last_ts_ms,
      |  event_type AS last_type, value AS last_value
      |FROM events
      |QUALIFY row_number() OVER (
      |  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    graft.operators.Cdc.latestWins(Tables.events(s, d),
        keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
        payloadCols = Seq("event_type", "value"))
      .select(col("user_id"), unix_millis(col("ts")).as("last_ts_ms"),
        col("event_type").as("last_type"), col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  // SCD-type-2 history build: collapse consecutive equal event_types
  // per user, emit (valid_from, valid_to, ver) intervals. One key
  // shuffle total — the change-filter lag and the interval lead /
  // version row_number share a single (partition, sort) — asserted in
  // CdcSpec.
  q("q133_scd2_merge",
    """WITH o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER w AS prev,
      |    row_number() OVER w AS rn
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |c AS (SELECT user_id, event_type, ts, event_id FROM o
      |      WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
      |v AS (SELECT user_id, event_type,
      |        epoch_ms(ts) AS valid_from_ms,
      |        epoch_ms(lead(ts) OVER w) AS valid_to_ms,
      |        row_number() OVER w AS ver
      |      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, ver, event_type, valid_from_ms, valid_to_ms FROM v
      |ORDER BY user_id, ver""".stripMargin) { (s, d) =>
    graft.operators.Cdc.scd2(Tables.events(s, d),
        keyCols = Seq("user_id"), attrCols = Seq("event_type"),
        tsCol = "ts", tieCols = Seq("event_id"))
      .select(col("user_id"), col("ver"), col("event_type"),
        unix_millis(col("valid_from")).as("valid_from_ms"),
        unix_millis(col("valid_to")).as("valid_to_ms"))
      .orderBy(col("user_id"), col("ver"))
  }

  // GROUPING SETS — the general form of q06's rollup/cube (R-6):
  // arbitrary group combinations in ONE pass (Spark expands to a
  // single Expand + hash aggregate, not a union of scans). grouping()
  // flags disambiguate real NULL group values from the superaggregate
  // rows portably.
  q("q136_grouping_sets",
    s"""SELECT l_returnflag, l_linestatus,
       |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
       |  count(*) AS n, ${sqlRound("sum(l_quantity)", 2)} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
       |  (l_returnflag), (l_linestatus), ())
       |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST,
       |  l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("v_li_136")
    s.sql(s"""SELECT l_returnflag, l_linestatus,
      |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
      |  count(*) AS n,
      |  floor(sum(l_quantity) * 1e2 + 0.5) / 1e2 AS sum_qty
      |FROM v_li_136
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST,
      |  l_linestatus NULLS FIRST""".stripMargin)
  }

  // Batch sessionization (gap = 6h): the batch complement of q40's
  // streaming session window. One key shuffle carries the gap lag,
  // the running session counter, and the per-session aggregate
  // (BehaviorSpec asserts the single exchange).
  // Oracle portability: the named WINDOW clause is inlined (its
  // binding rules have shifted across DuckDB releases) and the
  // running sum(ns) — DuckDB HUGEINT for integer input, whose Arrow
  // conversion is version-dependent — is CAST to BIGINT before it
  // reaches the compare. ORDER BY (user_id, sess) is the grouping
  // key, hence total.
  q("q138_sessionize",
    """WITH o AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id
      |             ORDER BY ts, event_id) IS NULL
      |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (
      |             PARTITION BY user_id ORDER BY ts, event_id)) > 21600000
      |         THEN 1 ELSE 0 END AS ns
      |  FROM events),
      |s AS (SELECT user_id, ts, CAST(sum(ns) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
      |      FROM o)
      |SELECT user_id, sess, count(*) AS n_events,
      |  min(epoch_ms(ts)) AS start_ms, max(epoch_ms(ts)) AS end_ms,
      |  max(epoch_ms(ts)) - min(epoch_ms(ts)) AS dur_ms
      |FROM s GROUP BY user_id, sess
      |ORDER BY user_id, sess""".stripMargin) { (s, d) =>
    graft.operators.Behavior.sessionize(Tables.events(s, d),
        "user_id", "ts", "event_id", gapMs = 21600000L)
      .orderBy(col("user_id"), col("sess"))
  }

  // Declarative data-quality audit (Deequ shape): null / range rules
  // fold into ONE lineitem scan (single aggregate node, AuditSpec
  // plan-asserts it), uniqueness is a key-space aggregate, FK checks
  // anti-join DISTINCT key frames. Constant-sized report.
  q("q142_data_audit",
    """SELECT 'not_null:l_orderkey' AS chk, count(*) AS checked,
      |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS violations FROM lineitem
      |UNION ALL
      |SELECT 'not_null:l_partkey', count(*),
      |  CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'range:l_discount', count(*),
      |  CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5
      |    THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |UNION ALL
      |SELECT 'range:l_quantity', count(*),
      |  CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'unique:o_orderkey', CAST(sum(c) AS BIGINT),
      |  CAST(sum(c - 1) AS BIGINT)
      |FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1)
      |UNION ALL
      |SELECT 'fk:lineitem->orders',
      |  (SELECT count(DISTINCT l_orderkey) FROM lineitem
      |   WHERE l_orderkey IS NOT NULL),
      |  (SELECT count(*) FROM
      |    (SELECT DISTINCT l_orderkey FROM lineitem
      |     WHERE l_orderkey IS NOT NULL) c
      |    LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) p
      |    ON l_orderkey = o_orderkey WHERE o_orderkey IS NULL)
      |UNION ALL
      |SELECT 'fk:lineitem->part',
      |  (SELECT count(DISTINCT l_partkey) FROM lineitem
      |   WHERE l_partkey IS NOT NULL),
      |  (SELECT count(*) FROM
      |    (SELECT DISTINCT l_partkey FROM lineitem
      |     WHERE l_partkey IS NOT NULL) c
      |    LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
      |    ON l_partkey = p_partkey WHERE p_partkey IS NULL)
      |ORDER BY chk""".stripMargin) { (s, d) =>
    import graft.operators.Audit
    val li = Tables.lineitem(s, d)
    Audit.report(Seq(
      Audit.scanChecks(li, Seq(
        Audit.Rule("not_null:l_orderkey", col("l_orderkey").isNull),
        Audit.Rule("not_null:l_partkey", col("l_partkey").isNull),
        Audit.Rule("range:l_discount",
          col("l_discount") < 0 || col("l_discount") > 0.5),
        Audit.Rule("range:l_quantity", col("l_quantity") <= 0))),
      Audit.unique(Tables.orders(s, d), Seq("o_orderkey")),
      Audit.foreignKey(li, "l_orderkey",
        Tables.orders(s, d), "o_orderkey", "lineitem->orders"),
      Audit.foreignKey(li, "l_partkey",
        Tables.part(s, d), "p_partkey", "lineitem->part")))
      .orderBy(col("chk"))
  }

  // Point-in-time (temporal) join — the feature-store lookup over the
  // q133 SCD2 history: each purchase event reads the dimension
  // version valid AT ITS TIMESTAMP (no leakage from later versions).
  // Engine path: AsOfJoin.floorJoin on valid_from — one key shuffle,
  // never an interval-predicate row join; same-ts versions resolve to
  // the highest ver (payload leads with ver), exactly the zero-width-
  // interval semantics the oracle's BETWEEN predicate produces.
  q("q143_pit_join",
    """WITH src AS (SELECT user_id, event_type, ts, event_id FROM events
      |             WHERE event_type <> 'purchase'),
      |o AS (SELECT user_id, event_type, ts, event_id,
      |        lag(event_type) OVER w AS prev,
      |        row_number() OVER w AS rn
      |      FROM src
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |c AS (SELECT user_id, event_type, ts, event_id FROM o
      |      WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
      |v AS (SELECT user_id, event_type, ts AS valid_from,
      |        lead(ts) OVER w AS valid_to, row_number() OVER w AS ver
      |      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (SELECT event_id, user_id, ts FROM events
      |      WHERE event_type = 'purchase')
      |SELECT f.event_id, f.user_id, epoch_ms(f.ts) AS ts_ms,
      |  v.event_type AS state, v.ver
      |FROM f LEFT JOIN v ON v.user_id = f.user_id
      |  AND v.valid_from <= f.ts
      |  AND (v.valid_to IS NULL OR f.ts < v.valid_to)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val dim = graft.operators.Cdc.scd2(
      ev.filter(col("event_type") =!= "purchase"),
      keyCols = Seq("user_id"), attrCols = Seq("event_type"),
      tsCol = "ts", tieCols = Seq("event_id"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.AsOfJoin.floorJoin(facts, dim,
        keys = Seq("user_id"), probeTs = "ts", buildTs = "valid_from",
        payload = Seq("ver", "event_type"))
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        col("event_type").as("state"), col("ver"))
      .orderBy(col("event_id"))
  }

  // Golden-record survivorship merge (MDM "most recent non-null wins,
  // per field"): each field independently takes the latest record
  // where it was present — one combinable hash aggregate for ALL
  // fields, never per-field windows. The oracle states each field as
  // its own latest-non-null window, proving the single-aggregate
  // formulation matches.
  q("q144_golden_record",
    """WITH b AS (SELECT user_id, value AS big, ts, event_id FROM events
      |           WHERE value >= 50),
      |g1 AS (SELECT user_id, big FROM (
      |        SELECT user_id, big, row_number() OVER (
      |          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM b) WHERE rn = 1),
      |g2 AS (SELECT user_id, event_type AS etype FROM events
      |       WHERE event_type IS NOT NULL
      |       QUALIFY row_number() OVER (
      |         PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1),
      |n AS (SELECT user_id, count(*) AS n_records FROM events GROUP BY 1)
      |SELECT n.user_id, n.n_records, g1.big AS big_value, g2.etype
      |FROM n LEFT JOIN g1 USING (user_id) LEFT JOIN g2 USING (user_id)
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    graft.operators.Cdc.goldenRecord(
        Tables.events(s, d).withColumn("big_value",
          when(col("value") >= 50, col("value"))),
        keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
        fieldCols = Seq("big_value", "event_type"))
      .select(col("user_id"), col("n_records"), col("big_value"),
        col("event_type").as("etype"))
      .orderBy(col("user_id"))
  }

  // OHLC candlestick downsampling: per (user, hour) the first / max /
  // min / last value under the total (ts, event_id) order — ONE
  // combinable aggregate (open/close ride min/max over ordered
  // structs); never a per-key window. The time-series reduction step
  // every metrics pipeline runs before storage.
  q("q149_ohlc_downsample",
    """WITH h AS (SELECT user_id, date_trunc('hour', ts) AS hr, ts,
      |             event_id, value FROM events),
      |w AS (SELECT *,
      |        row_number() OVER (PARTITION BY user_id, hr
      |          ORDER BY ts, event_id) AS rn_a,
      |        row_number() OVER (PARTITION BY user_id, hr
      |          ORDER BY ts DESC, event_id DESC) AS rn_d
      |      FROM h)
      |SELECT user_id, epoch_ms(hr) AS hr_ms, count(*) AS n,
      |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
      |  max(value) AS high, min(value) AS low,
      |  max(CASE WHEN rn_d = 1 THEN value END) AS close
      |FROM w GROUP BY user_id, hr
      |ORDER BY user_id, hr_ms""".stripMargin) { (s, d) =>
    graft.operators.TimeSeries.ohlcDownsample(Tables.events(s, d),
        "user_id", "ts", "event_id", "value", unit = "hour")
      .select(col("user_id"), unix_millis(col("bucket")).as("hr_ms"),
        col("n"), col("open"), col("high"), col("low"), col("close"))
      .orderBy(col("user_id"), col("hr_ms"))
  }

  // Regular-grid resampling with forward fill (pandas
  // resample().ffill()): one row per (user, hour) across each user's
  // observed span, carrying the last value at-or-before the grid
  // point. The fill is the as-of floor machinery — one key shuffle,
  // never a per-grid-point lookup (the oracle's LATERAL states that
  // lookup declaratively).
  q("q150_resample_ffill",
    """WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS lo,
      |             date_trunc('hour', max(ts)) AS hi
      |           FROM events GROUP BY 1),
      |g AS (SELECT user_id,
      |        unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      |      FROM b)
      |SELECT g.user_id, epoch_ms(g.hr) AS hr_ms, l.value
      |FROM g LEFT JOIN LATERAL (
      |  SELECT value FROM events e
      |  WHERE e.user_id = g.user_id AND e.ts <= g.hr
      |  ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) l ON true
      |ORDER BY user_id, hr_ms""".stripMargin) { (s, d) =>
    graft.operators.TimeSeries.resampleFfill(Tables.events(s, d),
        "user_id", "ts", "event_id", "value",
        unit = "hour", stepExpr = "interval 1 hour")
      .select(col("user_id"), unix_millis(col("grid_ts")).as("hr_ms"),
        col("value"))
      .orderBy(col("user_id"), col("hr_ms"))
  }

  // Sliding 7-day distinct active users per day: collapse to the
  // (day, user) frame, explode each observation into the 7 window
  // ends it serves, one count-distinct per window day — shuffle =
  // 7 x |user-days|, the exact formulation's floor (the HLL register
  // merge is the constant-state alternative, spec'd equivalent within
  // the q114 envelope).
  q("q151_sliding_distinct",
    """WITH ud AS (SELECT DISTINCT
      |    CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS d, user_id
      |  FROM events),
      |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
      |e AS (SELECT d + i AS win_day, user_id FROM ud
      |      CROSS JOIN (SELECT unnest(range(0, 7)) AS i))
      |SELECT win_day, count(DISTINCT user_id) AS n_keys
      |FROM e, b WHERE win_day BETWEEN lo AND hi
      |GROUP BY win_day ORDER BY win_day""".stripMargin) { (s, d) =>
    graft.operators.Behavior.slidingDistinct(Tables.events(s, d),
        "user_id", "ts", windowDays = 7)
      .orderBy(col("win_day"))
  }

  // First-order Markov transition matrix over per-user event
  // sequences — the behavior-model complement of q124's funnel: one
  // key shuffle for the lead window, then state-space-sized
  // aggregates (|types|^2) with broadcast row normalization.
  q("q158_markov_transitions",
    """WITH t AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |c AS (SELECT from_type, to_type, count(*) AS n FROM t
      |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, n,
      |  floor(n / CAST(tot AS DOUBLE) * 1e6 + 0.5)/1e6 AS p6
      |FROM c JOIN tot USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin) { (s, d) =>
    graft.operators.Behavior.markovTransitions(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type")
      .orderBy(col("from_type"), col("to_type"))
  }

  // Distribution window functions — percent_rank / cume_dist join
  // q15's rank/dense_rank/ntile to complete the R-14 family. Both are exact rational
  // arithmetic over integer ranks ((rank−1)/(n−1), running/n), so 6dp
  // staging is presentation only.
  q("q160_window_distribution",
    s"""SELECT o_orderkey, o_custkey,
       |  ${sqlRound("percent_rank() OVER w", 6)} AS prk,
       |  ${sqlRound("cume_dist() OVER w", 6)} AS cd
       |FROM orders
       |WINDOW w AS (PARTITION BY o_custkey
       |             ORDER BY o_totalprice, o_orderkey)
       |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        pround(percent_rank().over(w), 6).as("prk"),
        pround(cume_dist().over(w), 6).as("cd"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // UNPIVOT/melt — the inverse of q28's pivot (R-30): wide measure
  // columns to long (key, metric, val) form. Spark plans ONE Expand
  // over a single scan (the oracle states the same relation as a
  // UNION ALL of per-measure projections — 3 logical scans that the
  // engine's Expand collapses to one, plan-asserted).
  q("q154_unpivot",
    """SELECT l_orderkey, l_linenumber, 'l_discount' AS metric,
      |  l_discount AS val FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      |FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_quantity', l_quantity
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_discount"), col("l_extendedprice"),
          col("l_quantity")),
        variableColumnName = "metric",
        valueColumnName = "val")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
  }
}
