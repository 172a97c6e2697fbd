package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator surface (SURVEY §2B R-1…R-15).
  *
  * Each query is the declarative DataFrame formulation — Catalyst gets
  * predicate pushdown, column pruning, partial aggregation, and join
  * strategy selection for free. Broadcast hints are added only where a
  * dimension is guaranteed tiny at any scale factor (region/nation).
  */
object RelationalQueries extends QueryGroup {

  // ------------------------------------------------------- R-1 / R-2
  // Scan + projection with a computed column. Catalyst prunes the scan
  // to the referenced columns (ReadSchema in explain).
  q("q01_scan_project",
    s"""SELECT l_orderkey, l_linenumber,
       |  ${sqlRound("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 2)} AS net_charge,
       |  l_quantity
       |FROM lineitem
       |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        pround(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")), 2).as("net_charge"),
        col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  // ---------------------------------------------------------------- R-3
  // Filter predicate zoo: NOT-contains (the reference's "-partition"
  // topic filter, PulsarTopicSyncManager.java:72-74), IN, BETWEEN,
  // LIKE. All push down to the parquet scan.
  q("q02_filter_predicates",
    """SELECT p_partkey, p_brand, p_size
      |FROM part
      |WHERE p_type NOT LIKE '%BRASS%'
      |  AND p_size IN (1, 5, 10, 15, 20)
      |  AND p_retailprice BETWEEN 900 AND 1800
      |  AND p_name LIKE '%s%'
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(!col("p_type").contains("BRASS")
        && col("p_size").isin(1, 5, 10, 15, 20)
        && col("p_retailprice").between(900, 1800)
        && col("p_name").like("%s%"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  // ---------------------------------------------------------------- R-4
  // TPC-H Q1 shape: scan → filter → hash aggregate. Partial aggregation
  // (map-side combine) means the shuffle carries one row per group per
  // task — scale-safe at 100 TB.
  q("q03_agg_q1",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlRound("sum(l_quantity)", 2)}                                       AS sum_qty,
       |  ${sqlRound("sum(l_extendedprice)", 2)}                                  AS sum_base_price,
       |  ${sqlRound("sum(l_extendedprice * (1 - l_discount))", 2)}               AS sum_disc_price,
       |  ${sqlRound("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))", 2)} AS sum_charge,
       |  ${sqlRound("avg(l_quantity)", 4)}                                       AS avg_qty,
       |  ${sqlRound("avg(l_extendedprice)", 4)}                                  AS avg_price,
       |  ${sqlRound("avg(l_discount)", 6)}                                       AS avg_disc,
       |  count(*)                                                                AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        pround(sum(col("l_quantity")), 2).as("sum_qty"),
        pround(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        pround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        pround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        pround(avg(col("l_quantity")), 4).as("avg_qty"),
        pround(avg(col("l_extendedprice")), 4).as("avg_price"),
        pround(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // ---------------------------------------------------------------- R-5
  q("q04_count_distinct",
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))
  }

  // R-5 approx: the raw HLL estimates differ between engines, so the
  // oracle-checked columns are the group keys, the exact counts, and a
  // BOUND on the sketch — `approx_ok` = the engine's own approximate
  // distinct count lands within 10% of its exact count (HLL++ at
  // default precision is well inside 2%, so both engines agree the
  // bound holds). The raw estimate itself stays ScalaTest-covered.
  q("q05_approx_distinct",
    """SELECT event_type, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  (abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
      |     <= 0.1 * count(DISTINCT user_id)) AS approx_ok
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        (abs(approx_count_distinct(col("user_id")) - countDistinct(col("user_id")))
          <= countDistinct(col("user_id")) * lit(0.1)).as("approx_ok"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- R-6
  q("q06_rollup",
    s"""SELECT r_name, n_name, grouping(r_name, n_name) AS gid,
       |  count(*) AS n_cust, ${sqlRound("sum(c_acctbal)", 2)} AS acctbal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP(r_name, n_name)
       |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_cust"),
        pround(sum(col("c_acctbal")), 2).as("acctbal"))
      .select(col("r_name"), col("n_name"), col("gid"), col("n_cust"), col("acctbal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  // ---------------------------------------------------------------- R-7
  // 4-way star join. nation/region are tiny dims → broadcast (no
  // shuffle of the fact side for those joins); lineitem⋈orders is the
  // only big shuffle, and AQE can still convert it when orders fits.
  q("q07_join_star",
    s"""SELECT r_name, n_name,
       |  ${sqlRound("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY revenue DESC, n_name
       |LIMIT 10""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(pround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
      .limit(10)
  }

  // ---------------------------------------------------------------- R-8
  q("q08_left_outer",
    s"""SELECT c_custkey, count(o_orderkey) AS n_orders,
       |  ${sqlRound("coalesce(sum(o_totalprice), 0)", 2)} AS spend
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey
       |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        pround(coalesce(sum(col("o_totalprice")), lit(0)), 2).as("spend"))
      .orderBy(col("c_custkey"))
  }

  q("q09_full_outer",
    """WITH sn AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey),
      |     cn AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey)
      |SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
      |  coalesce(n_supp, 0) AS n_supp, coalesce(n_cust, 0) AS n_cust
      |FROM sn FULL OUTER JOIN cn ON s_nationkey = c_nationkey
      |ORDER BY nationkey""".stripMargin) { (s, d) =>
    val sn = Tables.supplier(s, d).groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    val cn = Tables.customer(s, d).groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    sn.join(cn, col("s_nationkey") === col("c_nationkey"), "full")
      .select(coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
        coalesce(col("n_supp"), lit(0)).as("n_supp"),
        coalesce(col("n_cust"), lit(0)).as("n_cust"))
      .orderBy(col("nationkey"))
  }

  // ---------------------------------------------------------------- R-9
  // The reference's create-if-absent merge (src ∖ dst, SURVEY §2A
  // A3/A6/A9/A12) as semi/anti joins.
  q("q10_semi_anti",
    """SELECT c_custkey, 'has_order' AS status FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT c_custkey, 'no_order' AS status FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_order").as("status"))
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_order").as("status"))
    semi.unionAll(anti).orderBy(col("c_custkey"))
  }

  // --------------------------------------------------------------- R-10
  // Range join: equi on user_id + time-band predicate. At scale this
  // stays an equi-shuffle on user_id with the band as a post-filter —
  // no cartesian blowup.
  q("q11_range_join",
    """SELECT e1.event_id AS event_id, count(*) AS n_follow
      |FROM events e1 JOIN events e2
      |  ON e1.user_id = e2.user_id
      | AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
      |GROUP BY e1.event_id
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val e1 = Tables.events(s, d).alias("e1")
    val e2 = Tables.events(s, d).alias("e2")
    e1.join(e2,
        col("e1.user_id") === col("e2.user_id")
          && col("e2.ts") > col("e1.ts")
          && col("e2.ts") <= col("e1.ts") + expr("INTERVAL 5 MINUTE"))
      .groupBy(col("e1.event_id"))
      .agg(count(lit(1)).as("n_follow"))
      .select(col("event_id"), col("n_follow"))
      .orderBy(col("event_id"))
  }

  // --------------------------------------------------------------- R-11
  q("q12_cross_join",
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))
  }

  // --------------------------------------------------------------- R-12
  q("q13_sort_nulls",
    s"""SELECT o_orderkey,
       |  ${sqlRound("CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END", 2)} AS tp
       |FROM orders
       |ORDER BY tp DESC NULLS LAST, o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        pround(when(col("o_orderstatus") === "O", lit(null))
          .otherwise(col("o_totalprice")), 2).as("tp"))
      .orderBy(col("tp").desc_nulls_last, col("o_orderkey"))
  }

  // --------------------------------------------------------------- R-13
  // Planner turns orderBy().limit() into TakeOrderedAndProject — no
  // global sort, each partition keeps 10 rows.
  q("q14_topk",
    s"""SELECT o_custkey, ${sqlRound("sum(o_totalprice)", 2)} AS revenue
       |FROM orders GROUP BY o_custkey
       |ORDER BY revenue DESC, o_custkey LIMIT 10""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(pround(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(10)
  }

  // --------------------------------------------------------------- R-14
  q("q15_window_rank",
    """SELECT o_orderkey, o_custkey,
      |  row_number() OVER w1 AS rn,
      |  ntile(4)     OVER w1 AS quartile,
      |  rank()       OVER w2 AS rnk,
      |  dense_rank() OVER w2 AS drnk
      |FROM orders
      |WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
      |       w2 AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val w1 = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val w2 = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderpriority"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        row_number().over(w1).as("rn"),
        ntile(4).over(w1).as("quartile"),
        rank().over(w2).as("rnk"),
        dense_rank().over(w2).as("drnk"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  // --------------------------------------------------------------- R-15
  // lag/lead/first + running-sum rows frame + a 30-day range frame
  // over epoch seconds (the portable formulation of an interval range
  // frame; mirrors the reference's keep-last-within-window semantics,
  // SparseMap.java:46-50).
  q("q16_window_analytic",
    s"""SELECT o_orderkey, o_custkey,
       |  ${sqlRound("lag(o_totalprice)  OVER w", 2)} AS prev_price,
       |  ${sqlRound("lead(o_totalprice) OVER w", 2)} AS next_price,
       |  ${sqlRound("first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 2)} AS first_price,
       |  ${sqlRound("sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 2)} AS running,
       |  ${sqlRound("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)::BIGINT RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)", 2)} AS sum_30d
       |FROM orders
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
       |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRange = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_seconds(col("o_orderdate").cast("timestamp")))
      .rangeBetween(-2592000L, 0L)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        pround(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
        pround(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
        pround(first(col("o_totalprice")).over(wRun), 2).as("first_price"),
        pround(sum(col("o_totalprice")).over(wRun), 2).as("running"),
        pround(sum(col("o_totalprice")).over(wRange), 2).as("sum_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }
}
