package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named engine query plus (optionally) its DuckDB oracle SQL.
  *
  * Conventions enforced here (see FIXTURES.md "canonicalization"):
  *   - every query output is made deterministic with an ORDER BY over a
  *     unique key prefix (both in the Spark plan and the oracle SQL);
  *   - doubles are rounded before output (addition order differs
  *     between engines);
  *   - `events.ts` is nanosecond-precision parquet which Spark reads as
  *     microseconds — event timestamps are therefore emitted as epoch
  *     milliseconds (`unix_millis` / DuckDB `epoch_ms`) so both engines
  *     agree;
  *   - aggregate/computed column names are aliased identically in the
  *     DataFrame code and the SQL (the driver compares by column name).
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {

  private val defs = scala.collection.mutable.ArrayBuffer.empty[QDef]

  private def q(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Unit =
    defs += QDef(name, fn, Some(oracle))

  private def qNoOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): Unit =
    defs += QDef(name, fn, None)

  // ---------------------------------------------------------------- R-4
  // TPC-H Q1 shape: scan → filter → hash aggregate (partial+final by
  // Catalyst, map-side combine means the shuffle carries one row per
  // (flag, status) per task — scale-safe at 100 TB).
  q("q03_agg_q1",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2)                                        AS sum_qty,
      |  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
      |  round(avg(l_quantity), 4)                                        AS avg_qty,
      |  round(avg(l_extendedprice), 4)                                   AS avg_price,
      |  round(avg(l_discount), 6)                                        AS avg_disc,
      |  count(*)                                                         AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // ---------------------------------------------------------------- R-7
  // 4-way star join. nation/region are tiny dims → broadcast (no
  // shuffle of the fact side for those joins); lineitem⋈orders is the
  // only big shuffle and AQE may still convert it when orders fits.
  q("q07_join_star",
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
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
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
      .limit(10)
  }

  // ------------------------------------------------------------ exports
  lazy val all: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  lazy val oracle: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Register every TESTDATA table as a temp view (used by tests). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach(n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n))
}
