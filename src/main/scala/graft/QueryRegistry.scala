package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named engine query plus (optionally) its DuckDB oracle SQL.
  *
  * Conventions enforced across all groups (see FIXTURES.md
  * "canonicalization"):
  *   - every query output is made deterministic with an ORDER BY over a
  *     unique key prefix, in both the Spark plan and the oracle SQL;
  *   - doubles are rounded with [[QueryGroup.pround]] /
  *     [[QueryGroup.sqlRound]] — `floor(x*10^d + 0.5)/10^d`, which is
  *     bit-identical IEEE arithmetic in Spark and DuckDB (their native
  *     `round()` half-way behaviors differ: BigDecimal HALF_UP vs C
  *     library rounding);
  *   - `events.ts` outputs go through `unix_millis` / DuckDB `epoch_ms`
  *     (ns-precision parquet, see [[Tables.events]]);
  *   - aggregate/computed columns are aliased identically in the
  *     DataFrame code and the SQL (the driver compares by column name).
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

abstract class QueryGroup {
  private val defs = scala.collection.mutable.ArrayBuffer.empty[QDef]

  protected def q(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Unit =
    defs += QDef(name, fn, Some(oracle))

  protected def qNoOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): Unit =
    defs += QDef(name, fn, None)

  def all: Seq[QDef] = defs.toSeq

  /** Portable rounding, identical in Spark and DuckDB (see class doc). */
  protected def pround(c: Column, digits: Int): Column = {
    val s = math.pow(10, digits)
    floor(c * lit(s) + lit(0.5)) / lit(s)
  }

  /** SQL-text twin of [[pround]] for oracle queries. Exponent literals
    * (`1e2`) parse as DOUBLE in both Spark SQL and DuckDB; `100.0`
    * would be DECIMAL in Spark's parser and poison the result type
    * when the same text runs on both engines (q45).
    */
  protected def sqlRound(e: String, digits: Int): String =
    s"floor(($e)*1e$digits + 0.5)/1e$digits"
}

object Queries {
  private def groups: Seq[QueryGroup] =
    Seq(RelationalQueries, ExtendedQueries, PipelineQueries,
      PipelineSketchQueries, PipelineAnalyticsQueries, StreamingQueries)

  lazy val defs: Seq[QDef] = groups.flatMap(_.all)

  lazy val all: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  lazy val oracle: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Register every TESTDATA table as a temp view (used by tests).
    * Goes through [[Tables.load]]'s canonical loaders so `events.ts`
    * is the converted TIMESTAMP, not raw long nanos.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach(n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n))
}
