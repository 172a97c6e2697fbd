package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All engine queries read through here so that scan options (and, at
  * cluster scale, things like bucketing metadata) live in one place.
  * Filters/projections applied by callers are pushed into the parquet
  * scan by Catalyst (verify with `.explain("formatted")` →
  * `PushedFilters`, `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Canonical loader: dispatches to the per-table loaders so schema
    * fixes (the events ns-timestamp conversion) apply no matter how a
    * table is reached.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _ => rawLoad(spark, dir, name)
    }

  private def rawLoad(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` normalization — the fixture's physical type has
    * varied across driver revisions, so dispatch on what's actually
    * there; downstream operators always see a session-TZ TIMESTAMP:
    *
    *   - nanosecond-precision int64 (readable only with
    *     `spark.sql.legacy.parquet.nanosAsLong=true`, which
    *     Verify/Bench/test sessions set): truncated to a microsecond
    *     TIMESTAMP;
    *   - microsecond `isAdjustedToUTC=false` (Spark reads it as
    *     TIMESTAMP_NTZ): cast to TIMESTAMP — sessions pin UTC, so the
    *     naive wall time is interpreted as the same instant DuckDB's
    *     naive-timestamp `epoch_ms` computes.
    *
    * Oracle-compared outputs must still go through `unix_millis`
    * (= DuckDB `epoch_ms`) — millis is the precision both engines
    * floor to identically regardless of the fixture's physical unit.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = rawLoad(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
