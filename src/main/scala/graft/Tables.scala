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
  /** `events.ts` is nanosecond-precision parquet, which Spark can only
    * read with `spark.sql.legacy.parquet.nanosAsLong=true` (sessions in
    * Verify/Bench/tests set it). The long nanos are converted here to a
    * microsecond TIMESTAMP so downstream operators see a real timestamp
    * column; oracle-compared outputs must use `unix_millis` (= DuckDB
    * `epoch_ms`) since DuckDB keeps the nanos.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = rawLoad(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
