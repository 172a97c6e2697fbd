package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path utilities (SURVEY "optimize for scale" / BASELINE north
  * star): bucketed co-located joins and skew salting. Test-scale data
  * never *needs* these — they exist so the 100 TB deployment shape is
  * code, not a comment, and their plan effects are asserted in
  * ScaleOpsSpec.
  */
object ScaleOps {

  /** Persist a table bucketed+sorted on its join key. Two tables
    * bucketed the same way join with ZERO shuffle (the scan satisfies
    * the hash-partitioning requirement) — at 100 TB this is the
    * difference between an exchange of the full fact table per join
    * and none. Requires a catalog table (saveAsTable), not a bare
    * parquet path: bucketing metadata lives in the catalog.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Equi-join two same-bucketed catalog tables (helper so callers
    * keep the co-location contract in one place).
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Skew-salted inner equi-join: the big (skewed) side gets a random
    * salt in [0, salts); the small side is replicated `salts` times;
    * the join key becomes (key, salt), spreading a hot key over
    * `salts` reducers. Correctness: every big-side row matches exactly
    * the one replica with its salt, so the result multiset equals the
    * unsalted join (asserted in ScaleOpsSpec). AQE's skew-join
    * handling covers sort-merge cases adaptively; explicit salting is
    * for aggregations-after-join and deterministic plans.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted two-phase aggregation for skewed group keys: pre-aggregate
    * on (key, salt), then final-aggregate on key. For algebraic
    * aggregates (sum/count/min/max) the result is identical to a
    * direct groupBy; the hot key's partial work spreads over `salts`
    * tasks. (Catalyst's partial aggregation already does this for the
    * map side; explicit salting helps when the *reduce* side is the
    * hot spot, e.g. high-cardinality payloads per group.)
    */
  def saltedSumAgg(
      df: DataFrame,
      key: String,
      valueCol: String,
      salts: Int): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
}
