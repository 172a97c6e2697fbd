package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Similarity search over embedding columns (SURVEY §2B R-20).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k; O(probes × corpus). The
  *     correctness baseline; at 100 TB only viable for small probe
  *     sets with a broadcast probe side.
  *   - [[signBucketTopK]]: LSH-bucketed ANN — probe only compares
  *     against corpus vectors in its sign-bit bucket; the bucket join
  *     is an equi-join, so the work is corpus/2^bits per probe instead
  *     of the full corpus.
  *
  * Cosine values are rounded to 6 decimals BEFORE ranking so that
  * neighbor order is deterministic across engines (1e-16 dot-product
  * noise must not flip ranks); ties break on neighbor id.
  */
object Similarity {

  private def ranked(
      pairs: DataFrame,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    pairs
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }

  /** Cosine rounded to 6 decimals, portable formulation. */
  private def cos6(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val c = VectorFns.cosine(VectorFns.toDoubleArray(a), VectorFns.toDoubleArray(b))
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
  }

  /** Exact top-k neighbors of each probe within the corpus. */
  def bruteForceTopK(
      probes: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    // probe side is small by contract — broadcast it so the corpus
    // scan streams once with no shuffle.
    val pairs = c.crossJoin(broadcast(p))
      .select(col("probe_id"), col("neighbor_id"),
        cos6(col("pv"), col("cv")).as("cos"))
    ranked(pairs, k)
  }

  /** ANN: compare only within equal sign-bit buckets of the first
    * `bits` dimensions. Probes whose bucket has no corpus vector get
    * no rows (documented recall/latency tradeoff).
    */
  def signBucketTopK(
      probes: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int,
      k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"),
      VectorFns.signBucket(col(vecCol), bits).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorFns.signBucket(col(vecCol), bits).as("bucket"))
    val pairs = c.join(broadcast(p), "bucket")
      .select(col("probe_id"), col("neighbor_id"),
        cos6(col("pv"), col("cv")).as("cos"))
    ranked(pairs, k)
  }
}
