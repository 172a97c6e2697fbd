package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns using Spark's
  * higher-order functions — everything stays inside whole-stage
  * codegen (no UDFs, SURVEY §2B R-20/R-25 decision).
  *
  * All ops widen to double first: float arithmetic would accumulate
  * error differently than the DuckDB oracle.
  */
object VectorFns {

  /** `array<float>` → `array<double>`. */
  def toDoubleArray(v: Column): Column = transform(v, _.cast("double"))

  /** Left-to-right dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (computes norms inline; pre-normalize + plain
    * dot when calling in a loop at scale).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalize a double array. */
  def normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x / n)
  }

  /** Sign-bit bucket key over the first `bits` dimensions — the
    * deterministic LSH partitioning used by the bucketed ANN path
    * (hyperplanes = coordinate axes, so the oracle can reproduce it).
    */
  def signBucket(v: Column, bits: Int): Column =
    concat_ws("", transform(slice(v, 1, bits),
      x => when(x >= 0, lit("1")).otherwise(lit("0"))))

  /** Sign-bit bucket over dimensions [offset+1 .. offset+bits]
    * (1-based) — one hash table of the multi-table LSH family; table t
    * uses offset = t*bits, so the L tables read DISJOINT dimension
    * slices and a near-neighbor missed by one table (a flipped sign in
    * its slice) is still caught by any table whose slice survived.
    */
  def signBucketAt(v: Column, offset: Column, bits: Int): Column =
    concat_ws("", transform(slice(v, offset + lit(1), lit(bits)),
      x => when(x >= 0, lit("1")).otherwise(lit("0"))))

  /** Symmetric int8 quantization scale: max|x| / 127, in double
    * (float→double widening and the division are IEEE-exact, so the
    * DuckDB oracle reproduces the scale bit-for-bit).
    */
  def int8Scale(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))) /
      lit(127.0)

  /** Quantize to int8 codes with `floor(x/scale + 0.5)` (half-up —
    * identical IEEE arithmetic in Spark and DuckDB, unlike each
    * engine's native round); an all-zero vector (scale 0) quantizes
    * to zeros. Storage drops 4x (float32 → int8) — the standard
    * embedding-store compression step of a training-data pipeline;
    * dequantized error is bounded by scale/2 per component
    * (asserted in MultimodalUdfSpec).
    */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0))
        .otherwise(floor(x.cast("double") / scale + lit(0.5)).cast("int")))
}
