package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.Tables

/** The codegen'd double-array loop expressions (vec_dot_d,
  * vec_sqdist_d, vec_cdot_d) must be BIT-identical to the
  * element_at term chains they replaced in Coreset/Spectral (the
  * q162-drift fix trades per-job codegen cost, not numerics), and
  * null-safe / min-length like FloatVecDot.
  */
class VecDistExprsSpec extends SparkSuiteBase {

  private def chainDot(v: org.apache.spark.sql.Column,
      c: Array[Double]): org.apache.spark.sql.Column =
    c.indices.map(i => element_at(v, i + 1).cast("double") * lit(c(i)))
      .reduceLeft(_ + _)

  private def chainSq(v: org.apache.spark.sql.Column,
      c: Array[Double]): org.apache.spark.sql.Column =
    c.indices.map { i =>
      val d = element_at(v, i + 1).cast("double") - lit(c(i))
      d * d
    }.reduceLeft(_ + _)

  private def chainCdot(v: org.apache.spark.sql.Column, mu: Array[Double],
      w: Array[Double]): org.apache.spark.sql.Column =
    mu.indices.map(i =>
      (element_at(v, i + 1).cast("double") - lit(mu(i))) * lit(w(i)))
      .reduceLeft(_ + _)

  test("loop expressions are bit-identical to the literal term chains") {
    val e = Tables.embeddings(spark, sfDir).limit(200)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probe = e.where(col("vec_id") === 3).head().getSeq[Double](1).toArray
    val mu = probe.map(_ * 0.25)
    val diffs = e.select(
        abs(VecDistExprs.vecDotD(spark, col("v"), lit(probe)) -
          chainDot(col("v"), probe)).as("d1"),
        abs(VecDistExprs.vecSqDistD(spark, col("v"), lit(probe)) -
          chainSq(col("v"), probe)).as("d2"),
        abs(VecDistExprs.vecCenteredDotD(spark, col("v"), lit(mu), lit(probe)) -
          chainCdot(col("v"), mu, probe)).as("d3"))
      .agg(max(col("d1")), max(col("d2")), max(col("d3")))
      .head()
    assert(diffs.getDouble(0) == 0.0) // bit-identical, not just close
    assert(diffs.getDouble(1) == 0.0)
    assert(diffs.getDouble(2) == 0.0)
  }

  test("SQL-callable, null-safe, min-length fold") {
    VecDistExprs.register(spark)
    val r = spark.sql(
      """SELECT vec_dot_d(array(1.0d, 2.0d, 9.0d), array(3.0d, 4.0d)) AS d,
        |  vec_sqdist_d(array(1.0d), array(3.0d, 100.0d)) AS s,
        |  vec_cdot_d(array(2.0d, 7.0d), array(1.0d), array(10.0d)) AS c,
        |  vec_dot_d(NULL, array(1.0d)) AS n""".stripMargin).head()
    assert(r.getDouble(0) == 11.0) // 1*3 + 2*4, third elem ignored
    assert(r.getDouble(1) == 4.0)  // (1-3)^2 only
    assert(r.getDouble(2) == 10.0) // (2-1)*10 only
    assert(r.isNullAt(3))
  }

  test("float-array input is rejected at analysis") {
    VecDistExprs.register(spark)
    intercept[Exception] {
      spark.sql("SELECT vec_dot_d(array(1.0f), array(1.0f))").collect()
    }
  }
}
