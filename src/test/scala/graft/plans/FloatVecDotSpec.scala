package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.Tables
import graft.functions.VectorFns

/** The codegen'd vec_dot must be bit-identical to the higher-order
  * function formulation and resolvable from SQL text.
  */
class FloatVecDotSpec extends SparkSuiteBase {

  test("vec_dot equals aggregate(zip_with(...)) exactly") {
    val e = Tables.embeddings(spark, sfDir).limit(100)
    val pairs = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("embedding").as("vb")))
      .filter(col("ida") < col("idb")).limit(500)
    val maxDiff = pairs.select(
        abs(FloatVecDot.vecDot(spark, col("va"), col("vb")) -
          VectorFns.dot(VectorFns.toDoubleArray(col("va")),
            VectorFns.toDoubleArray(col("vb")))).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(maxDiff == 0.0) // bit-identical, not just close
  }

  test("vec_dot is SQL-callable and null-safe") {
    FloatVecDot.register(spark)
    graft.Queries.registerViews(spark, sfDir)
    val n = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS d FROM embeddings WHERE vec_id < 5")
      .collect()
    assert(n.length == 5 && n.forall(r => r.getDouble(0) > 0))
    val nul = spark.sql("SELECT vec_dot(NULL, array(1.0f, 2.0f)) AS d").collect()
    assert(nul.head.isNullAt(0))
  }

  test("type mismatch is rejected at analysis") {
    FloatVecDot.register(spark)
    intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0d), array(1.0d))").collect()
    }
  }
}
