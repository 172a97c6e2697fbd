package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd symmetric int8 quantization of an `array<float>` vector:
  * returns `struct(scale: double, qvec: array<int>)` with
  * `scale = max|x| / 127` and `code = floor(x/scale + 0.5)` — the
  * same IEEE double arithmetic as the
  * [[graft.functions.VectorFns.int8Scale]]/`quantizeInt8` column
  * forms (bit-identity asserted in SketchExprSpec) and as the DuckDB
  * oracle. One JVM loop instead of two interpreted HOF passes
  * (aggregate for the scale + transform for the codes — q55's
  * dominant cost at sf0.1).
  */
case class Int8QuantizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Int8QuantizeExpr.outType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_quantize requires an array<float> argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    Int8QuantizeExpr.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.plans.Int8QuantizeExpr$$.MODULE$$.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Int8QuantizeExpr =
    copy(child = newChild)
}

object Int8QuantizeExpr {

  val outType: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("qvec", ArrayType(IntegerType, containsNull = true),
      nullable = false)))

  /** Called from both interpreted eval and generated code. Null
    * elements are skipped by the scale (like `greatest` in the column
    * form); the per-element branch tests `scale == 0` BEFORE the
    * null-element check — exactly the column form's
    * `when(scale === 0, 0)` which short-circuits without touching the
    * element — so a null element quantizes to 0 in a zero-scale
    * vector and to null otherwise. The two JVM forms are
    * bit-identical on ANY input (SketchExprSpec edge cases: null
    * elements, empty, all-null, all-zero). The DuckDB oracle matches
    * on every vector with >= 1 non-null element; on empty/all-null
    * vectors SQL's `list_max` yields a NULL scale where both JVM
    * forms define scale 0 — a documented divergence the gated fixture
    * never produces.
    */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = math.abs(arr.getFloat(i).toDouble)
        if (v > maxAbs) maxAbs = v
      }
      i += 1
    }
    val scale = maxAbs / 127.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) =
        if (scale == 0.0) 0
        else if (arr.isNullAt(i)) null
        else math.floor(arr.getFloat(i).toDouble / scale + 0.5).toInt
      i += 1
    }
    InternalRow(scale, new GenericArrayData(out))
  }

  /** Register `int8_quantize` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_quantize", exprs => Int8QuantizeExpr(exprs.head), "built-in")

  def int8Quantize(spark: SparkSession, vec: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("int8_quantize", vec)
  }
}
