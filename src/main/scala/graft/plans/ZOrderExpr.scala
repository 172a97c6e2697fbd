package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, NullType}

/** Codegen'd Morton (Z-order) bit interleave of two pre-quantized
  * dimension bins: bit i of `left` lands at z-bit 2i, bit i of
  * `right` at 2i+1, over the low [[ZOrderExpr.Bits]] bits of each.
  *
  * The z-value linearizes a 2-D space so that RANGE-partitioning by it
  * clusters rows into near-rectangles: a file then covers a small
  * (dimA, dimB) box and a 2-D selection prunes to the files whose box
  * intersects — the multi-dimensional layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY` (public docs), expressed as a
  * plain column. Callers quantize dimensions to [0, 2^Bits) first
  * (see `ScaleOps.zorderLayout`); values outside are masked, so the
  * expression is total.
  *
  * Arithmetic is pure Long bit ops — the DuckDB oracle replays it
  * verbatim with `&`, `>>`, `<<` over generate_series (q109).
  */
case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case LongType | NullType => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder requires two bigint arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderExpr.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.ZOrderExpr$$.MODULE$$.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpr {

  /** Bits interleaved per dimension. 16 per dim = 32-bit z-values —
    * 65536 bins per axis, already far finer than any practical file
    * count; the fixed width keeps the oracle replay a bounded
    * generate_series.
    */
  val Bits = 16

  def interleave(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < Bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder", buildFromExprs, "built-in")

  def buildFromExprs(exprs: Seq[Expression]): ZOrderExpr = {
    require(exprs.length == 2, "zorder(a, b) takes 2 arguments")
    ZOrderExpr(exprs(0), exprs(1))
  }

  def zorder(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("zorder", a, b)
  }
}
