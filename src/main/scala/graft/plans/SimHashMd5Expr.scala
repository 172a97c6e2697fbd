package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Oracle-portable 60-bit SimHash over an `array<string>` token
  * column: the per-token hash is [[graft.functions.PortableHash
  * .md5Long60Jvm]] — the first 15 hex chars of md5, which the DuckDB
  * oracle reproduces as `CAST('0x'||substr(md5(w),1,15) AS BIGINT)` —
  * each of the 60 bits votes ±1, a non-negative vote sets the bit.
  *
  * Used only by the oracle-gated q35; [[SimHash64Expr]] (xxhash-style
  * splitmix mixing, 64 bits) stays the fast default. Null tokens are
  * skipped (they carry no bits to vote).
  */
case class SimHashMd5Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_md5_60 requires an array<string> argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    SimHashMd5Expr.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.plans.SimHashMd5Expr$$.MODULE$$.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5Expr =
    copy(child = newChild)
}

object SimHashMd5Expr {

  val Bits: Int = 60

  /** Called from both interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null token: nothing to vote
        val h = graft.functions.PortableHash.md5Long60Jvm(
          arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < Bits) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < Bits) { if (votes(j) >= 0) out |= (1L << j); j += 1 }
    out
  }

  /** Register `simhash_md5_60` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_md5_60", exprs => SimHashMd5Expr(exprs.head), "built-in")

  def simhashMd5(spark: SparkSession, toks: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("simhash_md5_60", toks)
  }
}
