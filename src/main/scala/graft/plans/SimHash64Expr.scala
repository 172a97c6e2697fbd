package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 64-bit SimHash over an `array<string>` token column:
  * per-token 64-bit hash (iterative byte hash + splitmix64 finalizer,
  * both public-domain mixers), each bit votes ±1, sign of the vote
  * sets the output bit.
  *
  * Replaces the round-1 Scala UDF (same hash, bit-identical output):
  * the UDF paid a CatalystTypeConverters round-trip — ArrayData →
  * boxed Seq[String] → String per row — on the hot dedup path; this
  * expression reads UTF8String bytes straight out of the columnar
  * array inside whole-stage codegen. Same §4.3 escalation as
  * [[FloatVecDot]].
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires an array<string> argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    SimHash64Expr.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.plans.SimHash64Expr$$.MODULE$$.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {

  /** Per-token hash: iterative 31-multiplier over UTF-8 bytes, then
    * the splitmix64 finalizer — identical to the round-1 UDF's
    * tokenHash64, so simhash values are stable across the migration.
    */
  def hashToken(t: UTF8String): Long = {
    val bytes = t.getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Called from both interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // skip null tokens: containsNull arrays are accepted by the type
      // check, and getUTF8String on a null slot would NPE from
      // generated code with no useful message
      if (!arr.isNullAt(i)) {
        val h = hashToken(arr.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) >= 0) out |= (1L << j); j += 1 }
    out
  }

  /** Register `simhash64` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "built-in")

  def simhash64(spark: SparkSession, toks: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("simhash64", toks)
  }
}
