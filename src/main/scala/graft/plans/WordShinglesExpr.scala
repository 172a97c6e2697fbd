package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd n-word shingling over a raw `split(lower(text), "\s+")`
  * array: drops empty tokens (the tokenizer's filter), then emits the
  * space-joined n-gram windows — bit-identical to
  * `wordShingles(tokens(text), n)` (asserted in SketchExprSpec), in
  * ONE JVM loop.
  *
  * Why: the `filter` + `transform(sequence, slice, concat_ws)`
  * higher-order-function chain runs INTERPRETED, with per-element
  * lambda dispatch; at sf0.1 the shingle explode alone cost ~4.4 s
  * and sat under q33, q34 and q47 (same §4.3 escalation as
  * [[FloatVecDot]]/[[SimHash64Expr]] — measured need, public
  * Expression API).
  */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles requires an array<string> argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    WordShinglesExpr.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.plans.WordShinglesExpr$$.MODULE$$.compute($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

object WordShinglesExpr {

  private val space = UTF8String.fromString(" ")

  /** Called from both interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val total = arr.numElements()
    val toks = new java.util.ArrayList[UTF8String](total)
    var i = 0
    while (i < total) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) toks.add(t)
      }
      i += 1
    }
    val m = toks.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var j = 0
    while (j <= m - n) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = toks.get(j + k); k += 1 }
      out(j) = UTF8String.concatWs(space, parts: _*)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Register `word_shingles(arr, n)` (n must be a foldable int). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => {
        require(exprs.length == 2, "word_shingles(arr, n) takes 2 arguments")
        val n = exprs(1).eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"word_shingles width must be an int literal, got $other")
        }
        WordShinglesExpr(exprs.head, n)
      }, "built-in")

  def wordShingles(spark: SparkSession, rawTokens: Column, n: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("word_shingles",
      rawTokens, org.apache.spark.sql.functions.lit(n))
  }
}
