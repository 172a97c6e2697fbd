package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd positional-occurrence-tagged q-gram set of a string —
  * gram `i` is `substring(s, i+1, q)` suffixed with `#k` where `k` is
  * how many EQUAL grams precede position i. Bit-identical to
  * [[graft.operators.FuzzyJoin]]'s previous nested-HOF expression
  * (`transform(transform(sequence...), (g,i) -> concat(g,'#',count of
  * equal grams in slice(..,1,i)))`), asserted in TaggedGramsExprSpec.
  *
  * Why: the HOF chain ran INTERPRETED and recomputed the full gram
  * array per element (`slice` + `filter` per position = O(G^2) with
  * per-element lambda dispatch). This kernel is ONE JVM loop with a
  * hash-map occurrence counter — O(G·q) — and participates in
  * whole-stage codegen (same §4.3 escalation as [[WordShinglesExpr]]/
  * [[SimHash64Expr]]: measured need, public Expression API).
  */
case class TaggedGramsExpr(child: Expression, q: Int) extends UnaryExpression {

  require(q >= 1, s"q-gram size must be >= 1, got $q")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tagged_qgrams requires a string argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    TaggedGramsExpr.compute(a.asInstanceOf[UTF8String], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.plans.TaggedGramsExpr$$.MODULE$$.compute($a, $q)")

  override protected def withNewChildInternal(newChild: Expression): TaggedGramsExpr =
    copy(child = newChild)
}

object TaggedGramsExpr {

  private val hash = UTF8String.fromString("#")

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String, q: Int): ArrayData = {
    val len = s.numChars()
    if (len < q) return new GenericArrayData(Array.empty[Any])
    val g = len - q + 1
    val counts = new java.util.HashMap[UTF8String, Integer](g * 2)
    val out = new Array[Any](g)
    var i = 0
    while (i < g) {
      val gram = s.substringSQL(i + 1, q)
      val c = counts.getOrDefault(gram, 0)
      counts.put(gram, c + 1)
      out(i) = UTF8String.concat(gram, hash,
        UTF8String.fromString(String.valueOf(c.intValue())))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Register `tagged_qgrams(s, q)` (q must be a foldable int). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tagged_qgrams", exprs => {
        require(exprs.length == 2, "tagged_qgrams(s, q) takes 2 arguments")
        val q = exprs(1).eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"tagged_qgrams size must be an int literal, got $other")
        }
        TaggedGramsExpr(exprs.head, q)
      }, "built-in")

  def taggedGrams(spark: SparkSession, s: Column, q: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("tagged_qgrams",
      s, org.apache.spark.sql.functions.lit(q))
  }
}
