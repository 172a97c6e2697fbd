package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}

/** Winnowing document fingerprints (the MOSS local-fingerprinting
  * algorithm, Schleimer/Wilkerson/Aiken SIGMOD'03): hash every k-gram
  * shingle, slide a window of `w` consecutive hashes, keep each
  * window's MINIMUM, output the sorted distinct minima. The selection
  * guarantee: any two documents sharing a run of at least w+k-1
  * tokens share at least one fingerprint — robust containment/
  * plagiarism detection at a density of ~2/(w+1) fingerprints per
  * hash instead of all m, which is what makes fingerprint indexes
  * tractable at corpus scale.
  *
  * The per-shingle hash is [[graft.functions.PortableHash
  * .md5Long60Jvm]] so the DuckDB oracle reproduces every fingerprint
  * bit-identically (`CAST('0x'||substr(md5(s),1,15) AS BIGINT)`).
  * Contract mirrored in the oracle SQL:
  *   - no shingles → empty array;
  *   - fewer than `w` shingles → one fingerprint, the min of all
  *     (the whole doc is one window — short docs still fingerprint);
  *   - else → sorted distinct window minima.
  *
  * Row-local and codegen'd (single JVM call per row, O(m) via a
  * monotonic deque) — embarrassingly parallel, no shuffle at any
  * scale.
  */
case class WinnowExpr(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow requires an array<string> argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    WinnowExpr.compute(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.plans.WinnowExpr$$.MODULE$$.compute($a, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object WinnowExpr {

  /** Called from both interpreted eval and generated code. */
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val m = arr.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      // a null shingle cannot occur from the shingling expression;
      // hash the empty string for robustness on arbitrary input
      h(i) =
        if (arr.isNullAt(i)) graft.functions.PortableHash.md5Long60Jvm(Array.empty)
        else graft.functions.PortableHash.md5Long60Jvm(arr.getUTF8String(i).getBytes)
      i += 1
    }
    val mins = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var best = h(0)
      i = 1
      while (i < m) { if (h(i) < best) best = h(i); i += 1 }
      mins.add(best)
    } else {
      // monotonic deque of indices: head = current window's min
      val deque = new Array[Int](m)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < m) {
        if (head < tail && deque(head) <= i - w) head += 1
        while (head < tail && h(deque(tail - 1)) >= h(i)) tail -= 1
        deque(tail) = i
        tail += 1
        if (i >= w - 1) mins.add(h(deque(head)))
        i += 1
      }
    }
    val out = new Array[Long](mins.size())
    val it = mins.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Register `winnow` in the session's function registry (same
    * builder as the GraftExtensions path).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow", buildFromExprs, "built-in")

  /** Single builder for BOTH registration paths. */
  def buildFromExprs(exprs: Seq[Expression]): WinnowExpr = {
    require(exprs.length == 2, "winnow(shingles, w) takes 2 arguments")
    val w = exprs(1).eval(null) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"winnow window must be an int literal, got $other")
    }
    WinnowExpr(exprs.head, w)
  }

  def winnow(spark: SparkSession, shingles: Column, w: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("winnow", shingles,
      org.apache.spark.sql.functions.lit(w))
  }
}
