package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text quality statistics: tokenize, count, sum token
  * lengths, count stopword hits, and count total/distinct n-gram
  * shingles — the integer inputs every Gopher-style quality signal is
  * built from — in a single codegen'd JVM call per row. The
  * interpreted higher-order-function formulation of the same five
  * numbers (filter + aggregate + transform/array_distinct chains)
  * cost ~0.6 s of q58's 1.5 s at sf0.1; this expression removes all
  * of it while staying BIT-identical (tokenization is the same
  * `split(lower(text), "\\s+")`-drop-empties contract, asserted
  * against the HOF forms in the spec).
  *
  * Returns null for null text (null-propagating like the HOFs).
  * Output struct:
  *   - n_tokens: Int          (= size(tokens))
  *   - sum_word_len: Long     (= Σ length(token))
  *   - stopword_cnt: Int      (= count of tokens ∈ stopwords)
  *   - total_shingles: Int    (= size of the n-gram shingle list)
  *   - distinct_shingles: Int (= size of its distinct set)
  *   - bpe_est: Long          (= Σ ceil(length(token)/6) — the BPE-ish
  *                             token-count estimate; integer (L+5)/6
  *                             is exactly ceil(L/6.0) for L < 2^52)
  */
case class TextStatsExpr(child: Expression, n: Int, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = TextStatsExpr.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"text_stats requires a string argument, got ${other.simpleString}")
    }

  // the stopword set ships once per task inside the expression, not
  // per row
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(a: Any): Any =
    TextStatsExpr.compute(a.asInstanceOf[UTF8String], n, stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet,
      classOf[java.util.HashSet[String]].getName)
    defineCodeGen(ctx, ev,
      a => s"graft.plans.TextStatsExpr$$.MODULE$$.compute($a, $n, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("stopword_cnt", IntegerType, nullable = false),
    StructField("total_shingles", IntegerType, nullable = false),
    StructField("distinct_shingles", IntegerType, nullable = false),
    StructField("bpe_est", LongType, nullable = false)))

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Called from both interpreted eval and generated code. The
    * token contract is exactly `split(lower(text), "\\s+")` minus
    * empties: same lowercase (UTF8String.toLowerCase) and same Java
    * regex engine Spark's split uses.
    */
  def compute(text: UTF8String, n: Int,
      stop: java.util.HashSet[String]): InternalRow = {
    val toks = ws.split(text.toLowerCase.toString, -1)
    var nTok = 0
    var sumLen = 0L
    var stopCnt = 0
    var bpe = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        nTok += 1
        // length in CODE POINTS — Spark's length() counts characters,
        // not UTF-16 units, and the HOF forms must stay bit-identical
        val len = t.codePointCount(0, t.length)
        sumLen += len
        bpe += (len + 5) / 6
        if (stop.contains(t)) stopCnt += 1
      }
      i += 1
    }
    var total = 0
    var distinct = 0
    // n <= 0 disables the shingle fields entirely — callers that only
    // read the token-level stats (q42's BPE estimate, the q31 feature
    // columns) skip the per-row StringBuilder/HashSet work instead of
    // paying for fields they never select
    if (n > 0 && nTok >= n) {
      // compact the non-empty tokens once for windowed joins
      val clean = new Array[String](nTok)
      var j = 0
      i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty) { clean(j) = toks(i); j += 1 }
        i += 1
      }
      total = nTok - n + 1
      val seen = new java.util.HashSet[String](total * 2)
      val sb = new java.lang.StringBuilder()
      i = 0
      while (i < total) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(clean(i + k))
          k += 1
        }
        if (seen.add(sb.toString)) distinct += 1
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](nTok, sumLen, stopCnt, total, distinct, bpe))
  }

  /** Register `text_stats` in the session's function registry (the
    * stopword list as a comma-joined string literal). Shares
    * [[buildFromExprs]] with the app-wide GraftExtensions path so the
    * same SQL text resolves identically regardless of which
    * registration won (eval-based: any foldable argument works).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_stats", buildFromExprs, "built-in")

  /** Single builder for BOTH registration paths. */
  def buildFromExprs(exprs: Seq[Expression]): TextStatsExpr = {
    require(exprs.length == 3,
      "text_stats(text, n, stopwords_csv) takes 3 arguments")
    val n = exprs(1).eval(null) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"text_stats shingle width must be an int literal, got $other")
    }
    val stops = exprs(2).eval(null) match {
      case s: UTF8String => s.toString.split(",").filter(_.nonEmpty).toSeq
      case other => throw new IllegalArgumentException(
        s"text_stats stopwords must be a string literal, got $other")
    }
    TextStatsExpr(exprs.head, n, stops)
  }

  def textStats(spark: SparkSession, text: Column, n: Int,
      stopwords: Seq[String]): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("text_stats", text,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(stopwords.mkString(",")))
  }
}
