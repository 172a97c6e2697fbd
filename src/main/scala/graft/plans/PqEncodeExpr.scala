package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, NullType}

/** Codegen'd product-quantization ENCODE (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): splits the
  * vector into `numSub` contiguous subvectors and emits, per subspace,
  * the index of the nearest codebook centroid by squared-L2 — the
  * M-byte compressed representation that lets a 100 TB embedding
  * corpus be scanned as codes (M × 1 B/vector) instead of floats
  * (D × 4 B/vector).
  *
  * One tight JVM loop per row over a precomputed codebook matrix —
  * the same escalation [[NearestCellExpr]] took for IVF assignment
  * (SURVEY §4.3): the HOF/struct-sort formulation allocates and sorts
  * numCentroids structs per (row × subspace).
  *
  * Determinism contract (the q98 oracle reproduces it in DuckDB SQL):
  * per-subspace squared-L2 in DOUBLE precision (floats cast exactly),
  * summed over the overlapping dimensions in index order, rounded to
  * 6 decimals with `floor(d*1e6 + 0.5)/1e6`, ties to the smaller
  * centroid index. NaN distances never win; an all-NaN subspace lands
  * on centroid 0. A vector shorter than a subspace's span compares
  * only the overlapping dimensions (FloatVecDot's min-length rule).
  *
  * The codebooks arrive as a FOLDABLE array<array<array<float>>>
  * literal child — books(m)(c) = centroid c of subspace m — so the
  * expression registers through the normal function registry; the
  * kernel is built once per plan and shipped to codegen via
  * `addReferenceObj`.
  */
case class PqEncodeExpr(vec: Expression, books: Expression)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = books
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) | NullType => true
      case _ => false
    }
    val booksOk = books.foldable && (books.dataType match {
      case ArrayType(ArrayType(ArrayType(FloatType, _), _), _) => true
      case _ => false
    })
    if (vecOk && booksOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_encode requires (array<float>, foldable array<array<array<float>>>), " +
        s"got ${vec.dataType.simpleString} / ${books.dataType.simpleString} " +
        s"(foldable=${books.foldable})")
  }

  @transient private lazy val kernel: PqEncodeExpr.Kernel = {
    val arr = books.eval().asInstanceOf[ArrayData]
    val m = Array.tabulate(arr.numElements()) { s =>
      val sub = arr.getArray(s)
      Array.tabulate(sub.numElements())(c => sub.getArray(c).toFloatArray())
    }
    new PqEncodeExpr.Kernel(m)
  }

  override def nullSafeEval(v: Any, b: Any): Any =
    kernel.encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncodeKernel", kernel,
      classOf[PqEncodeExpr.Kernel].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.encode($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(vec = newLeft, books = newRight)
}

object PqEncodeExpr {

  /** Codebook matrix + per-subspace start offsets; `encode` is the
    * hot loop. Offsets are cumulative over the subspace spans, so
    * subspaces of unequal width compose (the last subspace of a
    * dims % numSub != 0 split is simply narrower).
    */
  final class Kernel(books: Array[Array[Array[Float]]]) extends Serializable {
    require(books.nonEmpty, "pq_encode needs at least one subspace")
    require(books.forall(_.nonEmpty),
      "pq_encode needs at least one centroid per subspace")

    private val offsets: Array[Int] = {
      val o = new Array[Int](books.length)
      var m = 1
      while (m < books.length) {
        o(m) = o(m - 1) + books(m - 1)(0).length
        m += 1
      }
      o
    }

    def encode(v: ArrayData): ArrayData = {
      val n = v.numElements()
      val vv = new Array[Float](n)
      var i = 0
      while (i < n) { vv(i) = v.getFloat(i); i += 1 }
      val codes = new Array[Int](books.length)
      var m = 0
      while (m < books.length) {
        val cents = books(m)
        val off = offsets(m)
        var best = 0
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < cents.length) {
          val cv = cents(c)
          val lim = math.min(cv.length, math.max(0, n - off))
          var d = 0.0
          var j = 0
          while (j < lim) {
            val t = vv(off + j).toDouble - cv(j).toDouble
            d += t * t
            j += 1
          }
          val d6 = math.floor(d * 1e6 + 0.5) / 1e6
          if (d6 < bestD) { bestD = d6; best = c }
          c += 1
        }
        codes(m) = best
        m += 1
      }
      new GenericArrayData(codes)
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode", exprs => PqEncodeExpr(exprs(0), exprs(1)), "built-in")

  def pqEncode(spark: SparkSession, vec: Column, books: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("pq_encode", vec, books)
  }
}
