package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, NullType}

/** Codegen'd IVF cell ASSIGNMENT: the cell index of the nearest
  * centroid by (1 - cos6, cell) — the rank-1 slice of
  * `Similarity.cellRank`, as ONE tight JVM loop over a precomputed
  * centroid matrix instead of building and array_sort-ing a
  * numCells-wide struct array per row.
  *
  * Why (SURVEY §4.3 escalation, on measured need): with corpus-sized
  * cell counts (autoCells gives N/100 cells — 600 at the 30× fixture)
  * the struct-array formulation allocates and sorts 600 structs per
  * row; the 30× semantic-dedup assignment measured 23 s of which the
  * sort/alloc machinery was the bulk. This kernel is the same
  * arithmetic — per-centroid dot in left-to-right double summation
  * over min(len) ([[FloatVecDot]]'s rule), 6-dp-rounded cosine, ties
  * to the smaller cell, NaN distances never win (array_sort places
  * NaN last; an all-NaN row lands on cell 0, the sort's tie-break
  * answer) — with centroid norms computed once at plan construction.
  *
  * The centroid matrix arrives as a FOLDABLE array<array<float>>
  * literal child (cell i = element i), so the expression registers
  * through the normal function registry; the kernel object (matrix +
  * norms) is built once per plan and shipped to codegen via
  * `addReferenceObj`.
  */
case class NearestCellExpr(vec: Expression, cents: Expression)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cents
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) | NullType => true
      case _ => false
    }
    val centsOk = cents.foldable && (cents.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true
      case _ => false
    })
    if (vecOk && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_cell requires (array<float>, foldable array<array<float>>), " +
        s"got ${vec.dataType.simpleString} / ${cents.dataType.simpleString} " +
        s"(foldable=${cents.foldable})")
  }

  @transient private lazy val kernel: NearestCellExpr.Kernel = {
    val arr = cents.eval().asInstanceOf[ArrayData]
    val m = Array.tabulate(arr.numElements()) { c =>
      arr.getArray(c).toFloatArray()
    }
    new NearestCellExpr.Kernel(m)
  }

  override def nullSafeEval(v: Any, c: Any): Any =
    kernel.assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCellKernel", kernel,
      classOf[NearestCellExpr.Kernel].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.assign($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCellExpr =
    copy(vec = newLeft, cents = newRight)
}

object NearestCellExpr {

  /** Centroid matrix + precomputed norms; `assign` is the hot loop. */
  final class Kernel(cents: Array[Array[Float]]) extends Serializable {
    require(cents.nonEmpty, "nearest_cell needs at least one centroid")

    private val norms: Array[Double] = cents.map { cv =>
      var s = 0.0
      var i = 0
      while (i < cv.length) { s += cv(i).toDouble * cv(i).toDouble; i += 1 }
      math.sqrt(s)
    }

    def assign(v: ArrayData): Int = {
      val n = v.numElements()
      val vv = new Array[Float](n)
      var i = 0
      while (i < n) { vv(i) = v.getFloat(i); i += 1 }
      var na = 0.0
      i = 0
      while (i < n) { na += vv(i).toDouble * vv(i).toDouble; i += 1 }
      na = math.sqrt(na)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        val m = math.min(n, cv.length)
        var dot = 0.0
        i = 0
        while (i < m) { dot += vv(i).toDouble * cv(i).toDouble; i += 1 }
        val cos = math.floor(dot / (na * norms(c)) * 1e6 + 0.5) / 1e6
        val d = 1.0 - cos
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nearest_cell", exprs => NearestCellExpr(exprs(0), exprs(1)), "built-in")

  def nearestCell(spark: SparkSession, vec: Column, cents: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("nearest_cell", vec, cents)
  }
}

/** [[NearestCellExpr]]'s DOUBLE-centroid twin for the k-means
  * training loop: `Similarity.trainIvfCentroidsD` keeps centroids in
  * double precision (the q88 oracle reproduces every round
  * bit-for-bit), so its per-round assignment ran the
  * `cellRankD` struct-array sort — C cos6D expression sub-trees plus
  * an O(C log C) sort per row, which at autoCells counts (600+ cells)
  * falls out of whole-stage codegen and measured ~30 s/round on a
  * 26k-row corpus. Same arithmetic as cos6D — per-centroid dot in
  * left-to-right double summation, 6-dp-rounded cosine, ties to the
  * smaller cell, NaN never wins — as one tight loop.
  */
case class NearestCellDExpr(vec: Expression, cents: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types.DoubleType

  override def left: Expression = vec
  override def right: Expression = cents
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) | NullType => true
      case _ => false
    }
    val centsOk = cents.foldable && (cents.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })
    if (vecOk && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_cell_d requires (array<float>, foldable array<array<double>>), " +
        s"got ${vec.dataType.simpleString} / ${cents.dataType.simpleString} " +
        s"(foldable=${cents.foldable})")
  }

  @transient private lazy val kernel: NearestCellDExpr.Kernel = {
    val arr = cents.eval().asInstanceOf[ArrayData]
    val m = Array.tabulate(arr.numElements()) { c =>
      arr.getArray(c).toDoubleArray()
    }
    new NearestCellDExpr.Kernel(m)
  }

  override def nullSafeEval(v: Any, c: Any): Any =
    kernel.assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCellDKernel", kernel,
      classOf[NearestCellDExpr.Kernel].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.assign($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCellDExpr =
    copy(vec = newLeft, cents = newRight)
}

object NearestCellDExpr {

  final class Kernel(cents: Array[Array[Double]]) extends Serializable {
    require(cents.nonEmpty, "nearest_cell_d needs at least one centroid")

    private val norms: Array[Double] = cents.map { cv =>
      var s = 0.0
      var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
      math.sqrt(s)
    }

    def assign(v: ArrayData): Int = {
      val n = v.numElements()
      val vv = new Array[Double](n)
      var i = 0
      while (i < n) { vv(i) = v.getFloat(i).toDouble; i += 1 }
      var na = 0.0
      i = 0
      while (i < n) { na += vv(i) * vv(i); i += 1 }
      na = math.sqrt(na)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        val m = math.min(n, cv.length)
        var dot = 0.0
        i = 0
        while (i < m) { dot += vv(i) * cv(i); i += 1 }
        val cos = math.floor(dot / (na * norms(c)) * 1e6 + 0.5) / 1e6
        val d = 1.0 - cos
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nearest_cell_d", exprs => NearestCellDExpr(exprs(0), exprs(1)),
      "built-in")

  def nearestCellD(spark: SparkSession, vec: Column, cents: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("nearest_cell_d", vec, cents)
  }
}
