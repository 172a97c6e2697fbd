package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd byte-packing of int8 quantization codes: `array<int>`
  * (each element in [-128, 127], as produced by [[Int8QuantizeExpr]])
  * → `binary`, one byte per element, offset-128 encoding
  * (`byte = code + 128`, so the byte stream is unsigned-comparable).
  * This is the step that actually delivers the 4x storage claim of
  * int8 quantization — an `array<int>` column stores 4 bytes per code
  * plus array overhead; the packed `binary` stores exactly 1.
  *
  * Contract: elements must be non-null and within int8 range — out of
  * range throws (ANSI-style loud failure, not silent truncation); a
  * null ELEMENT throws too (a packed byte has no null slot — drop or
  * impute nulls before packing). A null ARRAY packs to null.
  * [[Int8UnpackExpr]] inverts exactly: `code = (byte & 0xff) - 128`;
  * roundtrip bit-identity is asserted in SketchExprSpec and on the
  * oracle surface by q61's `roundtrip_ok` column.
  */
case class Int8PackExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_pack requires an array<int> argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    Int8PackExpr.pack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.plans.Int8PackExpr$$.MODULE$$.pack($a)")

  override protected def withNewChildInternal(newChild: Expression): Int8PackExpr =
    copy(child = newChild)
}

object Int8PackExpr {

  /** Called from both interpreted eval and generated code. */
  def pack(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"int8_pack: null code at position $i — packed bytes have no " +
          "null slot; drop or impute null codes before packing")
      val c = arr.getInt(i)
      if (c < -128 || c > 127) throw new IllegalArgumentException(
        s"int8_pack: code $c at position $i outside int8 range [-128, 127]")
      out(i) = (c + 128).toByte
      i += 1
    }
    out
  }

  /** Register `int8_pack` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_pack", exprs => Int8PackExpr(exprs.head), "built-in")

  def int8Pack(spark: SparkSession, codes: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("int8_pack", codes)
  }
}

/** Inverse of [[Int8PackExpr]]: `binary` → `array<int>` of codes in
  * [-128, 127]. Output elements are never null (the packed form cannot
  * encode one).
  */
case class Int8UnpackExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_unpack requires a binary argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    Int8UnpackExpr.unpack(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.plans.Int8UnpackExpr$$.MODULE$$.unpack($a)")

  override protected def withNewChildInternal(newChild: Expression): Int8UnpackExpr =
    copy(child = newChild)
}

object Int8UnpackExpr {

  /** Called from both interpreted eval and generated code. */
  def unpack(bytes: Array[Byte]): ArrayData = {
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = (bytes(i) & 0xff) - 128
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Register `int8_unpack` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_unpack", exprs => Int8UnpackExpr(exprs.head), "built-in")

  def int8Unpack(spark: SparkSession, packed: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("int8_unpack", packed)
  }
}
