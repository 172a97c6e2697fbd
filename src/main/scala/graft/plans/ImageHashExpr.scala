package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, NullType}

/** Codegen'd perceptual image hashes over a `binary` BMP payload
  * column: the classic aHash / dHash content fingerprints
  * (average-hash and gradient-hash; public method, e.g. the pHash
  * project and Krawetz's "Kind of Like That" writeups) — decode the
  * bitmap, average-pool the luminance to an 8x8 grid, emit 64 bits.
  *
  * The DECODE tier is real for 24bpp uncompressed BMP (plain bytes —
  * no image library needed, same minimal-real discipline as
  * [[graft.operators.Multimodal.HeaderCodec]]): header walk, per-row
  * 4-byte padding, bottom-up vs top-down row order. Other containers
  * (compressed PNG/JPEG payloads) return NULL — decoding those needs
  * the external codec this environment lacks.
  *
  * Both hashes run as single static calls inside whole-stage codegen
  * (same escalation as [[SimHash64Expr]]); a Scala UDF here would pay
  * the boxing round-trip per payload on the corpus-wide dedup scan.
  *
  * Bit layout: bit i (0-based, little-endian in the long) is grid cell
  * (x = i % 8, y = i / 8) counted from the TOP-left of the image.
  *   - aHash: bit set iff cell luminance >= mean of the 64 cells.
  *   - dHash: bit set iff right neighbor (wrapping: (x+1) % 8, same
  *     row) is strictly brighter than the cell — the wrap variant
  *     keeps one 8x8 pooled frame shared between both hashes instead
  *     of dHash's usual 9x8.
  */
case class ImageAHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_ahash requires a binary argument, got ${other.simpleString}")
  }

  override def nullSafeEval(b: Any): Any =
    ImageHash.aHash64(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      |java.lang.Long ${ev.value}_r = graft.plans.ImageHash.aHash64($b);
      |if (${ev.value}_r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r.longValue(); }
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageAHashExpr =
    copy(child = newChild)
}

case class ImageDHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_dhash requires a binary argument, got ${other.simpleString}")
  }

  override def nullSafeEval(b: Any): Any =
    ImageHash.dHash64(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      |java.lang.Long ${ev.value}_r = graft.plans.ImageHash.dHash64($b);
      |if (${ev.value}_r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r.longValue(); }
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageDHashExpr =
    copy(child = newChild)
}

object ImageHash {

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Decode a 24bpp uncompressed BMP and average-pool luminance
    * ((r+g+b)/3) into an 8x8 row-major grid (top-left origin). Cell
    * (x, y) pools source columns [floor(x*w/8), floor((x+1)*w/8)) —
    * the standard box-resample block split, exact for w, h multiples
    * of 8. Returns null when the payload is not a decodable BMP of at
    * least 8x8 pixels.
    */
  def pooled8x8(b: Array[Byte]): Array[Double] = {
    if (b == null || b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte)
      return null
    val pixOff = leInt(b, 10)
    val w = leInt(b, 18)
    val hRaw = leInt(b, 22)
    val bpp = leShort(b, 28)
    val compression = leInt(b, 30)
    val h = math.abs(hRaw)
    if (bpp != 24 || compression != 0 || w < 8 || h < 8 || pixOff < 54)
      return null
    // LONG row arithmetic: a crafted width near 2^31/3 overflows
    // w*3 as an int to a NEGATIVE rowBytes that sails through the
    // bounds check and indexes out of the buffer
    val rowBytesL = ((w.toLong * 3 + 3) / 4) * 4
    if (pixOff.toLong + rowBytesL * h > b.length) return null
    val rowBytes = rowBytesL.toInt // <= b.length after the check
    val topDown = hRaw < 0
    val sums = new Array[Double](64)
    val counts = new Array[Int](64)
    var y = 0
    while (y < h) {
      // stored row index: bottom-up files store image row y (from the
      // top) at file row h-1-y
      val fileRow = if (topDown) y else h - 1 - y
      val rowOff = pixOff + fileRow * rowBytes
      val cy = (y * 8) / h
      var x = 0
      while (x < w) {
        val p = rowOff + x * 3
        val lum = ((b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)) / 3.0
        val cell = cy * 8 + (x * 8) / w
        sums(cell) += lum
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var i = 0
    while (i < 64) { out(i) = sums(i) / counts(i); i += 1 }
    out
  }

  def aHash64(b: Array[Byte]): java.lang.Long = {
    val g = pooled8x8(b)
    if (g == null) return null
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += g(i); i += 1 }
    mean /= 64.0
    var out = 0L
    i = 0
    while (i < 64) { if (g(i) >= mean) out |= (1L << i); i += 1 }
    java.lang.Long.valueOf(out)
  }

  def dHash64(b: Array[Byte]): java.lang.Long = {
    val g = pooled8x8(b)
    if (g == null) return null
    var out = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 8 + (x + 1) % 8) > g(y * 8 + x)) out |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    java.lang.Long.valueOf(out)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "image_ahash", exprs => ImageAHashExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "image_dhash", exprs => ImageDHashExpr(exprs.head), "built-in")
  }

  def aHash(spark: SparkSession, payload: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("image_ahash", payload)
  }

  def dHash(spark: SparkSession, payload: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("image_dhash", payload)
  }
}
