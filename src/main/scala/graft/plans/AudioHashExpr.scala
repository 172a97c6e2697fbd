package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, NullType}

/** Codegen'd perceptual AUDIO fingerprint over a `binary` WAV payload:
  * the energy-envelope hash — decode the PCM samples, split into 64
  * equal time blocks, per-block mean absolute amplitude, bit b set iff
  * block b's energy >= the mean of the 64 (the audio analog of image
  * aHash; energy-envelope fingerprinting is the classic first stage of
  * published audio-ID systems, e.g. the Haitsma-Kalker family's
  * band-energy bits).
  *
  * The DECODE tier is real for 8-bit unsigned PCM mono WAV — a proper
  * RIFF chunk walk (fmt parsed wherever it sits, unknown chunks
  * skipped by their declared size, word-aligned) with hostile-size
  * guards, same minimal-real discipline as
  * [[graft.operators.Multimodal.HeaderCodec]]. Compressed or
  * multi-channel/16-bit audio returns NULL (needs the external codec
  * this environment lacks).
  *
  * Runs as a single static call inside whole-stage codegen
  * ([[SimHash64Expr]]'s escalation); pairs mine through the same
  * Manku chunk-bucket join as image and text hashes.
  */
case class AudioEnvHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_envhash requires a binary argument, got ${other.simpleString}")
  }

  override def nullSafeEval(b: Any): Any =
    AudioHash.envHash64(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      |java.lang.Long ${ev.value}_r = graft.plans.AudioHash.envHash64($b);
      |if (${ev.value}_r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r.longValue(); }
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AudioEnvHashExpr =
    copy(child = newChild)
}

object AudioHash {

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Per-block mean |sample - 128| over 64 equal blocks of the PCM
    * data, or null when the payload is not decodable 8-bit unsigned
    * PCM mono with >= 64 samples. Block b covers samples
    * [floor(b*n/64), floor((b+1)*n/64)) — the box split the image
    * pooling uses.
    */
  def envelope64(b: Array[Byte]): Array[Double] = {
    if (b == null || b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return null
    // chunk walk: fmt and data may sit anywhere after "WAVE", with
    // vendor chunks between — skip unknowns by declared size, guard
    // against truncated/hostile sizes
    var off = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val id = tag(b, off)
      val sz = leInt(b, off + 4)
      if (sz < 0 || off + 8 + sz.toLong > b.length) return null
      if (id == "fmt " && sz >= 16) {
        val codec = leShort(b, off + 8)
        val channels = leShort(b, off + 10)
        val bits = leShort(b, off + 22)
        if (codec != 1 || channels != 1 || bits != 8) return null
        fmtOk = true
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = sz
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0) return null
    val n = dataLen
    if (n < 64) return null
    val out = new Array[Double](64)
    var blk = 0
    while (blk < 64) {
      val from = (blk.toLong * n / 64).toInt
      val until = ((blk + 1).toLong * n / 64).toInt
      var s = 0.0
      var i = from
      while (i < until) {
        s += math.abs((b(dataOff + i) & 0xff) - 128)
        i += 1
      }
      out(blk) = s / (until - from)
      blk += 1
    }
    out
  }

  def envHash64(b: Array[Byte]): java.lang.Long = {
    val e = envelope64(b)
    if (e == null) return null
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += e(i); i += 1 }
    mean /= 64.0
    var out = 0L
    i = 0
    while (i < 64) { if (e(i) >= mean) out |= (1L << i); i += 1 }
    java.lang.Long.valueOf(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "audio_envhash", exprs => AudioEnvHashExpr(exprs.head), "built-in")

  def envHash(spark: SparkSession, payload: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("audio_envhash", payload)
  }
}
