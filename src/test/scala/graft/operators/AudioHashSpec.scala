package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.plans.AudioHash

/** Content-level audio dedup: the WAV chunk walk + envelope hash must
  * recover the planted block designs exactly, survive vendor chunks
  * and hostile sizes, and [[Multimodal.audioPairs]] must mine exactly
  * the planted near-dup pairs.
  */
class AudioHashSpec extends SparkSuiteBase {

  private def designBits(docId: Long): Long = {
    var out = 0L
    var b = 0
    while (b < 64) {
      if (Multimodal.wavBlockAmplitude(docId, b) == 96) out |= (1L << b)
      b += 1
    }
    out
  }

  test("envelope64 recovers the block amplitudes through the WAV bytes") {
    val e = AudioHash.envelope64(Multimodal.syntheticWav(9L))
    assert(e != null)
    (0 until 64).foreach { b =>
      assert(e(b) === Multimodal.wavBlockAmplitude(9L, b).toDouble,
        s"block $b")
    }
  }

  test("envelope hash equals the design bits for every fixture class") {
    // 0..111 covers all 16 classes and both %7 perturbation arms
    (0L until 112L).foreach { id =>
      val h = AudioHash.envHash64(Multimodal.syntheticWav(id))
      assert(h != null && h.longValue() === designBits(id), s"doc $id")
    }
  }

  test("the chunk walk skips vendor chunks and rejects hostile sizes") {
    val src = Multimodal.syntheticWav(3L)
    // splice a vendor chunk ("LIST", 10 bytes + pad) between fmt and
    // data: a decoder that assumes data at offset 36 breaks here
    val vendor = new Array[Byte](8 + 10)
    "LIST".getBytes("US-ASCII").copyToArray(vendor, 0)
    vendor(4) = 10 // LE size
    val spliced = new Array[Byte](src.length + vendor.length)
    System.arraycopy(src, 0, spliced, 0, 36) // RIFF..fmt chunk end
    System.arraycopy(vendor, 0, spliced, 36, vendor.length)
    System.arraycopy(src, 36, spliced, 36 + vendor.length, src.length - 36)
    // fix the RIFF size field
    val riffSz = spliced.length - 8
    spliced(4) = (riffSz & 0xff).toByte
    spliced(5) = ((riffSz >> 8) & 0xff).toByte
    spliced(6) = ((riffSz >> 16) & 0xff).toByte
    spliced(7) = ((riffSz >> 24) & 0xff).toByte
    assert(AudioHash.envHash64(spliced) === AudioHash.envHash64(src))
    // hostile: declared data size overrunning the payload -> null, no
    // exception
    val overrun = src.clone()
    overrun(43) = 0x7f // blow up the data chunk's declared size
    assert(AudioHash.envHash64(overrun) == null)
    // 16-bit / stereo / non-PCM all refuse
    val stereo = src.clone(); stereo(22) = 2
    assert(AudioHash.envHash64(stereo) == null)
    val pcm16 = src.clone(); pcm16(34) = 16
    assert(AudioHash.envHash64(pcm16) == null)
    val mp3ish = src.clone(); mp3ish(20) = 85.toByte
    assert(AudioHash.envHash64(mp3ish) == null)
  }

  test("codegen expression matches the static computation bit-for-bit") {
    import spark.implicits._
    val assets = Multimodal.syntheticWavAssets(
      (0L until 64L).toDF("doc_id").withColumn("lang", lit("en"))
        .withColumn("source", lit("s")))
    val viaExpr = assets.select(col("asset_id"),
        graft.plans.AudioHash.envHash(spark, col("payload")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 64L).foreach { id =>
      assert(viaExpr(id) ===
        AudioHash.envHash64(Multimodal.syntheticWav(id)).longValue())
    }
  }

  test("audioPairs mines exactly the planted near-dup pairs") {
    import spark.implicits._
    val ids = (0L until 112L)
    val assets = Multimodal.syntheticWavAssets(
      ids.toDF("doc_id").withColumn("lang", lit("en"))
        .withColumn("source", lit("s")))
    val got = Multimodal.audioPairs(assets, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val expected = (for {
      a <- ids; b <- ids if a < b
      h = java.lang.Long.bitCount(designBits(a) ^ designBits(b))
      if h <= 3
    } yield (a, b) -> h).toMap
    assert(got === expected)
    assert(expected.values.exists(_ == 0) && expected.values.exists(_ == 1))
    // header-only WAV payloads (the q41 metadata fixture) hash to null
    val headerOnly = Seq(1L).toDF("doc_id")
      .select(col("doc_id").as("asset_id"),
        udf((id: Long) => Multimodal.syntheticPayload(id))
          .apply(col("doc_id")).as("payload"))
    assert(Multimodal.audioPairs(headerOnly, maxHamming = 3).count() === 0)
  }
}
