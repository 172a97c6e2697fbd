package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.plans.ImageHash

/** Content-level image dedup: the BMP decode + pooling + aHash/dHash
  * pipeline must recover the planted block designs exactly — including
  * bottom-up row order — and [[Multimodal.imagePairs]] must mine
  * exactly the planted near-dup pairs.
  */
class ImageHashSpec extends SparkSuiteBase {

  private def designBits(docId: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 64) {
      if (Multimodal.bitmapBlockValue(docId, i % 8, i / 8) == 192)
        out |= (1L << i)
      i += 1
    }
    out
  }

  test("pooled8x8 recovers the block design through the BMP bytes") {
    val g = ImageHash.pooled8x8(Multimodal.syntheticBitmap(7L))
    assert(g != null)
    (0 until 64).foreach { i =>
      assert(g(i) === Multimodal.bitmapBlockValue(7L, i % 8, i / 8).toDouble,
        s"cell $i")
    }
  }

  test("aHash equals the design bits for every fixture class") {
    // 0..79 covers all 16 classes and both perturbation arms
    (0L until 80L).foreach { id =>
      val h = ImageHash.aHash64(Multimodal.syntheticBitmap(id))
      assert(h != null && h.longValue() === designBits(id), s"doc $id")
    }
  }

  test("bottom-up row order is decoded, not ignored") {
    // a top-down variant (negative height) of the same image must hash
    // identically; a decoder that ignored row order would scramble any
    // vertically asymmetric design
    val src = Multimodal.syntheticBitmap(3L)
    val flipped = src.clone()
    // negate height (LE int32 at offset 22) and reverse the pixel rows
    val h = 16; val rowBytes = 48; val pixOff = 54
    val negH = -h
    flipped(22) = (negH & 0xff).toByte
    flipped(23) = ((negH >> 8) & 0xff).toByte
    flipped(24) = ((negH >> 16) & 0xff).toByte
    flipped(25) = ((negH >> 24) & 0xff).toByte
    (0 until h).foreach { r =>
      System.arraycopy(src, pixOff + (h - 1 - r) * rowBytes,
        flipped, pixOff + r * rowBytes, rowBytes)
    }
    assert(ImageHash.aHash64(flipped) === ImageHash.aHash64(src))
    assert(ImageHash.dHash64(flipped) === ImageHash.dHash64(src))
    // and the design IS vertically asymmetric: reversing rows without
    // fixing the height sign must change the hash
    val scrambled = src.clone()
    (0 until h).foreach { r =>
      System.arraycopy(src, pixOff + (h - 1 - r) * rowBytes,
        scrambled, pixOff + r * rowBytes, rowBytes)
    }
    assert(ImageHash.aHash64(scrambled) !== ImageHash.aHash64(src))
  }

  test("undecodable payloads hash to null and drop out of pair mining") {
    import spark.implicits._
    // header-only PNG/WAV/MP4 payloads from the metadata fixture are
    // not decodable bitmaps
    val assets = Seq(0L, 1L, 2L).toDF("doc_id")
      .select(col("doc_id").as("asset_id"),
        udf((id: Long) => Multimodal.syntheticPayload(id))
          .apply(col("doc_id")).as("payload"))
    val hashes = Multimodal.imageHashes(assets).collect()
    assert(hashes.forall(r => r.isNullAt(1) && r.isNullAt(2)))
    assert(Multimodal.imagePairs(assets, maxHamming = 3).count() === 0)
  }

  test("codegen expression matches the static computation bit-for-bit") {
    import spark.implicits._
    val assets = Multimodal.syntheticBitmapAssets(
      (0L until 64L).toDF("doc_id").withColumn("lang", lit("en"))
        .withColumn("source", lit("s")))
    val viaExpr = Multimodal.imageHashes(assets).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    (0L until 64L).foreach { id =>
      val b = Multimodal.syntheticBitmap(id)
      assert(viaExpr(id) ===
        ((ImageHash.aHash64(b).longValue(), ImageHash.dHash64(b).longValue())))
    }
  }

  test("imagePairs mines exactly the planted near-dup pairs") {
    import spark.implicits._
    val ids = (0L until 80L)
    val assets = Multimodal.syntheticBitmapAssets(
      ids.toDF("doc_id").withColumn("lang", lit("en"))
        .withColumn("source", lit("s")))
    val got = Multimodal.imagePairs(assets, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // brute-force reference over the design bits
    val expected = (for {
      a <- ids; b <- ids if a < b
      h = java.lang.Long.bitCount(designBits(a) ^ designBits(b))
      if h <= 3
    } yield (a, b) -> h).toMap
    assert(got === expected)
    assert(expected.nonEmpty && expected.values.exists(_ == 0)
      && expected.values.exists(_ == 1))
  }

  test("malformed bitmaps refuse cleanly, never throw") {
    val src = Multimodal.syntheticBitmap(4L)
    // truncated mid-pixel-data
    assert(ImageHash.aHash64(java.util.Arrays.copyOf(src, 200)) == null)
    // truncated mid-header
    assert(ImageHash.aHash64(java.util.Arrays.copyOf(src, 20)) == null)
    // wrong magic
    val magic = src.clone(); magic(0) = 'X'.toByte
    assert(ImageHash.aHash64(magic) == null)
    // unsupported bpp (8-bit palette)
    val bpp = src.clone(); bpp(28) = 8
    assert(ImageHash.aHash64(bpp) == null)
    // compressed (BI_RLE8)
    val comp = src.clone(); comp(30) = 1
    assert(ImageHash.aHash64(comp) == null)
    // hostile pixel offset pointing past the payload
    val off = src.clone(); off(10) = 0x7f
    assert(ImageHash.aHash64(off) == null)
    // hostile huge width: w*3 rows would overrun the buffer
    val wide = src.clone(); wide(20) = 0x7f
    assert(ImageHash.aHash64(wide) == null)
    // hostile width near 2^31/3: w*3 overflows int to a NEGATIVE row
    // size that would pass a naive bounds check and index negatively
    val overflow = src.clone()
    overflow(18) = 0xff.toByte; overflow(19) = 0xff.toByte
    overflow(20) = 0xff.toByte; overflow(21) = 0x2f
    assert(ImageHash.aHash64(overflow) == null)
    // sub-8x8 images cannot pool to an 8x8 grid
    val narrow = src.clone(); narrow(18) = 4
    assert(ImageHash.aHash64(narrow) == null)
    assert(ImageHash.aHash64(null) == null)
    assert(ImageHash.aHash64(Array.emptyByteArray) == null)
  }

  test("dHash separates designs aHash-equal under brightness shift") {
    // dHash depends only on neighbor ORDER: a +20 uniform brightness
    // shift preserves it (and aHash, since the mean shifts equally) —
    // the gradient hash's characteristic invariance
    val src = Multimodal.syntheticBitmap(5L)
    val brighter = src.clone()
    (54 until brighter.length).foreach { i =>
      brighter(i) = math.min(255, (brighter(i) & 0xff) + 20).toByte
    }
    assert(ImageHash.dHash64(brighter) === ImageHash.dHash64(src))
    assert(ImageHash.aHash64(brighter) === ImageHash.aHash64(src))
  }
}
