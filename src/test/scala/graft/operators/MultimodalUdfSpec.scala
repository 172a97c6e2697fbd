package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.Tables
import graft.functions.{OffsetSample, SparseSamplerAgg, Udfs, VectorFns}

/** Multimodal plumbing (stubbed codec, real schema/partitioning) and
  * the U-1/U-2 escape-hatch surface.
  */
class MultimodalUdfSpec extends SparkSuiteBase {

  import spark.implicits._

  test("multimodal: asset schema, deterministic stub decode, re-run stable") {
    val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, sfDir))
    // contract check: names + types (nullability follows the source)
    assert(assets.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.assetSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val feats = Multimodal.extractFeatures(assets)
    val n = feats.count()
    assert(n == 500)
    // media-type-dependent feature shape
    val byType = feats.groupBy(col("media_type"))
      .agg(count(when(col("features.width").isNotNull, 1)).as("w"),
        count(when(col("features.duration_ms").isNotNull, 1)).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byType("image")._1 > 0 && byType("image")._2 == 0)
    assert(byType("audio")._1 == 0 && byType("audio")._2 > 0)
    // deterministic: two runs, identical checksums
    val a = feats.select("asset_id", "features.checksum").collect().toSeq
    val b = Multimodal.extractFeatures(assets)
      .select("asset_id", "features.checksum").collect().toSeq
    assert(a.toSet == b.toSet)
  }

  test("multimodal: chunk sampler covers every byte exactly once") {
    val assets = Multimodal.assetsFromDocuments(
      Tables.documents(spark, sfDir).limit(20))
    val chunks = Multimodal.sampleChunks(assets, chunkSize = 64)
    val reassembled = chunks
      .groupBy(col("asset_id"))
      .agg(sum(length(col("chunk"))).as("total"))
    val orig = assets.select(col("asset_id"), length(col("payload")).as("n"))
    assert(reassembled.join(orig, "asset_id")
      .filter(col("total") =!= col("n")).count() == 0)
  }

  // ---- synthesized real container headers (pure bytes, no media libs)

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13) // IHDR length
    bb.put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w).putInt(h)
    bb.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.array()
  }

  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54).putInt(0).putInt(54) // file size, reserved, data offset
    bb.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER
    bb.array()
  }

  private def wavBytes(byteRate: Int, dataSize: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(1) // PCM, mono
    bb.putInt(byteRate / 2).putInt(byteRate) // sample rate, byte rate
    bb.putShort(2).putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    bb.array()
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(30)
    bb.put(0xff.toByte).put(0xd8.toByte) // SOI
    // APP0 segment (len 6: 2 length bytes + 4 payload)
    bb.put(0xff.toByte).put(0xe0.toByte).putShort(6).putInt(0)
    // SOF0: len 11, precision, height BE, width BE, components
    bb.put(0xff.toByte).put(0xc0.toByte).putShort(11)
    bb.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
    bb.array()
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("US-ASCII"))
    bb.putShort(w.toShort).putShort(h.toShort)
    bb.array()
  }

  test("multimodal: JPEG and GIF dimensions parse from raw headers") {
    val j = Multimodal.FakeCodec.decode("image", jpegBytes(800, 600))
    assert(j.width.contains(800) && j.height.contains(600))
    val g = Multimodal.FakeCodec.decode("image", gifBytes(320, 240))
    assert(g.width.contains(320) && g.height.contains(240))
    // malformed JPEG (zero segment length) terminates and falls back
    val bad = jpegBytes(1, 1)
    bad(4) = 0; bad(5) = 0 // APP0 length = 0
    val f = Multimodal.FakeCodec.decode("image", bad)
    assert(f.nBytes == bad.length) // no hang, deterministic fallback
  }

  test("multimodal: JPEG fill bytes and standalone markers don't lose sync") {
    // SOI, TEM (standalone, no length), RST0 (standalone), a 0xFF fill
    // byte run before SOF0 — all legal, all previously parsed as
    // garbage segment lengths
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.put(0xff.toByte).put(0xd8.toByte) // SOI
    bb.put(0xff.toByte).put(0x01.toByte) // TEM
    bb.put(0xff.toByte).put(0xd0.toByte) // RST0
    bb.put(0xff.toByte).put(0xff.toByte).put(0xc0.toByte) // fill + SOF0
    bb.putShort(11.toShort)
    bb.put(8.toByte).putShort(600.toShort).putShort(800.toShort)
    assert(Multimodal.HeaderCodec.jpeg(bb.array()).contains((800, 600)))
  }

  test("multimodal: hostile JPEG inputs never crash, hang, or misparse") {
    val hc = Multimodal.HeaderCodec
    // truncated mid-SOF: length word present, dims cut off
    assert(hc.jpeg(jpegBytes(800, 600).take(18)).isEmpty)
    // truncated mid-length-word
    assert(hc.jpeg(jpegBytes(800, 600).take(11)).isEmpty)
    // bare SOI, SOI+EOI only
    assert(hc.jpeg(Array(0xff, 0xd8).map(_.toByte)).isEmpty)
    assert(hc.jpeg(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    // lost marker sync (non-FF where a marker must start)
    assert(hc.jpeg(Array(0xff, 0xd8, 0x00, 0xc0).map(_.toByte)).isEmpty)
    // segment length pointing past the buffer walks off cleanly
    val over = jpegBytes(800, 600)
    over(4) = 0x7f; over(5) = 0xff.toByte // APP0 claims 32 KB
    assert(hc.jpeg(over).isEmpty)
    // DHT (0xC4) must NOT be taken for a SOF even though it's in C0-CF
    val dht = java.nio.ByteBuffer.allocate(16)
    dht.put(0xff.toByte).put(0xd8.toByte)
    dht.put(0xff.toByte).put(0xc4.toByte).putShort(11)
    dht.put(8.toByte).putShort(600.toShort).putShort(800.toShort).put(3.toByte)
    assert(hc.jpeg(dht.array().take(15)).isEmpty)
    // not a JPEG at all / empty
    assert(hc.jpeg(Array.empty[Byte]).isEmpty)
    assert(hc.jpeg("plain text".getBytes("UTF-8")).isEmpty)
  }

  test("multimodal: synthetic JPEG fixtures parse to the q161 oracle formulas") {
    Seq(0L, 1L, 7L, 1234L, 99999L).foreach { id =>
      val b = Multimodal.syntheticJpeg(id)
      assert(b.length == 45 + (id % 5).toInt)
      // SOF marker alternates baseline/progressive by parity
      val f = Multimodal.FakeCodec.decode("image", b)
      assert(f.headerParsed, s"id=$id must header-parse")
      assert(f.width.contains((1 + (id * 3) % 2048).toInt), s"id=$id width")
      assert(f.height.contains((1 + (id * 11) % 1536).toInt), s"id=$id height")
    }
  }

  test("multimodal: synthetic doc_id payloads parse to the oracle formulas") {
    // the q41 contract: real codecs fire and extract pure doc_id
    // arithmetic, flagged header_parsed
    Seq(3L, 600L, 1023L).foreach { id => // image ids (id%3==0)
      val f = Multimodal.FakeCodec.decode("image", Multimodal.syntheticPayload(id))
      assert(f.headerParsed && f.width.contains(1 + (id % 1024).toInt)
        && f.height.contains(1 + ((id * 7) % 768).toInt))
    }
    Seq(1L, 4L, 2050L).foreach { id => // audio ids (id%3==1)
      val f = Multimodal.FakeCodec.decode("audio", Multimodal.syntheticPayload(id))
      assert(f.headerParsed && f.durationMs.contains((id % 977) * 20))
    }
    Seq(2L, 1535L).foreach { id => // video ids (id%3==2): real MP4
      val f = Multimodal.FakeCodec.decode("video", Multimodal.syntheticPayload(id))
      assert(f.headerParsed && f.durationMs.contains((id % 997) * 40)
        && f.width.isEmpty && f.height.isEmpty)
    }
    // the fake tier is flagged as fabricated
    val fake = Multimodal.FakeCodec.decode("image", "opaque".getBytes("UTF-8"))
    assert(!fake.headerParsed)
  }

  test("multimodal: real PNG/BMP/WAV headers round-trip through extractFeatures") {
    val rows = Seq(
      (1L, "image", pngBytes(640, 480), Map.empty[String, String]),
      (2L, "image", bmpBytes(320, 200), Map.empty[String, String]),
      // 16000 B/s, 48000 bytes of audio = exactly 3000 ms
      (3L, "audio", wavBytes(16000, 48000), Map.empty[String, String]))
    val assets = rows.toDF("asset_id", "media_type", "payload", "meta")
    val out = Multimodal.extractFeatures(assets)
      .select(col("asset_id"), col("features.width"), col("features.height"),
        col("features.duration_ms"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(1L) == ((Some(640), Some(480), None)))
    assert(out(2L) == ((Some(320), Some(200), None)))
    assert(out(3L) == ((None, None, Some(3000L))))
  }

  test("multimodal: MP4 mvhd duration parses for v0, v1, and largesize boxes; hostile sizes terminate") {
    import Multimodal.HeaderCodec
    def ftyp = {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
        .put("isom".getBytes("US-ASCII")).putInt(0)
      bb.array()
    }
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    // v0 mvhd: timescale 600 units/s, duration 1200 units = 2000 ms
    val mvhdV0 = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0).putInt(600).putInt(1200)
      bb.array()
    }
    assert(HeaderCodec.mp4(ftyp ++ box("moov", box("mvhd", mvhdV0)))
      .contains(2000L))
    // v1 mvhd: 64-bit times; timescale 1000, duration 777
    val mvhdV1 = {
      val bb = java.nio.ByteBuffer.allocate(112)
      bb.putInt(0x01000000) // version 1
      bb.putLong(0L).putLong(0L).putInt(1000).putLong(777L)
      bb.array()
    }
    assert(HeaderCodec.mp4(ftyp ++ box("moov", box("mvhd", mvhdV1)))
      .contains(777L))
    // a preceding largesize (size=1 + 64-bit) box is skipped correctly
    val free = {
      val bb = java.nio.ByteBuffer.allocate(24)
      bb.putInt(1).put("free".getBytes("US-ASCII")).putLong(24L).putLong(0L)
      bb.array()
    }
    assert(HeaderCodec.mp4(ftyp ++ free ++ box("moov", box("mvhd", mvhdV0)))
      .contains(2000L))
    // hostile: zero/short box sizes stop the walk, no hang, no parse
    val hostile = {
      val bb = java.nio.ByteBuffer.allocate(24)
      bb.put(ftyp).putInt(3).put("junk".getBytes("US-ASCII"))
      bb.array()
    }
    assert(HeaderCodec.mp4(hostile).isEmpty)
    // hostile: a 64-bit largesize near Long.MaxValue used to overflow
    // `o + large` negative, pass the loop bound and throw
    // ArrayIndexOutOfBoundsException out of the sniffer (round-5
    // advisor finding) — it must terminate as a clean non-parse, at
    // the TOP level and inside the moov child walk alike
    val overflowTop = {
      val bb = java.nio.ByteBuffer.allocate(24)
      bb.put(ftyp).putInt(1).put("mdat".getBytes("US-ASCII"))
      bb.array() ++ {
        val b2 = java.nio.ByteBuffer.allocate(8)
        b2.putLong(Long.MaxValue - 7L); b2.array()
      }
    }
    assert(HeaderCodec.mp4(overflowTop).isEmpty)
    val overflowChild = {
      val inner = java.nio.ByteBuffer.allocate(16)
      inner.putInt(1).put("trak".getBytes("US-ASCII"))
        .putLong(Long.MaxValue - 7L)
      ftyp ++ box("moov", inner.array())
    }
    assert(HeaderCodec.mp4(overflowChild).isEmpty)
    // zero timescale never divides
    val mvhdZeroTs = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0).putInt(0).putInt(1200)
      bb.array()
    }
    assert(HeaderCodec.mp4(ftyp ++ box("moov", box("mvhd", mvhdZeroTs))).isEmpty)
    // extractFeatures end to end: a real MP4 asset carries its duration
    val rows = Seq((9L, "video", ftyp ++ box("moov", box("mvhd", mvhdV0)),
      Map.empty[String, String]))
    val out = Multimodal.extractFeatures(
        rows.toDF("asset_id", "media_type", "payload", "meta"))
      .select(col("features.duration_ms"), col("features.header_parsed"))
      .collect().head
    assert(out.getLong(0) == 2000L && out.getBoolean(1))
  }

  test("multimodal: malformed WAV chunk sizes terminate (no hang) and fall back") {
    // a chunk whose 32-bit size is 0xFFFFFFF8 (-8 as Int) must not
    // stall the chunk walker
    val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("junk".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
    val f = Multimodal.FakeCodec.decode("audio", bb.array())
    // falls through to the deterministic fake (no parseable duration)
    assert(f.nBytes == 64 && f.durationMs.nonEmpty)
  }

  test("multimodal: header sniffing is magic-byte-driven, unknown bytes fall back") {
    // a WAV payload declared as "image" still parses as WAV (bytes win
    // over the declared media type)
    val f = Multimodal.FakeCodec.decode("image", wavBytes(8000, 8000))
    assert(f.durationMs.contains(1000L) && f.width.isEmpty)
    // opaque bytes fall back to the deterministic fake path
    val g = Multimodal.FakeCodec.decode("image", "not a container".getBytes("UTF-8"))
    assert(g.width.nonEmpty && g.height.nonEmpty)
  }

  test("int8 quantization: dequantized error bounded by scale/2 per component") {
    val e = Tables.embeddings(spark, sfDir)
    val sc = VectorFns.int8Scale(col("embedding"))
    val bad = e.select(col("vec_id"), sc.as("scale"),
        col("embedding"),
        VectorFns.quantizeInt8(col("embedding"), sc).as("q"))
      .select(col("vec_id"), col("scale"),
        // max |x - q*scale| over components
        aggregate(zip_with(col("embedding"), col("q"),
            (x, q) => abs(x.cast("double") - q.cast("double") * col("scale"))),
          lit(0.0), (acc, d) => greatest(acc, d)).as("maxerr"),
        // codes stay inside int8 range
        aggregate(col("q"), lit(0), (acc, q) => greatest(acc, abs(q))).as("maxcode"))
      .filter(col("maxerr") > col("scale") * 0.5 + lit(1e-12)
        || col("maxcode") > 127)
      .count()
    assert(bad == 0)
  }

  test("PII redaction removes every email/phone match and counts them") {
    import spark.implicits._
    val rows = Seq(
      (1L, "mail a.b-c_d@ex.co and x@y.org now"),
      (2L, "call +12 345-678 901 soon"),
      (3L, "nothing here"),
      (4L, "mixed bob@corp.example then 123-456-7890")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(rows, "doc_id", "text")
      .select(col("doc_id"), col("redacted"),
        col("n_emails").cast("long"), col("n_phones").cast("long"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("mail [EMAIL] and [EMAIL] now", 2L, 0L)))
    assert(out(2L) == (("call [PHONE] soon", 0L, 1L)))
    assert(out(3L) == (("nothing here", 0L, 0L)))
    assert(out(4L) == (("mixed [EMAIL] then [PHONE]", 1L, 1L)))
    // redacted text never retains a match
    assert(!out.values.exists(v =>
      v._1.matches(s".*${TextAnalysis.emailPattern}.*")))
  }

  test("U-1: cosine UDF agrees with the codegen formulation") {
    Udfs.register(spark)
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val pairs = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("embedding").as("vb")))
      .filter(col("ida") < col("idb")).limit(200)
    val diff = pairs.select(
        abs(Udfs.cosineUdf(col("va"), col("vb")) -
          VectorFns.cosine(VectorFns.toDoubleArray(col("va")),
            VectorFns.toDoubleArray(col("vb")))).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(diff < 1e-12)
  }

  test("U-2: SparseSamplerAgg matches OffsetIndex.sparseSample keep-first rule") {
    val rnd = new scala.util.Random(7)
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val samples = (1 to 300).map { i =>
      OffsetSample(base + rnd.nextInt(10 * 60000), i.toLong, rnd.nextInt(100).toLong,
        i.toLong + 1000, 0L)
    }
    val samplerFn = udaf(SparseSamplerAgg)
    val viaAgg = samples.toDS()
      .select(samplerFn(col("tsMillis"), col("srcLedger"),
        col("srcEntry"), col("dstLedger"), col("dstEntry")).as("out"))
      .select(explode(col("out.samples")).as("s"))
      .select(col("s.srcLedger"), col("s.srcEntry"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaDf = graft.streaming.OffsetIndex.sparseSample(
        samples.toDF()
          .withColumn("topic", lit("t")).withColumn("partition", lit(0))
          .withColumn("recordedTs", timestamp_millis(col("tsMillis"))),
        retentionMinutes = 100000)
      .select(col("srcLedger"), col("srcEntry"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaAgg == viaDf)
  }

  test("multimodal: synthetic GIF fixtures walk to the q167 oracle formulas") {
    Seq(0L, 1L, 2L, 3L, 6L, 7L, 41L, 1234L, 99999L).foreach { id =>
      val b = Multimodal.syntheticGif(id)
      val f = Multimodal.FakeCodec.decode("image", b)
      assert(f.headerParsed, s"id=$id must header-parse")
      assert(f.width.contains((1 + (id * 5) % 1024).toInt), s"id=$id width")
      assert(f.height.contains((1 + (id * 13) % 512).toInt), s"id=$id height")
      assert(f.nFrames.contains((1 + id % 7).toInt),
        s"id=$id frames: got ${f.nFrames}")
    }
    // non-GIF containers carry no frame count
    assert(Multimodal.FakeCodec.decode("image",
      Multimodal.syntheticJpeg(5L)).nFrames.isEmpty)
  }

  test("multimodal: hostile GIF inputs never crash, hang, or misparse") {
    val hc = Multimodal.HeaderCodec
    val good = Multimodal.syntheticGif(10L)
    assert(hc.gifFrames(good).contains(4))
    // truncated anywhere: every prefix either parses to None or a
    // smaller frame count — never throws, never loops
    (0 until good.length).foreach { n =>
      val got = hc.gifFrames(good.take(n))
      assert(got.forall(_ <= 4), s"prefix $n gave $got")
    }
    // no trailer: the walk must not report a count
    assert(hc.gifFrames(good.dropRight(1)).isEmpty)
    // unknown block type byte where a block should start (odd id: no
    // global color table, so offset 13 IS the first block)
    val bad = Multimodal.syntheticGif(1L); bad(13) = 0x77
    assert(hc.gifFrames(bad).isEmpty)
    // sub-block length pointing past the end
    val overrun = good.take(20) ++ Array(0x21.toByte, 0xfe.toByte, 0xff.toByte)
    assert(hc.gifFrames(overrun).isEmpty)
    // not a GIF at all
    assert(hc.gifFrames("plain text".getBytes("UTF-8")).isEmpty)
    assert(hc.gifFrames(Array.empty[Byte]).isEmpty)
  }

  test("multimodal: mp3 walk round-trips every synthetic variation") {
    val hc = Multimodal.HeaderCodec
    // ids sweep bitrates, samplerates, ID3 prefix/trailer, padding
    for (id <- 0L to 120L) {
      val b = Multimodal.syntheticMp3(id)
      val got = hc.mp3(b)
      val frames = (1 + id % 5).toInt
      val sr = Array(44100, 48000, 32000)((id % 3).toInt)
      val want = (frames.toLong * 1152L * 1000L / sr, frames)
      assert(got.contains(want), s"id=$id got $got want $want")
    }
  }

  test("multimodal: hostile MP3 inputs never crash, hang, or misparse") {
    val hc = Multimodal.HeaderCodec
    val good = Multimodal.syntheticMp3(1L)
    // truncated mid-frame
    assert(hc.mp3(good.take(good.length - 3)).isEmpty)
    // trailing garbage that is neither EOF nor an ID3v1 trailer
    assert(hc.mp3(good ++ Array[Byte](1, 2, 3)).isEmpty)
    // free (0) and invalid (15) bitrate indices
    def hdr(b2: Int): Array[Byte] =
      Array(0xff, 0xfb, b2, 0).map(_.toByte) ++ new Array[Byte](92)
    assert(hc.mp3(hdr(0x00 << 4)).isEmpty)
    assert(hc.mp3(hdr(0xf0)).isEmpty)
    // reserved samplerate index 3
    assert(hc.mp3(hdr((1 << 4) | (3 << 2))).isEmpty)
    // MPEG-2 version bits / wrong layer
    assert(hc.mp3(Array(0xff, 0xf3, 0x10, 0).map(_.toByte) ++
      new Array[Byte](200)).isEmpty)
    assert(hc.mp3(Array(0xff, 0xfd, 0x10, 0).map(_.toByte) ++
      new Array[Byte](200)).isEmpty)
    // ID3v2 size overrunning the buffer; plain text; empty
    assert(hc.mp3("ID3junkjunk".getBytes("US-ASCII")).isEmpty)
    assert(hc.mp3("plain text".getBytes("UTF-8")).isEmpty)
    assert(hc.mp3(Array.empty[Byte]).isEmpty)
    // a second frame at a different samplerate is rejected
    val f44 = Multimodal.syntheticMp3(1L) // sr idx 1 → 48000
    val mixed = f44 ++ Array(0xff, 0xfb, (1 << 4) | (0 << 2), 0)
      .map(_.toByte) ++ new Array[Byte](96)
    assert(hc.mp3(mixed).isEmpty)
  }
}
