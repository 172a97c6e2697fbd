package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (BASELINE north star): image/audio/video
  * payloads are opaque `binary` columns travelling next to typed
  * metadata; decode / feature-extract run per-partition in batches.
  *
  * The actual codec is STUBBED — this container has no image/audio
  * libraries — behind [[FakeCodec]], a deterministic stand-in, so the
  * Spark-side plumbing (schema contract, partition-batched execution,
  * feature struct shape) is real and tested while the codec body is
  * swappable. At cluster scale the mapPartitions boundary is where a
  * real implementation amortizes model/codec initialization per
  * partition (the same batching role mapInPandas plays in PySpark).
  */
object Multimodal {

  /** Schema contract for a multimodal asset row. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = false)))

  /** Extracted feature row appended by [[extractFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** STUB codec: deterministic pseudo-decode. A real deployment
    * replaces `decode` with an actual image/audio library call; the
    * signature (bytes in, feature struct out, batched per partition)
    * is the part that matters.
    */
  object FakeCodec {
    case class Features(
        nBytes: Int, checksum: Long,
        width: Option[Int], height: Option[Int], durationMs: Option[Long])

    def decode(mediaType: String, payload: Array[Byte]): Features = {
      // ??? <- real codec goes here; deterministic fake below.
      val checksum = payload.foldLeft(1469598103934665603L) { (h, b) =>
        (h ^ (b & 0xff)) * 1099511628211L // FNV-1a, pure JVM arithmetic
      }
      val n = payload.length
      mediaType match {
        case "image" => Features(n, checksum,
          Some(1 + math.abs((checksum % 1024).toInt)),
          Some(1 + math.abs(((checksum >> 10) % 1024).toInt)), None)
        case "audio" | "video" => Features(n, checksum, None, None,
          Some(math.abs(checksum % 3600000L)))
        case _ => Features(n, checksum, None, None, None)
      }
    }
  }

  /** Turn the `documents` fixture into a multimodal asset table: the
    * text bytes stand in for an opaque payload (schema-faithful; the
    * payload is never interpreted as text downstream).
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      // deterministic media type spread across the three kinds
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))

  /** Partition-batched decode → appends a `features` struct. The codec
    * initializes once per partition (the `FakeCodec` object stands in
    * for an expensive model/library handle).
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val outSchema = StructType(assets.schema.fields :+
      StructField("features", featureSchema, nullable = false))
    val enc = Encoders.row(outSchema)
    val idIdx = assets.schema.fieldIndex("asset_id")
    val mtIdx = assets.schema.fieldIndex("media_type")
    val plIdx = assets.schema.fieldIndex("payload")
    val ds: Dataset[Row] = assets.mapPartitions { rows =>
      // per-partition init point for a real codec/model handle
      rows.map { r =>
        val f = FakeCodec.decode(r.getString(mtIdx), r.getAs[Array[Byte]](plIdx))
        Row.fromSeq(r.toSeq :+ Row(f.nBytes, f.checksum,
          f.width.map(Int.box).orNull, f.height.map(Int.box).orNull,
          f.durationMs.map(Long.box).orNull))
      }
    }(enc)
    ds.toDF()
  }

  /** Deterministic frame/chunk sampler: every asset yields
    * ceil(n_bytes / chunkSize) chunk descriptors — the Spark-side
    * shape of frame-sampling a video without decoding it here.
    */
  def sampleChunks(assets: DataFrame, chunkSize: Int): DataFrame =
    assets
      .withColumn("n_bytes", length(col("payload")))
      // guard the empty payload: sequence(0, -1) counts DOWN in Spark
      // (same trap as TextFns.wordShingles) — emit zero chunks instead
      .withColumn("chunk_idx",
        explode(when(col("n_bytes") > 0,
          sequence(lit(0), ceil(col("n_bytes").cast("double") / chunkSize).cast("int") - 1))
          .otherwise(array())))
      .select(col("asset_id"), col("media_type"), col("chunk_idx"),
        col("payload").substr(col("chunk_idx") * chunkSize + 1, lit(chunkSize)).as("chunk"))
}
