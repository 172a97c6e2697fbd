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
}
