package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch benchmark for the copy-free rotation claim: a SMALL delta
  * tick (1% of the corpus) against a large persisted index — the
  * deployment shape the incremental indexes exist for (q75/q80's 20%
  * fixture delta measures the degenerate everything-touched case).
  * Prints per-tick append seconds for the dedup and curation indexes.
  */
object TinyAppendBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ScaleFixture.verifyManifest(sfDir) // refuse stale decks (r16 VERDICT #5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val base = docs.filter(pmod(col("doc_id"), lit(100)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
    val root = java.nio.file.Files.createTempDirectory("tiny-append").toString

    operators.IncrementalDedup.buildIndex(base, "doc_id", "text", "lang",
      n = 3, threshold = 0.8, maxShingleDocFreq = 1000, dir = s"$root/d0")
    val dedupTimes = (1 to 3).map { i =>
      val t0 = System.nanoTime()
      val a = operators.IncrementalDedup.append(delta, "doc_id", "text",
        "lang", s"$root/d0", s"$root/d$i-out")
      a.labels.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"TINY_DEDUP_APPEND_SECS ${dedupTimes.map(t => f"$t%.2f").mkString(",")}")

    val train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val eval = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val cbase = train.filter(pmod(col("doc_id"), lit(100)) =!= 10)
    val cdelta = train.filter(pmod(col("doc_id"), lit(100)) === 10)
    operators.IncrementalCuration.buildIndex(cbase, eval, "doc_id", "text",
      "lang", Seq("the", "a"), dir = s"$root/c0")
    val curTimes = (1 to 3).map { i =>
      val t0 = System.nanoTime()
      val d = operators.IncrementalCuration.append(cdelta, "doc_id", "text",
        "lang", s"$root/c0", s"$root/c$i-out")
      d.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"TINY_CURATION_APPEND_SECS ${curTimes.map(t => f"$t%.2f").mkString(",")}")

    // chunk-index twin: the id-TOP 1% as the delta (the chunk index
    // contracts id-monotone appends — the crawl-append shape)
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val kCut = maxId - (maxId / 100).max(1L)
    operators.IncrementalChunkDedup.buildIndex(
      docs.filter(col("doc_id") <= kCut), "doc_id", "text", 3, s"$root/k0")
    val chunkTimes = (1 to 3).map { i =>
      val t0 = System.nanoTime()
      val a = operators.IncrementalChunkDedup.append(
        docs.filter(col("doc_id") > kCut), "doc_id", "text",
        s"$root/k0", s"$root/k$i-out")
      a.outputs.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"TINY_CHUNK_APPEND_SECS ${chunkTimes.map(t => f"$t%.2f").mkString(",")}")

    // ANN twin: a 1% vector delta against a persisted IVF index —
    // the StreamingAnnMaintainer tick's cost shape (assign against
    // frozen centroids + hardlink rotation + delta-cell file appends)
    val emb = Tables.embeddings(spark, sfDir)
    val ebase = emb.filter(pmod(col("vec_id"), lit(100)) =!= 0)
    val edelta = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
    val cells = operators.Similarity.autoCells(ebase.count())
    operators.SimilarityIndex.buildIvf(ebase, "vec_id", "embedding",
      cells, s"$root/a0")
    val annTimes = (1 to 3).map { i =>
      val t0 = System.nanoTime()
      operators.SimilarityIndex.appendIvf(edelta, "vec_id", "embedding",
        s"$root/a0", s"$root/a$i-out")
      (System.nanoTime() - t0) / 1e9
    }
    println(f"TINY_ANN_APPEND_SECS ${annTimes.map(t => f"$t%.2f").mkString(",")}")

    // IVF-PQ twin: the same 1% vector delta against the persisted
    // PQ index — encode against frozen codebooks + assign against
    // frozen centroids in one scan, then the same rotation
    operators.SimilarityIndex.buildIvfPq(ebase, "vec_id", "embedding",
      cells, numSub = 4, numCentroids = 16, dir = s"$root/p0")
    val pqTimes = (1 to 3).map { i =>
      val t0 = System.nanoTime()
      operators.SimilarityIndex.appendIvfPq(edelta, "vec_id", "embedding",
        s"$root/p0", s"$root/p$i-out")
      (System.nanoTime() - t0) / 1e9
    }
    println(f"TINY_PQ_APPEND_SECS ${pqTimes.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
