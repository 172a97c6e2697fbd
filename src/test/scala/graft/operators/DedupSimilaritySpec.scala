package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.Tables

/** R-19/R-20: the sketch-based near-dup detectors must recall the
  * exact-Jaccard planted pairs, and the bucketed ANN must agree with
  * brute force on the neighbors it does return.
  */
class DedupSimilaritySpec extends SparkSuiteBase {

  private lazy val docs = Tables.documents(spark, sfDir)

  private lazy val exactPairs: Set[(Long, Long)] =
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", n = 3, threshold = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("planted near-duplicates exist in the fixture") {
    assert(exactPairs.nonEmpty)
  }

  test("MinHash-LSH recalls every exact near-dup pair") {
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, estThreshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.subsetOf(lsh),
      s"missed: ${exactPairs.diff(lsh)}")
  }

  test("SimHash recalls all near-dup pairs within its chunk guarantee") {
    // 8 chunks guarantee candidate generation for hamming <= 7; the
    // short synthetic docs put some true near-dups at hamming ~15,
    // which only the exact/MinHash paths are guaranteed to catch.
    import graft.functions.TextFns
    val hashes = docs.select(col("doc_id"),
        TextFns.simhash64(TextFns.tokens(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val guaranteed = exactPairs.filter { case (a, b) =>
      java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 7
    }
    assert(guaranteed.nonEmpty)
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 16)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guaranteed.subsetOf(sim), s"missed: ${guaranteed.diff(sim)}")
  }

  test("exact dedup keeps exactly one row per key, the min tie-break") {
    val ev = Tables.events(spark, sfDir)
    val out = Dedup.exact(ev, Seq("user_id", "event_type"), "event_id")
    val keys = out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(keys == 0)
    val expectMin = ev.groupBy("user_id", "event_type")
      .agg(min("event_id").as("event_id"))
    assert(out.select("user_id", "event_type", "event_id")
      .exceptAll(expectMin).count() == 0)
  }

  test("sign-bucket ANN neighbors are a subset of brute-force candidates with equal cosines") {
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < 5)
    val corpus = e.filter(col("vec_id") >= 5)
    val brute = Similarity.bruteForceTopK(probes, corpus, "vec_id", "embedding", k = 1000)
      .select("probe_id", "neighbor_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bucketed = Similarity.signBucketTopK(probes, corpus, "vec_id", "embedding",
        bits = 4, k = 5).collect()
    assert(bucketed.nonEmpty)
    bucketed.foreach { r =>
      val key = (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))
      assert(brute.contains(key) && math.abs(brute(key) - r.getAs[Double]("cos")) < 1e-9)
    }
  }
}
