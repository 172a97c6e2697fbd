package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Routed-arm recall on CLUSTERABLE data (r16 VERDICT #2): measures
  * the [[operators.Similarity.cellPairsCosine]] scale arm against the
  * exact arm on a corpus with PLANTED mid-cosine clusters
  * ([[ScaleFixture.plantedClusters]]) over a decorrelated deck-style
  * background — the structure the deck fixture lacks (its cross-copy
  * ≥0.4 pairs are decorrelation noise, so q274's 0.07 recall is
  * fixture-bounded and says nothing about real corpora).
  *
  * Corpus: `factor` sign-flip isometry copies of the source
  * embeddings (ScaleFixture's decorrelated background) + `clusters`
  * seeds × `members` planted members in the 0.40–0.90 cosine band.
  * Ground truth = the exact arm at θ=0.4; recall is reported at
  * θ ∈ {0.4, 0.5, 0.6} over ALL ground-truth pairs and over the
  * PLANTED subset (both ids ≥ the planted id base) — the number that
  * answers "does the routed arm find real near-dup structure".
  *
  * Output: one JSON line
  * `{"exact_sec":…,"routed_sec":…,"n_corpus":…,"recall":{"0.4":{"all":…,
  * "planted":…,"n_exact":…,"n_planted":…},…}}`.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *        runMain graft.RecallBench [factor=10 clusters=200 members=30]
  */
object RecallBench {

  private val IdBase = 10000000000L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val factor = if (args.length > 0) args(0).toInt else 10
    val clusters = if (args.length > 1) args(1).toInt else 200
    val members = if (args.length > 2) args(2).toInt else 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // decorrelated background: ScaleFixture's per-copy sign-flip
    // isometry (within-copy geometry preserved, cross-copy dots
    // decorrelate) — the same construction as the measurement decks
    val idStep = 10000000L
    val src = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val background = (0 until factor).map { k =>
      val flipped =
        if (k == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          (x * when(pmod(xxhash64(lit(k), i), lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0))).cast("float"))
      src.select((col("vec_id") + lit(k * idStep)).as("vec_id"),
        flipped.as("embedding"))
    }.reduce(_ unionByName _)

    // planted clusters seeded by the LAST `clusters` source vectors
    // (real corpus geometry, not synthetic directions). The tail —
    // not the head — because smallest-id centroid derivation would
    // otherwise make every cluster seed ITS OWN CENTROID and the
    // untrained recall would read ~1.0 by construction (a first cut
    // of this bench did exactly that: head-seeded recall 0.90, the
    // unbiased spec fixture 0.30).
    val seedVecs = src.orderBy(col("vec_id").desc).limit(clusters)
      .collect().map(_.getSeq[Float](1).toArray).reverse.toSeq
    val planted = ScaleFixture
      .plantedClusters(seedVecs, members, IdBase)
      .toDF("vec_id", "embedding")
    val emb = background.unionByName(planted)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCorpus = emb.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val Sim = operators.Similarity
    // ground truth: the exact arm at the loosest threshold, persisted
    val (exactPairs, exactSec) = timed {
      val p = Sim.broadcastAllPairsCosine(emb, "vec_id", "embedding", 0.4)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    // arm 1 — UNTRAINED (the router's auto default): smallest-id
    // centroids, arbitrary relative to the planted structure
    val (routedAuto, autoSec) = timed {
      val p = Sim.cellPairsCosine(emb, "vec_id", "embedding", 0.4)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    // arm 2 — TRAINED (the SemDeDup deployment shape): Lloyd pulls
    // centroids toward cluster modes, which is exactly what keeps a
    // cluster's members in ONE cell
    val cells = Sim.autoCells(nCorpus)
    val (trained, trainSec) = timed {
      Sim.trainIvfCentroids(emb, "vec_id", "embedding", cells)
        .zipWithIndex.map { case (v, i) => (i, v) }
    }
    val (routedTrained, trainedSec) = timed {
      val p = Sim.cellPairsCosine(emb, "vec_id", "embedding", 0.4,
          numCells = cells, centroids = Some(trained))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    // recall per threshold: the routed pair SET over the exact pair
    // set (cosines are bit-identical by construction — both arms run
    // the same cos6 kernel — so membership is a pair-key semi-join)
    def stats(routed: org.apache.spark.sql.DataFrame, theta: Double)
        : (Long, Long, Long, Long) = {
      val e = exactPairs.filter(col("cos") >= theta)
      val r = routed.filter(col("cos") >= theta)
        .select(col("id_a"), col("id_b"))
      val hit = e.join(r, Seq("id_a", "id_b"), "left_semi")
      val plantedOnly = (f: org.apache.spark.sql.DataFrame) =>
        f.filter(col("id_a") >= IdBase && col("id_b") >= IdBase)
      (e.count(), hit.count(), plantedOnly(e).count(), plantedOnly(hit).count())
    }
    def armJson(routed: org.apache.spark.sql.DataFrame): String =
      Seq(0.4, 0.5, 0.6).map { t =>
        val (ne, nh, np, nph) = stats(routed, t)
        f""""$t%.1f":{"all":${if (ne > 0) f"${nh.toDouble / ne}%.4f" else "null"},"planted":${if (np > 0) f"${nph.toDouble / np}%.4f" else "null"},"n_exact":$ne,"n_planted":$np}"""
      }.mkString("{", ",", "}")
    println("GRAFT_RECALL_RESULT_JSON")
    println(f"""{"exact_sec":$exactSec%.2f,"auto_sec":$autoSec%.2f,"train_sec":$trainSec%.2f,"trained_sec":$trainedSec%.2f,"n_corpus":$nCorpus,"cells":$cells,"factor":$factor,"clusters":$clusters,"members":$members,"recall_auto":${armJson(routedAuto)},"recall_trained":${armJson(routedTrained)}}""")
    spark.stop()
  }
}
