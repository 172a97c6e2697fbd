package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuiteBase, Tables}

/** Persisted ANN indexes must (1) return exactly what the in-memory
  * operators return, (2) physically scan only the probed partitions,
  * and (3) refuse a config that disagrees with what was persisted.
  */
class SimilarityIndexSpec extends SparkSuiteBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("probe_id", "rnk", "neighbor_id", "cos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet

  test("ivfProbe over a persisted index equals ivfTopK") {
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val dir = tmpDir("ivf-idx")
    SimilarityIndex.buildIvf(corpus, "vec_id", "embedding",
      numCells = 8, dir = dir)
    val probed = SimilarityIndex.ivfProbe(probes, "vec_id", "embedding",
      dir, numCells = 8, nprobe = 2, k = 3)
    val direct = Similarity.ivfTopK(probes, corpus, "vec_id", "embedding",
      numCells = 8, nprobe = 2, k = 3)
    assert(rows(probed) == rows(direct))
  }

  test("ivfProbe scans only the probed cell partitions") {
    val e = Tables.embeddings(spark, sfDir)
    val corpus = e.filter(col("vec_id") >= 10)
    val dir = tmpDir("ivf-prune")
    SimilarityIndex.buildIvf(corpus, "vec_id", "embedding",
      numCells = 8, dir = dir)
    // one probe, nprobe=1 → exactly one cell directory may be read
    val oneProbe = e.filter(col("vec_id") === 0)
    val res = SimilarityIndex.ivfProbe(oneProbe, "vec_id", "embedding",
      dir, numCells = 8, nprobe = 1, k = 3)
    res.collect() // materialize so scan metrics are populated
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // AQE buries executed stages inside QueryStageExec leaves — a flat
    // collect never reaches the scans; recurse through stage plans
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case q: QueryStageExec => scans(q.plan)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case r: ReusedExchangeExec => scans(r.child)
    }.flatten
    val cellScan = scans(res.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("cells")))
    assert(cellScan.nonEmpty,
      s"no cells scan in:\n${res.queryExecution.executedPlan}")
    val partsRead = cellScan.head.metrics("numPartitions").value
    assert(partsRead == 1,
      s"nprobe=1 single probe must read one cell partition, read $partsRead")
  }

  test("trained centroids round-trip through the persisted index") {
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val cents = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding",
      numCells = 4, lloydRounds = 2)
    val dir = tmpDir("ivf-trained")
    SimilarityIndex.buildIvf(corpus, "vec_id", "embedding",
      numCells = 4, dir = dir, centroids = Some(cents))
    val probed = SimilarityIndex.ivfProbe(probes, "vec_id", "embedding",
      dir, numCells = 4, nprobe = 2, k = 3)
    val direct = Similarity.ivfTopK(probes, corpus, "vec_id", "embedding",
      numCells = 4, nprobe = 2, k = 3, centroids = Some(cents))
    assert(rows(probed) == rows(direct),
      "persist/load must not perturb trained centroids (float-exact)")
  }

  test("signBucketProbe over a persisted index equals signBucketTopK") {
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val dir = tmpDir("sb-idx")
    SimilarityIndex.buildSignBucket(corpus, "vec_id", "embedding",
      bits = 8, dir = dir)
    val probed = SimilarityIndex.signBucketProbe(probes, "vec_id",
      "embedding", dir, bits = 8, k = 3)
    val direct = Similarity.signBucketTopK(probes, corpus, "vec_id",
      "embedding", bits = 8, k = 3)
    assert(rows(probed) == rows(direct))
  }

  test("multiTableProbe over a persisted index equals the in-memory operator") {
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val dir = tmpDir("mt-idx")
    SimilarityIndex.buildMultiTable(corpus, "vec_id", "embedding",
      bits = 8, tables = 3, dir = dir)
    val probed = SimilarityIndex.multiTableProbe(probes, "vec_id",
      "embedding", dir, bits = 8, tables = 3, k = 3)
    val direct = Similarity.multiTableSignBucketTopK(probes, corpus,
      "vec_id", "embedding", bits = 8, tables = 3, k = 3)
    assert(rows(probed) == rows(direct))
    // stale tables count fails loudly
    val e1 = intercept[IllegalArgumentException] {
      SimilarityIndex.multiTableProbe(probes, "vec_id", "embedding",
        dir, bits = 8, tables = 2, k = 3)
    }
    assert(e1.getMessage.contains("stale config"))
  }

  test("stale or mismatched config fails loudly") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val dir = tmpDir("idx-stale")
    SimilarityIndex.buildIvf(corpus, "vec_id", "embedding",
      numCells = 8, dir = dir)

    // wrong numCells: the probe's expected config is stale
    val e1 = intercept[IllegalArgumentException] {
      SimilarityIndex.ivfProbe(probes, "vec_id", "embedding",
        dir, numCells = 16, nprobe = 2, k = 3)
    }
    assert(e1.getMessage.contains("stale config"))

    // wrong kind: an IVF index probed as a sign-bucket table
    val e2 = intercept[IllegalArgumentException] {
      SimilarityIndex.signBucketProbe(probes, "vec_id", "embedding",
        dir, bits = 8, k = 3)
    }
    assert(e2.getMessage.contains("expects 'signbucket'"))

    // unknown schema version: a future index must not half-work
    Seq((99, "ivf", 8, 8)).toDF("version", "kind", "param", "dims")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val e3 = intercept[IllegalArgumentException] {
      SimilarityIndex.ivfProbe(probes, "vec_id", "embedding",
        dir, numCells = 8, nprobe = 2, k = 3)
    }
    assert(e3.getMessage.contains("schema version"))
  }

  test("probe vectors of the wrong dimensionality fail loudly") {
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < 10)
      .withColumn("embedding",
        slice(col("embedding"), lit(1), size(col("embedding")) - 2))
    val corpus = e.filter(col("vec_id") >= 10)
    // all three index kinds claim STALE-CONFIG SAFETY over dims — a
    // shorter probe vector must be rejected, not cosined over a prefix
    val ivfDir = tmpDir("idx-dims-ivf")
    SimilarityIndex.buildIvf(corpus, "vec_id", "embedding", 8, ivfDir)
    val e1 = intercept[IllegalArgumentException] {
      SimilarityIndex.ivfProbe(probes, "vec_id", "embedding",
        ivfDir, numCells = 8, nprobe = 2, k = 3)
    }
    assert(e1.getMessage.contains("wrong embedding space"))
    val sbDir = tmpDir("idx-dims-sb")
    SimilarityIndex.buildSignBucket(corpus, "vec_id", "embedding", 6, sbDir)
    val e2 = intercept[IllegalArgumentException] {
      SimilarityIndex.signBucketProbe(probes, "vec_id", "embedding",
        sbDir, bits = 6, k = 3)
    }
    assert(e2.getMessage.contains("wrong embedding space"))
    val mtDir = tmpDir("idx-dims-mt")
    SimilarityIndex.buildMultiTable(corpus, "vec_id", "embedding", 4, 2, mtDir)
    val e3 = intercept[IllegalArgumentException] {
      SimilarityIndex.multiTableProbe(probes, "vec_id", "embedding",
        mtDir, bits = 4, tables = 2, k = 3)
    }
    assert(e3.getMessage.contains("wrong embedding space"))
  }

  test("ivfPqProbe over a persisted index equals ivfPqTopK") {
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < 5)
    val corpus = e.filter(col("vec_id") >= 10)
    val dir = tmpDir("ivfpq-idx")
    SimilarityIndex.buildIvfPq(corpus, "vec_id", "embedding",
      numCells = 8, numSub = 4, numCentroids = 16, dir = dir)
    def adcRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val probed = adcRows(SimilarityIndex.ivfPqProbe(probes,
      "vec_id", "embedding", dir,
      numCells = 8, nprobe = 2, numSub = 4, numCentroids = 16, k = 5))
    val direct = adcRows(ProductQuant.ivfPqTopK(probes, corpus,
      "vec_id", "embedding",
      numCells = 8, nprobe = 2, numSub = 4, numCentroids = 16, k = 5))
    assert(probed == direct)
    // the persisted inverted file holds CODES, not raw vectors — the
    // 64x-compression claim is the layout, not a comment
    val cellsSchema = spark.read.parquet(s"$dir/cells").schema
    assert(cellsSchema.fieldNames.toSet == Set("neighbor_id", "codes", "cell"))
    assert(!cellsSchema.fieldNames.contains("cv"))
  }

  test("ivfPqProbe scans only the probed cell partitions; empty probes short-circuit") {
    val e = Tables.embeddings(spark, sfDir)
    val corpus = e.filter(col("vec_id") >= 10)
    val dir = tmpDir("ivfpq-prune")
    SimilarityIndex.buildIvfPq(corpus, "vec_id", "embedding",
      numCells = 8, numSub = 4, numCentroids = 16, dir = dir)
    val oneProbe = e.filter(col("vec_id") === 0)
    val res = SimilarityIndex.ivfPqProbe(oneProbe, "vec_id", "embedding",
      dir, numCells = 8, nprobe = 1, numSub = 4, numCentroids = 16, k = 3)
    res.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case q: QueryStageExec => scans(q.plan)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case r: ReusedExchangeExec => scans(r.child)
    }.flatten
    val cellScan = scans(res.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("cells")))
    assert(cellScan.nonEmpty)
    assert(cellScan.head.metrics("numPartitions").value == 1,
      "nprobe=1 single probe must read one cell partition")
    val empty = SimilarityIndex.ivfPqProbe(
      e.filter(col("vec_id") < 0), "vec_id", "embedding",
      dir, numCells = 8, nprobe = 2, numSub = 4, numCentroids = 16, k = 3)
    assert(empty.count() == 0)
  }

  test("appendIvfPq deltas equal a from-scratch build; config drift fails loudly") {
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < 5)
    val all = e.filter(col("vec_id") >= 10)
    val base = all.filter(col("vec_id") < 300)
    val d1 = all.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    val d2 = all.filter(col("vec_id") >= 400)
    val v0 = tmpDir("ivfpq-v0"); val v1 = tmpDir("ivfpq-v1")
    val v2 = tmpDir("ivfpq-v2"); val full = tmpDir("ivfpq-full")
    SimilarityIndex.buildIvfPq(base, "vec_id", "embedding",
      numCells = 8, numSub = 4, numCentroids = 16, dir = v0)
    SimilarityIndex.appendIvfPq(d1, "vec_id", "embedding", v0, v1)
    SimilarityIndex.appendIvfPq(d2, "vec_id", "embedding", v1, v2)
    // the maintained index must answer exactly like one built from
    // scratch WITH THE SAME frozen geometry (centroids/codebooks are
    // seeded from the base corpus in both: base holds the smallest ids)
    SimilarityIndex.buildIvfPq(all, "vec_id", "embedding",
      numCells = 8, numSub = 4, numCentroids = 16, dir = full)
    def adcRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    def probe(dir: String) = adcRows(SimilarityIndex.ivfPqProbe(probes,
      "vec_id", "embedding", dir,
      numCells = 8, nprobe = 8, numSub = 4, numCentroids = 16, k = 10))
    assert(probe(v2) == probe(full))
    // stale config refused on every axis
    val e1 = intercept[IllegalArgumentException] {
      SimilarityIndex.ivfPqProbe(probes, "vec_id", "embedding", v2,
        numCells = 8, nprobe = 2, numSub = 8, numCentroids = 16, k = 5)
    }
    assert(e1.getMessage.contains("stale config"))
    val e2 = intercept[IllegalArgumentException] {
      SimilarityIndex.ivfPqProbe(probes, "vec_id", "embedding", v2,
        numCells = 16, nprobe = 2, numSub = 4, numCentroids = 16, k = 5)
    }
    assert(e2.getMessage.contains("stale config"))
  }

  test("buildIvf on a corpus smaller than numCells fails at build time") {
    val e = Tables.embeddings(spark, sfDir)
    val corpus = e.filter(col("vec_id") < 5) // 5 rows, 8 cells requested
    val err = intercept[IllegalArgumentException] {
      SimilarityIndex.buildIvf(corpus, "vec_id", "embedding",
        numCells = 8, dir = tmpDir("idx-small"))
    }
    // the failure names the fix instead of creating an index every
    // subsequent probe rejects
    assert(err.getMessage.contains("shrink numCells"))
  }

  test("appendIvf writes O(1) tail files, never per-cell part-files " +
      "(r17 tick metadata fix); probes read bulk + tail identically") {
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < 10)
    val all = e.filter(col("vec_id") >= 10)
    val base = all.filter(col("vec_id") < 400)
    val delta = all.filter(col("vec_id") >= 400)
    val v0 = tmpDir("ivf-tail-v0"); val v1 = tmpDir("ivf-tail-v1")
    val full = tmpDir("ivf-tail-full")
    SimilarityIndex.buildIvf(base, "vec_id", "embedding",
      numCells = 8, dir = v0)
    SimilarityIndex.appendIvf(delta, "vec_id", "embedding", v0, v1)
    // the tick appended ZERO files to the bulk cells partitions (all
    // hardlink-carried) — the delta landed as tail files whose count
    // is bounded by the delta's task count, not the cell count
    val bulkBefore = HardlinkProbe.dataFiles(s"$v0/cells")
    val bulkAfter = HardlinkProbe.dataFiles(s"$v1/cells")
    assert(bulkAfter.keySet == bulkBefore.keySet,
      "append must not create per-cell part-files in the bulk frame")
    bulkBefore.foreach { case (rel, ino) =>
      assert(bulkAfter.get(rel).contains(ino), s"rewritten: $rel")
    }
    val tailFiles = HardlinkProbe.dataFiles(s"$v1/tail")
    assert(tailFiles.nonEmpty, "delta rows must land in the tail")
    assert(tailFiles.size < 8, // far under one-per-cell
      s"tail should be O(delta tasks) files, got ${tailFiles.size}")
    // probe equality vs a from-scratch build (same frozen geometry:
    // base holds the smallest ids, so centroid seeds coincide)
    SimilarityIndex.buildIvf(all, "vec_id", "embedding",
      numCells = 8, dir = full)
    def rows3(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
    def probe(dir: String) = rows3(SimilarityIndex.ivfProbe(probes,
      "vec_id", "embedding", dir, numCells = 8, nprobe = 8, k = 10))
    assert(probe(v1) == probe(full),
      "tail layout must be result-invisible to probes")
  }
}
