package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.Tables

/** The scale utilities must change the PLAN the way they claim
  * (no-shuffle bucketed join) without changing RESULTS (salting).
  */
class ScaleOpsSpec extends SparkSuiteBase {

  test("bucketed join has no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      ScaleOps.writeBucketed(
        Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b", "o_orderkey", buckets = 8)
      ScaleOps.writeBucketed(
        Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", "o_orderkey", buckets = 8)
      val joined = ScaleOps.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it's still correct
      val expected = Tables.orders(spark, sfDir).join(
        Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("prefixSumByRange auto-sizes partitions from input stats") {
    // 600k (long, long, long) rows x 24 B schema width ≈ 14 MiB — past
    // 16 x 1 MiB — so with the single-task gate DISABLED the auto path
    // (numParts <= 0) must pick more than 16 range partitions BY
    // ITSELF (the floor here is this suite's shuffle.partitions = 4,
    // so the size term decides), the round-5 fix for sharding a
    // growing corpus into fixed-32 single-task sorts
    val df = spark.range(600000).toDF("id").withColumn("v", lit(1L))
    val auto = ScaleOps.prefixSumByRange(df, Seq("id"), col("v"), "pfx",
      maxSingleTaskBytes = 0)
    assert(auto.rdd.getNumPartitions > 16,
      s"auto picked ${auto.rdd.getNumPartitions} partitions")
    // sizing must never leak into the values: auto, a fixed count, and
    // the single-task fast path (this frame is under the default
    // 32 MiB gate) produce the identical prefix function
    val fixed = ScaleOps.prefixSumByRange(df, Seq("id"), col("v"), "pfx",
      numParts = 5)
    val fast = ScaleOps.prefixSumByRange(df, Seq("id"), col("v"), "pfx")
    assert(fast.rdd.getNumPartitions == 1,
      s"gate-sized input took ${fast.rdd.getNumPartitions} partitions")
    def probe(d: org.apache.spark.sql.DataFrame) =
      d.where(col("id") % 1000 === 0)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(probe(auto) == probe(fixed), "prefix diverges across sizing")
    assert(probe(auto) == probe(fast), "fast path diverges")
    // a small input above the gate stays at the session floor — no
    // pointless fan-out
    val small = spark.range(100).toDF("id").withColumn("v", lit(1L))
    val smallParts = ScaleOps.prefixSumByRange(small, Seq("id"), col("v"),
        "pfx", maxSingleTaskBytes = 0)
      .rdd.getNumPartitions
    assert(smallParts == spark.sessionState.conf.numShufflePartitions,
      s"small input picked $smallParts")
  }

  test("salted join equals unsalted join") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("p_partkey"), col("l_quantity"))
    val part = Tables.part(spark, sfDir).select("p_partkey", "p_brand")
    val plain = li.join(part, "p_partkey")
      .groupBy("p_brand").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = ScaleOps.saltedJoin(li, part, "p_partkey", salts = 4)
      .groupBy("p_brand").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - plain(k)) < 1e-6) }
  }

  test("zorder interleave: known bit patterns and bounds") {
    import graft.plans.ZOrderExpr
    // a-bits land at even positions, b-bits at odd
    assert(ZOrderExpr.interleave(0L, 0L) == 0L)
    assert(ZOrderExpr.interleave(1L, 0L) == 1L)
    assert(ZOrderExpr.interleave(0L, 1L) == 2L)
    assert(ZOrderExpr.interleave(3L, 0L) == 5L)    // 0b101
    assert(ZOrderExpr.interleave(0L, 3L) == 10L)   // 0b1010
    assert(ZOrderExpr.interleave(5L, 3L) == 27L)   // 0b11011
    // 16 bits per dim: max input fills 32 z-bits
    assert(ZOrderExpr.interleave(65535L, 65535L) == 0xFFFFFFFFL)
    // bits above the width are masked, not smeared
    assert(ZOrderExpr.interleave(65536L, 0L) == 0L)
    // codegen/eval agreement through the SQL surface
    import spark.implicits._
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(graft.plans.ZOrderExpr.zorder(spark, col("a"), col("b")))
      .collect()(0).getLong(0)
    assert(got == 27L)
  }

  test("zorder layout: 2-D selections prune to few files, 1-D sort layout cannot") {
    import spark.implicits._
    // uniform 128x128 grid: every (x, y) cell once
    val grid = (0 until 128).flatMap(x => (0 until 128).map(y =>
      (x.toLong * 128 + y, x.toLong, y.toLong))).toDF("id", "x", "y")
    val laid = ScaleOps.zorderLayout(grid, "x", "y", bins = 1024, numFiles = 64)
      .select(col("x"), col("y"), col("file")).cache()
    try {
      // all 64 files used, sizes exactly balanced on the uniform grid
      val sizes = laid.groupBy("file").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sizes.size == 64, s"used ${sizes.size} files")
      assert(sizes.values.forall(_ == 128L * 128 / 64), s"sizes $sizes")
      // a 16x16 rectangle (1/8 of each dim) touches at most 4 files:
      // file boxes are a 8x8 grid of 16x16 rectangles, so an aligned
      // query hits 1, any unaligned one at most 2x2
      val touched = laid
        .where(col("x").between(37, 52) && col("y").between(81, 96))
        .select("file").distinct().count()
      assert(touched <= 4, s"z-layout touched $touched files")
      // the same selection on an x-sorted layout touches every file
      // holding the x-range — but a y-only selection hits ALL files
      val xSorted = grid.withColumn("file",
        floor(col("x") * 64 / 128).cast("long"))
      val yTouched = xSorted.where(col("y").between(81, 96))
        .select("file").distinct().count()
      assert(yTouched == 64, s"x-sorted layout touched $yTouched for y-query")
      val zyTouched = laid.where(col("y").between(81, 96))
        .select("file").distinct().count()
      assert(zyTouched <= 16, s"z-layout touched $zyTouched for y-query")
    } finally { laid.unpersist(); () }
  }

  test("hot-key salted join: identical multiset, targeted replication") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("p_partkey"), col("l_quantity"))
    val part = Tables.part(spark, sfDir).select("p_partkey", "p_brand")
    val thr = 35L
    val salts = 8
    // full multiset equality with the plain join, not just aggregates
    def multiset(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("p_partkey", "p_brand", "l_quantity").count()
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
        .toSet
    val plain = li.join(part, "p_partkey")
    val salted = ScaleOps.hotKeySaltedJoin(li, part, "p_partkey", salts, thr)
    assert(multiset(salted) == multiset(plain))

    // replication is TARGETED: the salted small side carries exactly
    // |hot| * (salts - 1) extra rows, nothing for cold keys
    val hotKeys = li.groupBy("p_partkey").count()
      .where(col("count") >= thr).collect().map(_.getLong(0)).toSet
    assert(hotKeys.nonEmpty && hotKeys.size < 2000,
      s"fixture should have a proper hot subset, got ${hotKeys.size}")
    val hot = org.apache.spark.sql.functions.broadcast(
      li.groupBy(col("p_partkey")).agg(count(lit(1)).as("__c"))
        .where(col("__c") >= thr)
        .select(col("p_partkey"), lit(true).as("__hot")))
    val smallSalted = part.join(hot, Seq("p_partkey"), "left")
      .withColumn("__salt",
        explode(when(col("__hot"), sequence(lit(0), lit(salts - 1)))
          .otherwise(array(lit(0)))))
    assert(smallSalted.count() == part.count() + hotKeys.size * (salts - 1))

    // a hot key's big-side rows actually spread over more than one salt
    val someHot = hotKeys.head
    val spread = li.where(col("p_partkey") === someHot)
      .withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
      .select("__salt").distinct().count()
    assert(spread > 1, s"hot key $someHot spread over $spread salts")
  }

  test("hot-key salted join degenerates cleanly when nothing is hot") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("p_partkey"), col("l_quantity"))
    val part = Tables.part(spark, sfDir).select("p_partkey", "p_brand")
    val salted = ScaleOps.hotKeySaltedJoin(
      li, part, "p_partkey", salts = 8, hotThreshold = Long.MaxValue)
    assert(salted.count() == li.join(part, "p_partkey").count())
  }

  test("salted aggregation equals direct aggregation") {
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy("user_id").agg(sum("value").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = ScaleOps.saltedSumAgg(ev, "user_id", "value", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - direct(k)) < 1e-6) }
  }

  test("bloom-pruned join equals the plain join, multiset-exact") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("p_partkey"), col("l_quantity"))
    val dim = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#4").select("p_partkey")
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("p_partkey", "l_quantity").count()
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSet
    val plain = li.join(dim, "p_partkey")
    val bloomed = ScaleOps.bloomPrunedJoin(li, dim, "p_partkey")
    assert(multiset(bloomed) == multiset(plain))
    // and at a deliberately tiny m (heavy false positives) the exact
    // join must still scrub every FP — correctness never rides the
    // filter's accuracy
    val fpHeavy = ScaleOps.bloomPrunedJoin(li, dim, "p_partkey", m = 64, k = 2)
    assert(multiset(fpHeavy) == multiset(plain))
  }

  test("bloom prune really filters the fact side before the join") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("p_partkey"), col("l_quantity"))
    val dim = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#4").select("p_partkey")
    // the pruned fact row count sits between the true match count and
    // the full fact count — i.e. the semi-joins actually dropped the
    // bulk of the non-matching rows at the default m (FP rate << 1)
    def laneBit(i: Int) =
      pmod(xxhash64(lit(i), col("p_partkey")), lit((1 << 20).toLong))
    val bits = dim.select(col("p_partkey")).distinct()
      .select(explode(array((0 until 4).map(laneBit): _*)).as("bit"))
      .distinct()
    val pruned = (0 until 4).foldLeft(li) { case (df, i) =>
      df.withColumn(s"__bit$i", laneBit(i))
        .join(broadcast(bits.withColumnRenamed("bit", s"__bit$i")),
          Seq(s"__bit$i"), "left_semi")
        .drop(s"__bit$i")
    }
    val trueMatches = li.join(dim, "p_partkey").count()
    val prunedCount = pruned.count()
    assert(prunedCount >= trueMatches)
    assert(prunedCount < li.count() / 2,
      s"prune kept $prunedCount of ${li.count()} fact rows — filter inert?")
    // plan shape: the prune is broadcast semi-joins, no extra exchange
    // on the fact path before them
    val plan = ScaleOps.bloomPrunedJoin(li, dim, "p_partkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi-join prune in:\n$plan")
  }

  test("keyProfile: hand-computed skew, hot mass, and entropy") {
    import spark.implicits._
    val df = (Seq.fill(6)("A") ++ Seq.fill(2)("B") ++ Seq("C", "D"))
      .toDF("k")
    val r = ScaleOps.keyProfile(df, "k", hotFactor = 1.5).head()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) === 10L && r.getLong(1) === 4L) // n_rows, n_keys
    assert(r.getLong(2) === 6L)                          // max_cnt
    // mean 2.5, hot threshold 3.75 -> only A (6 rows)
    assert(r.getLong(3) === 1L && r.getLong(4) === 6L)
    assert(r.getDouble(5) === r6(6.0 / 2.5))             // skew6
    val sclnc = r6(6 * math.log(6.0) + 2 * math.log(2.0))
    assert(r.getDouble(6) === r6(math.log(10.0) - sclnc / 10.0))
  }

  test("keyProfile: uniform keys read skew 1, zero hot, entropy ln K") {
    import spark.implicits._
    val df = (1 to 8).flatMap(k => Seq.fill(5)(s"k$k")).toDF("k")
    val r = ScaleOps.keyProfile(df, "k").head()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getDouble(5) === 1.0)
    assert(r.getLong(3) === 0L && r.getLong(4) === 0L)
    // H = ln N - (K * c ln c)/N = ln 40 - ln 5 = ln 8, up to the
    // 6dp staging of the sclnc sum
    val sclnc = r6(40.0 * math.log(5.0))
    assert(r.getDouble(6) === r6(math.log(40.0) - sclnc / 40.0))
  }

  test("quantile normalize: hand-checked rank map, equal sizes copy the reference") {
    import spark.implicits._
    val ref = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("event_id", "value")
    val tgt = Seq((11L, 5.0), (12L, 999.0)).toDF("event_id", "value")
    // nB=2, nA=4: rank 1 -> ceil(4/2)=2 -> 20.0; rank 2 -> 4 -> 40.0
    val got = ScaleOps.quantileNormalize(ref, tgt, "event_id", "value")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got === Map(11L -> 20.0, 12L -> 40.0))
    // equal sizes: the normalized multiset IS the reference multiset
    val tgt2 = Seq((21L, -7.0), (22L, 0.0), (23L, 3.0), (24L, 100.0))
      .toDF("event_id", "value")
    val norm = ScaleOps.quantileNormalize(ref, tgt2, "event_id", "value")
      .collect()
    assert(norm.map(_.getDouble(2)).sorted.toSeq ===
      Seq(10.0, 20.0, 30.0, 40.0))
    // monotone: target order is preserved in the normalized values
    val byId = norm.sortBy(_.getDouble(1)).map(_.getDouble(2))
    assert(byId.toSeq === byId.sorted.toSeq)
  }

  test("compactionPlan: ordered coalesce, oversized file isolated") {
    import spark.implicits._
    // files in name order: 6,6,6 → bins 0,0(cum 6),1(cum 12);
    // then 25 (cum 18 → bin 1!), then 3 (cum 43 → bin 4)
    val files = Seq(("f1", 6L), ("f2", 6L), ("f3", 6L), ("f4", 25L),
      ("f5", 3L)).toDF("f", "bytes")
    val out = ScaleOps.compactionPlan(files, Seq("f"), "bytes",
        targetBytes = 10L)
      .orderBy(col("bin_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // bin0: f1,f2 (12 bytes); bin1: f3,f4 (31 — f4 starts at cum 12
    // inside bin1 and overflows it, fill > 1); bin4: f5
    assert(out == Seq((0L, 2L, 12L), (1L, 2L, 31L), (4L, 1L, 3L)))
    // invariants: every file in exactly one bin; bins non-decreasing
    assert(out.map(_._2).sum == 5L)
    assert(out.map(_._3).sum == 46L)
  }

  test("zoneMapLayout + prunedScan: skipped files are never read") {
    import spark.implicits._
    // 40 rows sorted by k into 4 files of 10; range [25, 34] overlaps
    // exactly files 2 (k 20..29) and 3 (k 30..39)
    val df = (0L until 40L).map(k => (k, k * 2L)).toDF("k", "v")
    val dir = tmpDir("zm-spec")
    ScaleOps.zoneMapLayout(df, Seq("k", "v"), col("k"), numFiles = 4,
      dir)
    val zm = spark.read.parquet(s"$dir/zonemap")
      .orderBy(col("__zfile")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(zm.toSeq == Seq((0L, 9L, 10L), (10L, 19L, 10L),
      (20L, 29L, 10L), (30L, 39L, 10L)))
    val (scan, nTotal, nScanned) = ScaleOps.zoneMapPrunedScan(
      spark, dir, col("k"), lit(25L), lit(34L))
    assert(nTotal == 4L && nScanned == 2L)
    // file-level proof the skip is real: execute the scan and read
    // the FileSourceScanExec's numFiles METRIC — planning-time
    // partition pruning, not a post-scan row filter
    // (DataFrame.inputFiles reports the un-pruned FileIndex and
    // cannot distinguish the two)
    val exec = scan.queryExecution.executedPlan
    assert(exec.execute().count() == 20L,
      "the two boundary files hold k 20..39")
    val scanNode = exec.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scanNode.metrics("numFiles").value == 2L,
      s"expected 2 files read, got ${scanNode.metrics("numFiles").value}")
    assert(scanNode.toString.contains("PartitionFilters"),
      "the __zfile predicate must be a partition filter")
    // residual rows: matches are 25..34
    assert(scan.filter(col("k").between(25L, 34L)).count() == 10L)
  }

  test("zoneMapPrunedScan: disjoint range reads zero files") {
    import spark.implicits._
    val df = (0L until 20L).map(k => (k, k)).toDF("k", "v")
    val dir = tmpDir("zm-spec2")
    ScaleOps.zoneMapLayout(df, Seq("k", "v"), col("k"), numFiles = 2,
      dir)
    val (scan, nTotal, nScanned) = ScaleOps.zoneMapPrunedScan(
      spark, dir, col("k"), lit(100L), lit(200L))
    assert(nTotal == 2L && nScanned == 0L)
    assert(scan.count() == 0L)
  }

  test("compactionPlan: exact-boundary cumulative opens a new bin") {
    import spark.implicits._
    val files = Seq(("a", 10L), ("b", 10L), ("c", 1L))
      .toDF("f", "bytes")
    val out = ScaleOps.compactionPlan(files, Seq("f"), "bytes", 10L)
      .orderBy(col("bin_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // cum-before: a=0→bin0, b=10→bin1, c=20→bin2
    assert(out == Seq((0L, 1L, 10L), (1L, 1L, 10L), (2L, 1L, 1L)))
    val fills = ScaleOps.compactionPlan(files, Seq("f"), "bytes", 10L)
      .orderBy(col("bin_id")).collect().map(_.getAs[Double]("fill6"))
    assert(fills.toSeq == Seq(1.0, 1.0, 0.1))
  }

  test("rendezvousAssign: deterministic, total, minimal-disruption") {
    import spark.implicits._
    val items = (1L to 200L).map(i => (s"t${i % 7}", i)).toDF("topic", "p")
    val w5 = Seq("w0", "w1", "w2", "w3", "w4")
    val a = ScaleOps.rendezvousAssign(items, Seq("topic", "p"), w5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[String]("worker"))
      .toMap
    // total + deterministic across reshuffles
    assert(a.size == 200 && a.values.forall(w5.contains))
    val b = ScaleOps.rendezvousAssign(items.repartition(9),
        Seq("topic", "p"), w5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[String]("worker"))
      .toMap
    assert(a == b)
    // every worker gets a non-trivial share (md5 uniformity)
    val byW = a.values.groupBy(identity).view.mapValues(_.size)
    w5.foreach(w => assert(byW.getOrElse(w, 0) >= 10, s"$w starved: $byW"))
    // minimal disruption: dropping w4 moves ONLY w4's items
    val a4 = ScaleOps.rendezvousAssign(items, Seq("topic", "p"),
        w5.filterNot(_ == "w4"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[String]("worker"))
      .toMap
    a.foreach { case (k, w) =>
      if (w != "w4") assert(a4(k) == w, s"$k moved from $w to ${a4(k)}")
    }
    // single-worker degenerate case
    assert(ScaleOps.rendezvousAssign(items, Seq("p"), Seq("only"))
      .select("worker").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("only"))
  }
}
