package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuiteBase, Tables}

/** Count-Min must honor its one-sided contract — est ≥ exact for
  * every token, hence no false negatives in a threshold report — and
  * keep the fixed-memory plan shape.
  */
class SketchesSpec extends SparkSuiteBase {

  private def docs = Tables.documents(spark, sfDir)

  test("est >= exact for every token; heavy hitters have no false negatives") {
    val exact = docs
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("exact"))
    val est = Sketches.heavyHitters(docs, "text",
      lanes = 4, width = 1024, minCount = 1L) // report everything
    val joined = exact.join(est, Seq("token"), "left").collect()
    joined.foreach { r =>
      assert(!r.isNullAt(2), s"token ${r.getString(0)} missing from report")
      assert(r.getLong(2) >= r.getLong(1),
        s"under-estimate for ${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // threshold report: exactly the tokens whose ESTIMATE clears it,
    // superset of the exactly-heavy ones
    val tau = 50L
    val reported = Sketches.heavyHitters(docs, "text", 4, 1024, tau)
      .collect().map(_.getString(0)).toSet
    val exactHeavy = joined.filter(_.getLong(1) >= tau).map(_.getString(0)).toSet
    assert(exactHeavy.subsetOf(reported),
      s"false negatives: ${exactHeavy -- reported}")
  }

  test("the sketch table never exceeds lanes x width rows") {
    val cm = Sketches.countMinTable(docs, "text", lanes = 3, width = 64)
    assert(cm.count() <= 3L * 64L)
    // and a 10x-duplicated corpus yields the SAME table size (counts
    // scale, state does not)
    val big = docs.union(docs).union(docs)
    val cmBig = Sketches.countMinTable(big, "text", lanes = 3, width = 64)
    assert(cmBig.count() == cm.count())
    val tripled = cm.withColumnRenamed("c", "c1")
      .join(cmBig, Seq("lane", "bucket"))
      .filter(col("c") =!= col("c1") * 3).count()
    assert(tripled == 0, "counters must scale linearly with duplication")
  }

  test("the sketch is mergeable: a streaming micro-batched build equals the batch table") {
    // Count-Min counters are a pure sum — the sketch is mergeable, so
    // the STREAMING build is just the same (lane, bucket) aggregate in
    // complete mode, batch-equal after any micro-batch split
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val texts = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val ms = MemoryStream[(Long, String)](spark, 1)
    val sketch = Sketches.countMinTable(
      ms.toDF().toDF("doc_id", "text"), "text", lanes = 3, width = 64)
    val q = sketch.writeStream.format("memory").queryName("cm_stream")
      .outputMode("complete").start()
    try {
      texts.grouped(200).foreach { b => ms.addData(b.toSeq: _*); q.processAllAvailable() }
      val got = spark.table("cm_stream")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = Sketches.countMinTable(docs, "text", lanes = 3, width = 64)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("the candidate estimate join broadcasts the sketch side") {
    val p = Sketches.heavyHitters(docs, "text", 4, 1024, 500L)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"sketch side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no vocabulary-sized sort-merge join:\n$p")
  }

  test("HLL: repeats never touch the estimate; error inside the m=256 envelope") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val once = Sketches.hllDistinct(docs, "text", shingleN = 3, m = 256)
      .collect()(0)
    // feeding the corpus TWICE changes nothing: register max is
    // idempotent — the property that lets the sketch skip a distinct
    val twice = Sketches.hllDistinct(
        docs.select("text").unionAll(docs.select("text")), "text", 3, 256)
      .collect()(0)
    assert(once.getDouble(1) == twice.getDouble(1))
    assert(once.getLong(0) == twice.getLong(0))
    // relative error within 3x the standard 1.04/sqrt(m) envelope
    val est = once.getDouble(1); val exact = once.getLong(2).toDouble
    val relErr = math.abs(est - exact) / exact
    assert(relErr < 3 * 1.04 / math.sqrt(256.0),
      s"est=$est exact=$exact relErr=$relErr")
    // bounded state: every register the sketch holds is one of m
    assert(once.getLong(0) <= 256L)
  }

  test("HLL registers merge: partition sketches max-merged equal the whole-corpus sketch") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val sh = docs.select(
      explode(graft.functions.TextFns.textShingles(col("text"), 3)).as("s"))
    val whole = Sketches.hllRegisters(sh, "s", 256)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // sketch two halves independently, merge with max
    val h1 = Sketches.hllRegisters(
      docs.where(col("doc_id") % 2 === 0)
        .select(explode(graft.functions.TextFns.textShingles(col("text"), 3))
          .as("s")), "s", 256)
    val h2 = Sketches.hllRegisters(
      docs.where(col("doc_id") % 2 === 1)
        .select(explode(graft.functions.TextFns.textShingles(col("text"), 3))
          .as("s")), "s", 256)
    val merged = h1.unionAll(h2)
      .groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == whole)
    // and the merged estimate is the whole-corpus estimate
    val eWhole = Sketches.hllEstimate(
      Sketches.hllRegisters(sh, "s", 256), 256).collect()(0).getDouble(1)
    val eMerged = Sketches.hllEstimate(
      h1.unionAll(h2).groupBy(col("bucket")).agg(max(col("reg")).as("reg")),
      256).collect()(0).getDouble(1)
    assert(eWhole == eMerged)
  }

  test("histogram quantiles: within one bin width of exact, bounded state") {
    import spark.implicits._
    val vals = (1 to 10000).map(_.toDouble)
    val df = vals.toDF("v")
    val out = Sketches.histogramQuantiles(df, "v", bins = 1024,
        probs = Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    val width = (10000.0 - 1.0) / 1024
    Seq(0.5, 0.9, 0.99).foreach { q =>
      val exact = vals(math.ceil(q * vals.size).toInt - 1)
      val est = out(q)
      assert(est >= exact - 1e-9 && est <= exact + width + 1e-9,
        s"q=$q est=$est exact=$exact width=$width")
    }
    // degenerate input: all-equal values land in bin 0, est = the value
    val const = Seq.fill(50)(7.5).toDF("v")
    val c = Sketches.histogramQuantiles(const, "v", 1024, Seq(0.5))
      .collect()(0)
    assert(c.getLong(1) == 0L && c.getDouble(2) == 7.5)
    // bounded state: the bin table never exceeds `bins` rows
    val skewed = (1 to 5000).map(i => if (i % 2 == 0) 1.0 else i.toDouble)
    val lo = skewed.min; val hi = skewed.max
    val nBins = skewed.map(v =>
      math.min(math.floor((v - lo) / ((hi - lo) / 1024)), 1023)).distinct.size
    assert(nBins <= 1024)
  }

  test("joinCardinality: exact is the true join size, est one-sided above it") {
    import spark.implicits._
    val a = (Seq.fill(10)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L, 4L)).toDF("k")
    val b = (Seq.fill(4)(1L) ++ Seq.fill(2)(2L) ++ Seq(5L)).toDF("k")
    val trueSize = a.join(b, "k").count()
    val r = Sketches.joinCardinality(a, "k", b, "k", lanes = 4,
      width = 64).head()
    assert(r.getLong(0) === trueSize) // 10*4 + 3*2 = 46
    assert(r.getLong(1) >= r.getLong(0), "CM inner product is one-sided")
  }

  test("joinCardinality: disjoint key sets read exact 0 with null ratio") {
    import spark.implicits._
    val a = Seq(1L, 2L, 3L).toDF("k")
    val b = Seq(10L, 11L).toDF("k")
    val r = Sketches.joinCardinality(a, "k", b, "k", 4, 64).head()
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(2))
  }

  test("grouped quantiles: per-group accuracy within a bin, degenerate group") {
    import spark.implicits._
    // group A uniform 0..999; group B constant 42
    val df = ((0 until 1000).map(i => ("A", i.toDouble)) ++
      Seq.fill(10)(("B", 42.0))).toDF("g", "v")
    val got = Sketches.groupedHistogramQuantiles(df, "g", "v",
        bins = 256, probs = Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3))
      .toMap
    val binW = 999.0 / 256.0
    assert(math.abs(got(("A", 0.5)) - 499.5) <= binW + 1e-6)
    assert(math.abs(got(("A", 0.9)) - 899.1) <= binW + 1e-6)
    // degenerate group: hi == lo -> est = lo exactly
    assert(got(("B", 0.5)) === 42.0 && got(("B", 0.9)) === 42.0)
  }

  test("KMV: mergeable — bottom-k of partition sketches equals the whole-set sketch") {
    import spark.implicits._
    val items = (0 until 5000).map(i => s"item-$i").toDF("s")
    val whole = Sketches.kmvSketch(items, "s", 64)
      .collect().map(_.getLong(0)).toSeq
    // split the set arbitrarily, sketch each part, merge the SKETCHES
    val p1 = items.filter(xxhash64(col("s")) % 3 === 0)
    val p2 = items.filter(xxhash64(col("s")) % 3 =!= 0)
    val merged = Sketches.kmvSketch(p1, "s", 64)
      .union(Sketches.kmvSketch(p2, "s", 64))
      .distinct().orderBy(col("h")).limit(64)
      .collect().map(_.getLong(0)).toSeq
    assert(merged === whole,
      "bottomK(bottomK(A) U bottomK(B)) must equal bottomK(A U B)")
  }

  test("KMV set ops: exact path when k covers both sets") {
    import spark.implicits._
    val a = (0 until 100).map(i => s"x$i").toDF("s")   // 100 distinct
    val b = (50 until 130).map(i => s"x$i").toDF("s")  // 80 distinct, 50 shared
    val r = Sketches.kmvSetOps(a, b, "s", k = 512).head()
    assert(r.getAs[Long]("exact_union") === 130L)
    assert(r.getAs[Long]("exact_inter") === 50L)
    // n_merged < k -> the "estimates" are the exact cardinalities
    assert(r.getAs[Long]("n_merged") === 130L)
    assert(r.getAs[Double]("union_est") === 130.0)
    assert(r.getAs[Double]("inter_est") === 50.0)
  }

  test("KMV set ops: estimator path inside the O(1/sqrt k) envelope") {
    import spark.implicits._
    val a = (0 until 8000).map(i => s"v$i").toDF("s")
    val b = (6000 until 12000).map(i => s"v$i").toDF("s")
    // union 12000, inter 2000, jaccard 1/6
    val r = Sketches.kmvSetOps(a, b, "s", k = 512).head()
    assert(r.getAs[Long]("exact_union") === 12000L)
    assert(r.getAs[Long]("exact_inter") === 2000L)
    val uErr = math.abs(r.getAs[Double]("union_est") / 12000.0 - 1.0)
    assert(uErr < 0.15, s"union est off by $uErr")   // ~3.4 sigma at k=512
    val jErr = math.abs(r.getAs[Double]("jaccard_est") - 2000.0 / 12000.0)
    assert(jErr < 0.06, s"jaccard est off by $jErr")
    val iErr = math.abs(r.getAs[Double]("inter_est") / 2000.0 - 1.0)
    assert(iErr < 0.45, s"inter est off by $iErr")
  }

  test("KMV overlap matrix agrees with the pairwise kmvSetOps estimators") {
    import spark.implicits._
    val items = ((0 until 3000).map(i => ("a", s"v$i")) ++
      (2000 until 5000).map(i => ("b", s"v$i")) ++
      (0 until 500).map(i => ("c", s"w$i"))).toDF("g", "s")
    val m = Sketches.kmvOverlapMatrix(items, "g", "s", k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // (a,b): same numbers as the dedicated two-set operator
    val ab = Sketches.kmvSetOps(
      items.filter(col("g") === "a").select("s"),
      items.filter(col("g") === "b").select("s"), "s", k = 256).head()
    val got = m(("a", "b"))
    assert(got.getAs[Long]("exact_union") === ab.getAs[Long]("exact_union"))
    assert(got.getAs[Long]("exact_inter") === ab.getAs[Long]("exact_inter"))
    assert(got.getAs[Double]("union_est") === ab.getAs[Double]("union_est"))
    assert(got.getAs[Double]("jaccard_est") === ab.getAs[Double]("jaccard_est"))
    // disjoint pair: zero estimates, not nulls
    assert(m(("a", "c")).getAs[Long]("exact_inter") === 0L)
    assert(m(("a", "c")).getAs[Double]("inter_est") === 0.0)
    assert(m(("a", "c")).getAs[Double]("jaccard_est") === 0.0)
    assert(m.size === 3, "3 groups -> 3 pairs")
  }

  test("KMV grouped sketch: at most k rows per group via WindowGroupLimit") {
    import spark.implicits._
    val items = (0 until 2000).map(i => (s"g${i % 3}", s"x$i")).toDF("g", "s")
    val sk = Sketches.kmvGroupedSketch(items, "g", "s", 64)
    val counts = sk.groupBy("g").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 64L))
    val p = sk.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"per-group bottom-k must push into WindowGroupLimit:\n$p")
  }

  test("KMV sketch plans as TakeOrderedAndProject, never a global sort") {
    import spark.implicits._
    val items = (0 until 1000).map(i => s"i$i").toDF("s")
    val p = Sketches.kmvSketch(items, "s", 32)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"bottom-k must be per-partition top-k + one merge, got:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"bottom-k must not global-sort:\n$p")
  }
}
