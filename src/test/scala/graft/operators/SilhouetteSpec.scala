package graft.operators

import graft.SparkSuiteBase

/** Simplified silhouette must match a sequential reference with the
  * operator's exact rounding, read ~1 on separated clusters, and 0 on
  * boundary points.
  */
class SilhouetteSpec extends SparkSuiteBase {

  import spark.implicits._

  /** Two tight direction clusters; ids 0 and 1 are the two smallest →
    * they become the centroids (one per cluster by construction).
    */
  private def twoClusters() = {
    def vec(deg: Double) = Seq(
      math.cos(deg * math.Pi / 180).toFloat,
      math.sin(deg * math.Pi / 180).toFloat)
    val rows = Seq(0L -> vec(0.0), 1L -> vec(90.0)) ++
      (2 to 10).map(i => i.toLong -> vec((i % 3).toDouble)) ++
      (11 to 19).map(i => i.toLong -> vec(90.0 + (i % 3)))
    rows.toDF("vec_id", "embedding")
  }

  test("cells partition the corpus and separated clusters score near 1") {
    val df = twoClusters()
    val got = Similarity.cellSilhouette(df, "vec_id", "embedding", numCells = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    assert(got.map(_._2).sum == 20L, "every vector lands in exactly one cell")
    assert(got.map(_._1) == Seq(0, 1))
    got.foreach { case (cell, _, s) =>
      assert(s > 0.9, s"cell $cell mean_sil $s should be near 1")
    }
  }

  test("a boundary point scores exactly 0") {
    def vec(deg: Double) = Seq(
      math.cos(deg * math.Pi / 180).toFloat,
      math.sin(deg * math.Pi / 180).toFloat)
    // centroids at 0° and 90°; id 2 sits exactly at 45°
    val df = Seq(0L -> vec(0.0), 1L -> vec(90.0), 2L -> vec(45.0))
      .toDF("vec_id", "embedding")
    val got = Similarity.cellSilhouette(df, "vec_id", "embedding", 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    // cell 0 holds centroid 0 (s=1) and the 45° point (s=0) → mean 0.5
    // BUT the 45° cosines to both centroids round identically at 6dp,
    // so the tie lands it in the smaller cell id with s = 0
    val cell0 = got.find(_._1 == 0).get
    assert(cell0._2 == 2L && math.abs(cell0._3 - 0.5) < 1e-9)
  }

  test("matches a sequential reference with the exact rounding") {
    val df = twoClusters()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val pts = df.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val cents = pts.sortBy(_._1).take(2).map(_._2)
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      r6(dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)))
    }
    val perCell = pts.map { case (_, v) =>
      val ds = cents.zipWithIndex.map { case (c, i) => (1.0 - cos(v, c), i) }
        .sortBy(identity)
      val (a, cell) = ds.head
      val b = ds(1)._1
      val s = if (math.max(a, b) == 0.0) 0.0 else r6((b - a) / math.max(a, b))
      (cell, s)
    }.groupBy(_._1).map { case (c, xs) =>
      (c, xs.size.toLong, r6(xs.map(_._2).sum / xs.size))
    }.toSeq.sortBy(_._1)
    val got = Similarity.cellSilhouette(df, "vec_id", "embedding", 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    assert(got === perCell)
  }

  test("plan shape: one cell-keyed exchange, centroid fold stays row-local") {
    // the scale contract: per-row work is a literal centroid fold (no
    // join), so the ONLY shuffle is the final groupBy(cell) aggregate
    val plan = Similarity
      .cellSilhouette(twoClusters(), "vec_id", "embedding", 2)
      .queryExecution.executedPlan.toString
    val exchanges = "(?m)^\\s*[+:*-]*\\s*Exchange ".r
      .findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly 1 exchange (the cell aggregate), got $exchanges:\n$plan")
    assert(!plan.contains("Join"),
      s"centroids must fold as literals, never join:\n$plan")
  }
}
