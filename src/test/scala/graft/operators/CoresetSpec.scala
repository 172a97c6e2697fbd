package graft.operators

import graft.SparkSuiteBase

/** Greedy k-center must equal the sequential farthest-point algorithm
  * exactly and pick one representative per well-separated cluster.
  */
class CoresetSpec extends SparkSuiteBase {

  import spark.implicits._

  /** Four tight clusters at corners of a square far apart; ids
    * interleaved so selection order exercises the tie/argmax logic.
    */
  private def clustered() = {
    val centers = Seq(
      Array(0.0, 0.0), Array(100.0, 0.0), Array(0.0, 100.0),
      Array(100.0, 100.0))
    val rows = (0 until 80).map { i =>
      val c = centers(i % 4)
      val jx = ((i * 13) % 7 - 3) * 0.1
      val jy = ((i * 29) % 5 - 2) * 0.1
      (i.toLong, Seq((c(0) + jx).toFloat, (c(1) + jy).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  /** Reference implementation: sequential greedy on the driver with
    * the same rounding and tie-break.
    */
  private def bruteGreedy(
      pts: Seq[(Long, Array[Double])], k: Int): Seq[(Int, Long, Double)] = {
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def sq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seed = pts.map(_._1).min
    var chosen = Vector((1, seed, 0.0))
    while (chosen.size < k) {
      val cvecs = chosen.map(c => pts.find(_._1 == c._2).get._2)
      val cand = pts.filterNot(p => chosen.exists(_._2 == p._1))
        .map { case (id, v) => (id, r6(cvecs.map(c => sq(v, c)).min)) }
      val best = cand.maxBy { case (id, dd) => (dd, -id) }
      chosen = chosen :+ ((chosen.size + 1, best._1, best._2))
    }
    chosen
  }

  test("matches the sequential greedy algorithm exactly") {
    val df = clustered()
    val pts = df.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val expect = bruteGreedy(pts, 4)
    val got = Coreset.kCenterSelect(df, "vec_id", "embedding", 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    assert(got === expect)
  }

  test("one representative per well-separated cluster") {
    val got = Coreset.kCenterSelect(clustered(), "vec_id", "embedding", 4)
      .collect().map(_.getLong(1) % 4).toSet
    assert(got === Set(0L, 1L, 2L, 3L),
      "k=4 over 4 far clusters must hit each cluster once")
  }

  test("degenerate identical corpus still yields k distinct ids") {
    val df = (0L until 10L).map(i => (i, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val got = Coreset.kCenterSelect(df, "vec_id", "embedding", 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._2).distinct.length === 3)
    assert(got.filter(_._1 > 1).forall(_._3 === 0.0))
  }

  test("k beyond the corpus fails with a clear message, not an NPE") {
    val df = (0L until 3L).map(i => (i, Seq(i.toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Coreset.kCenterSelect(df, "vec_id", "embedding", 5)
    }
    assert(e.getMessage.contains("k=5") && e.getMessage.contains("3"))
  }

  /** MMR reference: sequential greedy with the operator's exact
    * rounding (6dp per pairwise cosine, 6dp on the objective) and
    * (score desc, id asc) tie-break.
    */
  private def bruteMmr(
      pts: Seq[(Long, Array[Double])], qid: Long, k: Int,
      lam: Double): Seq[(Int, Long, Double)] = {
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      r6(dot / (na * nb))
    }
    val q = pts.find(_._1 == qid).get._2
    val cands = pts.filter(p => p._1 != qid &&
      p._2.exists(_ != 0.0))
    var chosen = Vector.empty[(Int, Long, Double)]
    while (chosen.size < k) {
      val cvecs = chosen.map(c => cands.find(_._1 == c._2).get._2)
      val scored = cands.filterNot(p => chosen.exists(_._2 == p._1))
        .map { case (id, v) =>
          val red = if (cvecs.isEmpty) 0.0 else cvecs.map(cos(v, _)).max
          (id, r6(lam * cos(v, q) - (1.0 - lam) * red))
        }
      val best = scored.maxBy { case (id, s) => (s, -id) }
      chosen = chosen :+ ((chosen.size + 1, best._1, best._2))
    }
    chosen
  }

  test("MMR matches the sequential greedy algorithm exactly") {
    val df = clustered()
    val pts = df.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val expect = bruteMmr(pts, qid = 0L, k = 5, lam = 0.7)
    val got = Coreset.mmrSelect(df, "vec_id", "embedding",
        queryId = 0L, k = 5, lambda = 0.7)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    assert(got === expect)
  }

  /** Unit vectors in three angular groups: ids 1-5 hug the query
    * direction (0°), 6-10 sit at ~40°, 11-15 at ~80° — cosine
    * relevance cleanly separates the groups.
    */
  private def circle() = {
    def vec(deg: Double) = Seq(
      math.cos(deg * math.Pi / 180).toFloat,
      math.sin(deg * math.Pi / 180).toFloat)
    val rows = Seq(0L -> vec(0.0)) ++
      (1 to 5).map(i => i.toLong -> vec(i.toDouble)) ++
      (6 to 10).map(i => i.toLong -> vec(34.0 + i)) ++
      (11 to 15).map(i => i.toLong -> vec(69.0 + i))
    rows.toDF("vec_id", "embedding")
  }
  private def group(id: Long): Long = (id - 1) / 5

  test("MMR diversifies: lambda=1 is pure relevance, lambda<1 spreads across groups") {
    val df = circle()
    val pure = Coreset.mmrSelect(df, "vec_id", "embedding",
        queryId = 0L, k = 4, lambda = 1.0)
      .collect().map(r => group(r.getLong(1))).toSet
    assert(pure === Set(0L), "λ=1 must pick only the near-query group")
    val div = Coreset.mmrSelect(df, "vec_id", "embedding",
        queryId = 0L, k = 4, lambda = 0.3)
      .collect().map(r => group(r.getLong(1))).toSet
    assert(div.size > 1, s"λ=0.3 must cross groups, got $div")
  }

  test("MMR guards: lambda range, k range, zero-norm query") {
    val df = clustered()
    intercept[IllegalArgumentException] {
      Coreset.mmrSelect(df, "vec_id", "embedding", 0L, 3, lambda = 1.5)
    }
    intercept[IllegalArgumentException] {
      Coreset.mmrSelect(df, "vec_id", "embedding", 0L, 100, lambda = 0.5)
    }
    val zq = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Coreset.mmrSelect(zq, "vec_id", "embedding", 0L, 2, lambda = 0.5)
    }
  }
}
