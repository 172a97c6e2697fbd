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
}
