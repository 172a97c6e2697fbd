package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** PageRank over undirected pair frames: structure, teleport mass,
  * determinism.
  */
class GraphOpsSpec extends SparkSuiteBase {

  test("pageRank: path graph ranks the middle, isolated nodes keep teleport mass") {
    import spark.implicits._
    // a - b - c plus isolated d
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val pr = GraphOps.pageRank(nodes, pairs, "doc_id", "id_a", "id_b",
        iterations = 3, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // symmetry: the two endpoints are interchangeable
    assert(pr(1L) == pr(3L))
    // the middle node holds the most rank
    assert(pr(2L) > pr(1L))
    // the isolated node receives exactly the teleport term each round:
    // (1 - 0.85) / 4 = 0.0375
    assert(pr(4L) == 0.0375, s"isolated got ${pr(4L)}")
    // every value is on the 1e-6 grid (the portable rounding contract)
    pr.values.foreach(v => assert(v == math.floor(v * 1e6 + 0.5) / 1e6))
  }

  test("pageRank: zero iterations returns the rounded uniform init; determinism") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val p0 = GraphOps.pageRank(nodes, pairs, "doc_id", "id_a", "id_b", 0, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p0.values.toSet == Set(0.333333), s"got $p0")
    val a = GraphOps.pageRank(nodes, pairs, "doc_id", "id_a", "id_b", 4, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = GraphOps.pageRank(nodes, pairs, "doc_id", "id_a", "id_b", 4, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
    // node 3 is dangling-adjacent-free: its rank is the pure teleport
    // term; the connected pair holds strictly more
    assert(a(1L) == a(2L) && a(1L) > a(3L))
  }

  test("pageRank: total mass stays below 1 only by the dangling leak") {
    import spark.implicits._
    // fully connected triangle: no dangling nodes, mass ~ 1 (up to
    // per-node 1e-6 rounding)
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val pr = GraphOps.pageRank(nodes, pairs, "doc_id", "id_a", "id_b", 5, 0.85)
      .collect().map(_.getDouble(1))
    assert(math.abs(pr.sum - 1.0) < 1e-5, s"mass ${pr.sum}")
    // symmetric graph -> identical ranks
    assert(pr.toSet.size == 1)
  }
}
