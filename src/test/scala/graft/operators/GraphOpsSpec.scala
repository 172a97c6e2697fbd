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

  test("linkPredict: path wedge, square double-wedge, triangle empty") {
    import spark.implicits._
    // path a-b-c: candidate (a,c) via b (deg 2) → cn=1, ra=0.5
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val p = GraphOps.linkPredict(path, "id_a", "id_b").collect()
    assert(p.length == 1)
    assert(p(0).getAs[Long]("id_a") == 1L && p(0).getAs[Long]("id_b") == 3L)
    assert(p(0).getAs[Long]("cn") == 1L && p(0).getAs[Double]("ra6") == 0.5)
    // square 1-2-3-4-1: (1,3) and (2,4) each see two deg-2 neighbors
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("id_a", "id_b")
    val qr = GraphOps.linkPredict(sq, "id_a", "id_b")
      .orderBy("id_a").collect()
    assert(qr.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
      r.getAs[Long]("cn"), r.getAs[Double]("ra6"))).toSeq ==
      Seq((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)))
    // triangle: every pair adjacent → no candidates
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    assert(GraphOps.linkPredict(tri, "id_a", "id_b").count() == 0L)
  }

  test("linkPredict: hub cap drops high-degree intermediaries") {
    import spark.implicits._
    // star center 9 with leaves 1..4 (deg 4); maxDeg=3 kills all wedges
    val star = (1L to 4L).map(l => (9L, l)).toDF("id_a", "id_b")
    assert(GraphOps.linkPredict(star, "id_a", "id_b", maxDeg = 3)
      .count() == 0L)
    // with the cap open the star yields all 6 leaf pairs at ra=0.25
    val open = GraphOps.linkPredict(star, "id_a", "id_b", maxDeg = 64)
      .collect()
    assert(open.length == 6 && open.forall(_.getAs[Double]("ra6") == 0.25))
    // duplicate + reversed edge rows collapse to one edge
    val dup = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L))
      .toDF("id_a", "id_b")
    val d = GraphOps.linkPredict(dup, "id_a", "id_b").collect()
    assert(d.length == 1 && d(0).getAs[Double]("ra6") == 0.5)
  }

  test("linkPredict: array wedge mine equals brute force on random graphs") {
    import spark.implicits._
    (21 to 23).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 30
      val edges = Seq.fill(60)((1L + rnd.nextInt(n), 1L + rnd.nextInt(n)))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val maxDeg = 5
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val deg = adj.view.mapValues(_.size).toMap
      val es = edges.toSet
      val nodes = adj.keys.toSeq.sorted
      val want = (for {
        u <- nodes; v <- nodes if u < v && !es.contains((u, v))
        common = adj(u).intersect(adj(v)).filter(deg(_) <= maxDeg)
        if common.nonEmpty
      } yield (u, v, common.size.toLong,
        common.toSeq.map(w => math.floor(1e6 / deg(w) + 0.5).toLong).sum
          / 1e6)).toSet
      val got = GraphOps.linkPredict(edges.toDF("id_a", "id_b"),
          "id_a", "id_b", maxDeg = maxDeg)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Long]("cn"), r.getAs[Double]("ra6"))).toSet
      assert(got == want, s"seed $seed")
    }
  }

  test("bfsHops: path distances, nearest seed wins, cap and isolation") {
    import spark.implicits._
    // path 1-2-3-4-5-6 with seeds {1, 6}: hops = 0,1,2,2,1,0
    val path = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val seeds = Seq(1L, 6L).toDF("seed")
    val d = GraphOps.bfsHops(path, "id_a", "id_b", seeds, "seed", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L,
      6L -> 0L))
    // maxHops truncates: single seed, cap 2 → node 4.. unreached
    val one = Seq(1L).toDF("seed")
    val c = GraphOps.bfsHops(path, "id_a", "id_b", one, "seed", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // an isolated seed still reads hops 0; empty seed set reads empty
    val iso = GraphOps.bfsHops(path, "id_a", "id_b",
      Seq(99L).toDF("seed"), "seed", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(iso == Map(99L -> 0L))
    assert(GraphOps.bfsHops(path, "id_a", "id_b",
      Seq.empty[Long].toDF("seed"), "seed", 3).count() == 0L)
  }

  test("modularity: two clean cliques high Q, label-blind split ~0") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6}; m = 6
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L)).toDF("id_a", "id_b")
    // labels follow the cliques → Q = 2·(3/6 − (6/12)²) = 0.5
    val aligned = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"),
      (5L, "y"), (6L, "y")).toDF("id", "c")
    val qa = GraphOps.modularity(pairs, "id_a", "id_b", aligned, "id", "c")
      .collect()
    assert(qa.map(_.getAs[Double]("modularity6")).distinct.toSeq ==
      Seq(0.5))
    val byC = qa.map(r => r.getAs[String]("community") ->
      (r.getAs[Long]("in_edges"), r.getAs[Long]("deg_sum"))).toMap
    assert(byC("x") == (3L, 6L) && byC("y") == (3L, 6L))
    // labels that cut ACROSS both cliques: in_c = 2 of 6 per label
    // → Q = 2·(2/6 − 1/4) = 2·(1/12) ≈ 0.166666 (micro-floored terms)
    val blind = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "y"),
      (5L, "x"), (6L, "y")).toDF("id", "c")
    val qb = GraphOps.modularity(pairs, "id_a", "id_b", blind, "id", "c")
      .collect().map(_.getAs[Double]("modularity6")).distinct
    assert(qb.forall(v => v < 0.25), s"got ${qb.toSeq}")
    // duplicate/reversed edge rows collapse before counting
    val dup = Seq((1L, 2L), (2L, 1L), (1L, 2L)).toDF("id_a", "id_b")
    val labs = Seq((1L, "x"), (2L, "x")).toDF("id", "c")
    val qd = GraphOps.modularity(dup, "id_a", "id_b", labs, "id", "c")
      .collect()
    assert(qd.length == 1 && qd(0).getAs[Long]("in_edges") == 1L &&
      qd(0).getAs[Long]("deg_sum") == 2L)
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

  test("label propagation: seeds flood their cliques, unreachable stays null") {
    import spark.implicits._
    // clique {1,2,3} seeded 'a' at 1; path 4-5-6 seeded 'b' at 4;
    // isolated 7 never reached
    val nodes = (1L to 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    val seeds = Seq((1L, "a"), (4L, "b")).toDF("doc_id", "lang")
    val got = GraphOps.labelPropagation(nodes, "doc_id", pairs,
        "id_a", "id_b", seeds, "doc_id", "lang", rounds = 3)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains("a") && got(2L).contains("a")
      && got(3L).contains("a"))
    assert(got(4L).contains("b") && got(5L).contains("b")
      && got(6L).contains("b"))
    assert(got(7L).isEmpty, "isolated node must stay unlabeled")
    // 6 is 2 hops from the seed: one round is not enough
    val r1 = GraphOps.labelPropagation(nodes, "doc_id", pairs,
        "id_a", "id_b", seeds, "doc_id", "lang", rounds = 1)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(r1(5L).contains("b") && r1(6L).isEmpty)
  }

  test("k-core: a triangle survives 2-core peeling, a path peels away in cascade") {
    import spark.implicits._
    // triangle {1,2,3}; path 4-5-6 (ends deg 1, middle deg 2 -> the
    // middle only peels AFTER its ends go — the cascade needs round 2);
    // isolated 7
    val nodes = (1L to 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    val got = GraphOps.kCore(nodes, "doc_id", pairs, "id_a", "id_b",
        k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(1L) && got(2L) && got(3L), "triangle is the 2-core")
    assert(!got(4L) && !got(5L) && !got(6L), "path must fully cascade out")
    assert(!got(7L), "isolated node leaves in round 1")
    // ONE round is not enough for the cascade: 5 still looks degree-2
    val r1 = GraphOps.kCore(nodes, "doc_id", pairs, "id_a", "id_b", 2, 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(r1(5L) && !r1(4L), "the middle survives round 1, ends don't")
    // deterministic under repartitioning
    val again = GraphOps.kCore(nodes.repartition(5), "doc_id",
        pairs.repartition(3), "id_a", "id_b", 2, 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(again === got)
  }

  test("label propagation: majority wins, ties take the smaller label, seeds frozen") {
    import spark.implicits._
    // node 10 hears 'b' twice and 'a' once -> 'b'; node 20 hears one
    // of each -> tie -> 'a'; seed 2 keeps 'b' though both its
    // neighbors say 'a'
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (1L, 20L), (2L, 20L), (1L, 2L), (4L, 2L)).toDF("id_a", "id_b")
    val seeds = Seq((1L, "a"), (4L, "a"), (2L, "b"), (3L, "b"))
      .toDF("doc_id", "lang")
    val got = GraphOps.labelPropagation(nodes, "doc_id", pairs,
        "id_a", "id_b", seeds, "doc_id", "lang", rounds = 2)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(10L).contains("b"), s"majority: ${got(10L)}")
    assert(got(20L).contains("a"), s"tie-break: ${got(20L)}")
    assert(got(2L).contains("b"), "assigned labels are frozen")
    // deterministic under repartitioning
    val again = GraphOps.labelPropagation(nodes.repartition(5), "doc_id",
        pairs.repartition(3), "id_a", "id_b", seeds, "doc_id", "lang",
        rounds = 2)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(again === got)
  }

  test("hits: mutual reinforcement, max-norm, zero-degree at 0") {
    import spark.implicits._
    // u1→{i1,i2}, u2→{i2}; i3 isolated. Hand-walk (micro, max-norm):
    // r1: auth (0.5, 1, 0); hub (1, 0.666667)
    // r2: auth i1 = 1e6/1666667 → 0.6, i2 = 1.0, i3 = 0;
    //     hub u1 = 1.0, u2 = 1e6/1.6e6 → 0.625
    val src = Seq("u1", "u2").toDF("u")
    val dst = Seq("i1", "i2", "i3").toDF("i")
    // duplicate edge must collapse (unweighted HITS)
    val e = Seq(("u1", "i1"), ("u1", "i1"), ("u1", "i2"), ("u2", "i2"))
      .toDF("u", "i")
    val (hubs, auths) = GraphOps.hits(src, dst, e, "u", "i", rounds = 2)
    val a = auths.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == Map("i1" -> 0.6, "i2" -> 1.0, "i3" -> 0.0), s"got $a")
    val h = hubs.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(h == Map("u1" -> 1.0, "u2" -> 0.625), s"got $h")
  }

  test("hits: empty edge frame reads all-zero scores, not a crash") {
    import spark.implicits._
    val (hubs, auths) = GraphOps.hits(
      Seq("u1").toDF("u"), Seq("i1").toDF("i"),
      Seq.empty[(String, String)].toDF("u", "i"), "u", "i", rounds = 1)
    assert(auths.head().getDouble(1) == 0.0)
    assert(hubs.head().getDouble(1) == 0.0)
  }
}
