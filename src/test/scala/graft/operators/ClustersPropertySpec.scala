package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuiteBase

/** Property check: [[Dedup.clusters]] must agree with a brute-force
  * union-find on arbitrary random pair graphs (seeded — deterministic
  * across runs).
  */
class ClustersPropertySpec extends SparkSuiteBase {

  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n + 1)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // component representative = min member = root under min-union
    (1 to n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("clusters equals union-find on random graphs (5 seeds)") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 40
      val nEdges = rnd.nextInt(50)
      val edges = Seq.fill(nEdges) {
        val a = 1L + rnd.nextInt(n)
        val b = 1L + rnd.nextInt(n)
        if (a <= b) (a, b) else (b, a)
      }.filter(e => e._1 != e._2).distinct
      val expected = unionFind(n, edges)
      val docs = (1L to n.toLong).toDF("doc_id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else edges.toDF("id_a", "id_b")
      val got = Dedup.clusters(docs, "doc_id", pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed $seed, edges $edges")
    }
  }

  test("driver union-find route equals the distributed loop (long keys, 5 seeds)") {
    (11 to 15).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = Seq.fill(rnd.nextInt(70)) {
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n))
      }.filter(e => e._1 != e._2)
      val docs = (1L to n.toLong).toDF("doc_id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else edges.toDF("id_a", "id_b")
      val driver = Dedup.clusters(docs, "doc_id", pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Dedup.clusters(docs, "doc_id", pairs, maxDriverEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(driver == dist, s"seed $seed, edges $edges")
    }
  }

  test("driver route equals the distributed loop on string keys (UTF8 binary min)") {
    // supplementary chars (surrogate pairs) order differently under
    // UTF-16 String.compareTo vs Spark's UTF8 binary least()/min() —
    // the driver route must match Spark, not java.lang.String
    val names = Seq("alpha", "Alpha", "beta", "ｚfull", "😀grin",
      "￮half", "gamma", "delta", "épsilon", "zeta")
    val edgeIdx = Seq((0, 1), (1, 6), (3, 4), (4, 5), (7, 8), (8, 9))
    val docs = names.toDF("name")
    val pairs = edgeIdx.map { case (a, b) => (names(a), names(b)) }
      .toDF("id_a", "id_b")
    val driver = Dedup.clusters(docs, "name", pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val dist = Dedup.clusters(docs, "name", pairs, maxDriverEdges = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(driver == dist)
    // the routed result also matches Spark's own least() order on the
    // mixed-plane component {ｚfull, 😀grin, ￮half}: UTF8 binary puts
    // the BMP specials (EF..) before the supplementary (F0..), while
    // UTF-16 String.compareTo would wrongly pick 😀grin (D83D..)
    assert(driver("😀grin") == "ｚfull")
    assert(driver("￮half") == "ｚfull")
  }

  test("clusters with a reliable checkpoint dir matches the localCheckpoint path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 10L), (10L, 11L))
    val docs = (1L to 12L).toDF("doc_id")
    val pairs = edges.toDF("id_a", "id_b")
    val local = Dedup.clusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = Dedup.clusters(docs, "doc_id", pairs,
        checkpointDir = Some(dir), maxDriverEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == local)
    // the reliable path actually wrote RDD checkpoint data
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "expected checkpoint files under the reliable dir")
    // intermediate rounds are deleted as the loop advances: only the
    // edge list and the FINAL round may remain (unbounded loops must
    // not grow storage by O(rounds x labels))
    import scala.jdk.CollectionConverters._
    val tops = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(_.getFileName.toString).toSet
    val labelDirs = tops.filter(_.startsWith("labels-"))
    assert(labelDirs.size == 1,
      s"expected exactly the final labels round on disk, got $labelDirs")
    assert(tops.contains("edges"))
  }

  test("simhash 4-chunk config guarantees recall to hamming 3 (q35 configuration)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    val docs = graft.Tables.documents(spark, sfDir)
    val hashes = docs.select(col("doc_id"),
        TextFns.simhash64(TextFns.tokens(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // all pairs within hamming 3, computed exactly
    val guaranteed = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    val got = Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 3, numChunks = 4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == guaranteed,
      s"missed: ${guaranteed.diff(got)}; extra: ${got.diff(guaranteed)}")
  }
}
