package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** RRF fusion must compute the textbook reciprocal-rank sum exactly,
  * favor cross-list consensus, and stay deterministic under ties.
  */
class RetrievalSpec extends SparkSuiteBase {

  import spark.implicits._

  test("rrf score is the exact reciprocal-rank sum") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((2L, 1), (4L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), "id", topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(1L) == r6(1.0 / 61))
    assert(out(2L) == r6(1.0 / 62 + 1.0 / 61))
    assert(out(3L) == r6(1.0 / 63))
    assert(out(4L) == r6(1.0 / 62))
  }

  test("consensus beats a single strong rank (the RRF property)") {
    // doc 10 is rank 3 in BOTH lists; doc 20 is rank 1 in one only:
    // 2/63 > 1/61 — presence in both lists wins
    val a = Seq((20L, 1), (30L, 2), (10L, 3)).toDF("id", "rank")
    val b = Seq((40L, 1), (50L, 2), (10L, 3)).toDF("id", "rank")
    val top = Retrieval.rrfFuse(Seq(a, b), "id", topK = 1)
      .collect().map(_.getLong(0))
    assert(top.toSeq == Seq(10L))
  }

  test("ties break by id and topK truncates after the full ordering") {
    // two docs with identical single-list ranks → identical scores →
    // smaller id first
    val a = Seq((9L, 1), (3L, 2)).toDF("id", "rank")
    val b = Seq((5L, 1), (7L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), "id", topK = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(5L, 9L, 3L, 7L), s"tie order wrong: $out")
    val top2 = Retrieval.rrfFuse(Seq(a, b), "id", topK = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top2 == Seq(5L, 9L))
  }

  test("withRank ranks a scored list with the (score desc, id) tie-break") {
    val scored = Seq((1L, 0.5), (2L, 0.9), (3L, 0.5)).toDF("id", "score")
    val ranked = Retrieval.withRank(scored, "id", "score")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(ranked == Map(2L -> 1, 1L -> 2, 3L -> 3))
  }

  test("fusing three lists keeps the fixed-order sum deterministic") {
    val lists = Seq(
      Seq((1L, 1), (2L, 2)).toDF("id", "rank"),
      Seq((2L, 1), (3L, 2)).toDF("id", "rank"),
      Seq((3L, 1), (1L, 2)).toDF("id", "rank"))
    val once = Retrieval.rrfFuse(lists, "id", topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val again = Retrieval.rrfFuse(lists.map(_.repartition(5)), "id", topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(once == again)
    // every doc appears in exactly two lists at ranks {1,2} → all tie
    // → id order
    assert(once.map(_._1) == Seq(1L, 2L, 3L))
  }

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def textbookDcg(relsInRankOrder: Seq[Double]): Double =
    r6(relsInRankOrder.zipWithIndex.map { case (rel, i) =>
      r6((math.pow(2.0, rel) - 1.0) /
        (math.log(i + 2.0) / math.log(2.0)))
    }.sum)

  test("ndcg of the ideal ranking is exactly 1") {
    val rels = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0), (4L, 0.0))
      .toDF("id", "rel")
    val ranked = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)).toDF("id", "rank")
    val row = Retrieval.ndcgAtK(ranked, rels, "id", "rel", k = 4).head()
    assert(row.getDouble(2) === 1.0)
    assert(row.getDouble(0) === row.getDouble(1))
  }

  test("ndcg matches the textbook formula on a reversed ranking") {
    val rels = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0), (4L, 0.0))
      .toDF("id", "rel")
    val reversed = Seq((4L, 1), (3L, 2), (2L, 3), (1L, 4)).toDF("id", "rank")
    val row = Retrieval.ndcgAtK(reversed, rels, "id", "rel", k = 4).head()
    val dcg = textbookDcg(Seq(0.0, 1.0, 2.0, 3.0))
    val idcg = textbookDcg(Seq(3.0, 2.0, 1.0, 0.0))
    assert(row.getDouble(0) === dcg)
    assert(row.getDouble(1) === idcg)
    assert(row.getDouble(2) === r6(dcg / idcg))
    assert(row.getDouble(2) < 1.0)
  }

  test("ndcg: ranks past the list contribute zero, unjudged docs drop") {
    val rels = Seq((1L, 2.0), (2L, 1.0), (3L, 3.0)).toDF("id", "rel")
    // rank 2 is an UNJUDGED doc (id 9): its term must vanish entirely
    val ranked = Seq((1L, 1), (9L, 2)).toDF("id", "rank")
    val row = Retrieval.ndcgAtK(ranked, rels, "id", "rel", k = 3).head()
    assert(row.getDouble(0) === textbookDcg(Seq(2.0)))
    // ideal takes the BEST 3 of the judgment table: rel 3, 2, 1
    assert(row.getDouble(1) === textbookDcg(Seq(3.0, 2.0, 1.0)))
  }

  test("mrrAtK: first-hit reciprocals, missing query counts as 0") {
    import spark.implicits._
    // q1 first hit at rank 2 → 0.5; q2 at rank 1 → 1.0;
    // q3 no relevant in top-k → 0; MRR = (0.5+1.0+0)/3 = 0.5
    val ranked = Seq(
      ("q1", 10L, 1), ("q1", 11L, 2), ("q1", 12L, 3),
      ("q2", 11L, 1), ("q2", 10L, 2),
      ("q3", 10L, 1), ("q3", 13L, 2))
      .toDF("query", "doc_id", "rank")
    val rels = Seq((10L, false), (11L, true), (12L, true), (13L, false))
      .toDF("doc_id", "rel")
    val got = Retrieval.mrrAtK(ranked, rels, "query", "doc_id", "rank",
        "rel", k = 10)
      .orderBy("query").collect()
    assert(got.map(r => (r.getString(0),
      Option(r.get(1)), r.getAs[Double]("rr6"))).toSeq ==
      Seq(("q1", Some(2L), 0.5), ("q2", Some(1L), 1.0),
        ("q3", None, 0.0)))
    assert(got.map(_.getAs[Double]("mrr6")).distinct.toSeq == Seq(0.5))
  }

  test("mrrAtK: k truncation hides hits past k; rank-3 micro snap") {
    import spark.implicits._
    val ranked = Seq(("q1", 5L, 3), ("q2", 5L, 4))
      .toDF("query", "doc_id", "rank")
    val rels = Seq((5L, true)).toDF("doc_id", "rel")
    val got = Retrieval.mrrAtK(ranked, rels, "query", "doc_id", "rank",
        "rel", k = 3)
      .orderBy("query").collect()
    // q1: 1/3 micro-snapped = 0.333333; q2's rank-4 hit is beyond k
    assert(got(0).getAs[Double]("rr6") == 0.333333)
    assert(got(1).getAs[Double]("rr6") == 0.0)
    // mean of micro ints: (333333 + 0)/2 = 166666.5 → floor(+.5) snap
    assert(got.map(_.getAs[Double]("mrr6")).distinct.toSeq ==
      Seq(0.166667))
  }
}
