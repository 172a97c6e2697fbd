package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** Corpus-analysis operators: PMI collocation mining. */
class TextAnalysisSpec extends SparkSuiteBase {

  test("PMI collocations: a planted always-together pair outranks independent pairs") {
    import spark.implicits._
    // "new york" only ever occur as a pair; filler words pair freely.
    // p(new york) = p(new) = p(york)  =>  lift = 1/p(new) (maximal);
    // filler bigrams approach lift ~ 1.
    val filler = Seq("a", "b", "c", "d")
    val rnd = new scala.util.Random(3)
    val docs = (0 until 60).map { i =>
      val words = (0 until 20).map(_ => filler(rnd.nextInt(4)))
      val withPair = words.take(10) ++ Seq("new", "york") ++ words.drop(10)
      (i.toLong, withPair.mkString(" "))
    }.toDF("doc_id", "text")
    val top = TextAnalysis.pmiCollocations(docs, "text", minCount = 5L, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
    assert(top.head._1 == ("new", "york"), s"top was ${top.head}")
    // and its lift strictly dominates every filler pair
    val pairLift = top.head._2
    top.tail.foreach { case (p, l) =>
      assert(l < pairLift, s"$p lift $l not below planted $pairLift") }
    // deterministic: a second run returns the identical ranking
    val again = TextAnalysis.pmiCollocations(docs, "text", 5L, 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
    assert(top.toSeq == again.toSeq)
  }

  test("PMI collocations: minCount gates rare pairs, output is rank-deterministic under ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y x y x y x y"), // x y appears 5x
      (2L, "p q")                  // p q appears once
    ).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 5L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.exists(t => t._1 == "x" && t._2 == "y"))
    assert(!out.exists(t => t._1 == "p"), "rare pair must be gated")
  }
}
