package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

class QualityModelSpec extends SparkSuiteBase {

  private def mk(rows: Seq[(Long, String, Boolean)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "keep")
  }

  test("a separable corpus classifies held-out docs by token company") {
    import spark.implicits._
    // positive class speaks "clean prose", negative speaks "spam"
    val seed = mk(Seq(
      (1L, "the quick brown fox jumps over the lazy dog", true),
      (2L, "a quiet morning with coffee and the newspaper", true),
      (3L, "buy cheap pills now click here win win", false),
      (4L, "click now cheap offer win money now now", false)))
    val m = QualityModel.trainNaiveBayes(seed, "text", "keep")
    val held = Seq(
      (10L, "the brown dog and the quiet fox"),
      (11L, "cheap pills click win now")).toDF("doc_id", "text")
    val out = QualityModel.scoreNaiveBayes(m, held, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(10L) && !out(11L))
  }

  test("OOV-only documents score exactly the smoothing floor + prior") {
    val seed = mk(Seq(
      (1L, "alpha beta gamma", true),
      (2L, "alpha beta delta", true),
      (3L, "zomg spamword junk", false)))
    val m = QualityModel.trainNaiveBayes(seed, "text", "keep")
    // 9 total train tokens: t1=6, t0=3, v=7 distinct
    assert((m.t0, m.t1, m.v) == ((3L, 6L, 7L)))
    val foreign = mk(Seq((20L, "unseen tokens entirely", true)))
      .select(col("doc_id"), col("text"))
    val row = QualityModel.scoreNaiveBayes(m, foreign, "doc_id", "text")
      .collect()(0)
    val expect = math.log(2.0 / 1.0) +
      3.0 * (math.log(1.0 / (m.t1 + m.v)) - math.log(1.0 / (m.t0 + m.v)))
    assert(row.getLong(1) == 3L)
    assert(row.getDouble(2) == math.floor(expect * 1e6 + 0.5) / 1e6)
  }

  test("training refuses a one-class seed") {
    val e = intercept[IllegalArgumentException] {
      QualityModel.trainNaiveBayes(
        mk(Seq((1L, "all one class", true), (2L, "still one class", true))),
        "text", "keep")
    }
    assert(e.getMessage.contains("both classes"))
  }

  test("zero-token documents emit no row") {
    val seed = mk(Seq(
      (1L, "good words here", true),
      (2L, "bad spam words", false)))
    val m = QualityModel.trainNaiveBayes(seed, "text", "keep")
    val docs = mk(Seq((10L, "   ", true), (11L, "good here", true)))
      .select(col("doc_id"), col("text"))
    val out = QualityModel.scoreNaiveBayes(m, docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(11L))
  }

  test("calibration bins: equal-count deciles, monotone rate on the fixture") {
    val bins = QualityModel.calibrationBins(
        graft.Tables.documents(spark, sfDir), "doc_id", "text",
        Seq("the", "a"), bins = 5)
      .orderBy(org.apache.spark.sql.functions.col("bin"))
      .collect()
    assert(bins.map(_.getInt(0)).toSeq === (0 until 5))
    // equal-count cuts: sizes differ by at most 1
    val sizes = bins.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"uneven bins: ${sizes.toSeq}")
    assert(sizes.sum ===
      graft.Tables.documents(spark, sfDir).count())
    // the score must ORDER the rule's judgment: mean log-odds strictly
    // increases by construction, pos_rate must be non-decreasing
    val mlo = bins.map(_.getDouble(2))
    assert(mlo.toSeq === mlo.sorted.toSeq)
    val rates = bins.map(_.getDouble(3))
    assert(rates.zip(rates.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"pos_rate not monotone: ${rates.toSeq}")
  }
}
