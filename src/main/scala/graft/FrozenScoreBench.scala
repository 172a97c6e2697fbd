package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{QualityModel, TextAnalysis}

/** Scratch benchmark for the NB classifier's INFERENCE scaling — the
  * frozen-model deployment shape (train once on a labeled seed, score
  * an ever-larger foreign corpus). Historical context: before round
  * 15, q85's in-query training could not run on the ScaleFixture
  * corpora at all — the fixture suffixed every token INCLUDING the
  * seed stopwords, which erased the stopword signal from the q58 seed
  * labeler, and a one-class seed is refused loudly by design. The
  * fixture is now seed-term-preserving (ScaleFixture scaladoc), so
  * the NB family runs in-deck; this bench remains the FROZEN-model
  * complement — model trained on the UNsuffixed sf0.1 documents,
  * scoring the (suffixed, hence ~fully-OOV) target corpus, which also
  * exercises the OOV smoothing floor at full volume.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<score corpus> runMain graft.FrozenScoreBench
  */
object FrozenScoreBench {
  def main(args: Array[String]): Unit = {
    val trainDir = sys.env.getOrElse("SPARK_GRAFT_TRAIN_DIR",
      "/root/testdata/sf0.1")
    val scoreDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", trainDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val train = Tables.documents(spark, trainDir)
    val seed = train.filter(pmod(col("doc_id"), lit(10)) < 3)
    val labeled = TextAnalysis.qualityFilter(seed, "doc_id", "text",
        Seq("the", "a"))
      .select(col("doc_id"), col("keep"))
      .join(seed.select(col("doc_id"), col("text")), Seq("doc_id"))
    val t0 = System.nanoTime()
    val model = QualityModel.trainNaiveBayes(labeled, "text", "keep")
    val tTrain = (System.nanoTime() - t0) / 1e9

    val target = Tables.documents(spark, scoreDir)
    (1 to 3).map { _ =>
      val s0 = System.nanoTime()
      QualityModel.scoreNaiveBayes(model, target, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - s0) / 1e9
    }.zipWithIndex.foreach { case (s, i) =>
      println(f"[frozen-score] rep${i + 1} score=$s%.3f s (train=$tTrain%.3f s, corpus=$scoreDir)")
    }
    spark.stop()
  }
}
