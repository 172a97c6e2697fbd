package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** CCNet-style ntile bucketing (Curation.ntileBuckets) and the
  * cross-document boilerplate fraction (TextAnalysis
  * .boilerplateFraction): exact ANSI ntile parity against Spark's own
  * window function on random data, partition stability, and planted
  * boilerplate counts with block isolation.
  */
class BucketBoilerplateSpec extends SparkSuiteBase {

  import spark.implicits._

  test("ntileBuckets equals Spark's ntile window on random grouped data") {
    val rnd = new scala.util.Random(7)
    // ragged group sizes incl. n < k, n == k, n % k != 0
    val rows = Seq("a" -> 2, "b" -> 3, "c" -> 4, "d" -> 7, "e" -> 23)
      .flatMap { case (g, n) =>
        (0 until n).map(i => (g + "_" + i, g, rnd.nextInt(10) / 3.0))
      }
    val df = rows.toDF("id", "grp", "score")
    for (k <- Seq(2, 3, 5)) {
      val got = Curation.ntileBuckets(df, "id", "grp", "score", k)
        .select("id", "bucket").as[(String, Long)].collect().toMap
      val want = df.withColumn("bucket",
          ntile(k).over(Window.partitionBy(col("grp"))
            .orderBy(col("score").desc, col("id"))).cast("long"))
        .select("id", "bucket").as[(String, Long)].collect().toMap
      assert(got === want, s"ntile parity failed at k=$k")
    }
  }

  test("ntileBuckets: rank is 1-based per group, stable under repartitioning") {
    val df = Seq(("a", "g", 3.0), ("b", "g", 1.0), ("c", "g", 3.0),
      ("d", "h", 9.0)).toDF("id", "grp", "score")
    val one = Curation.ntileBuckets(df, "id", "grp", "score", 2)
      .select("id", "rank", "n_group", "bucket")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    // score desc, id tie-break: a(3.0) r1, c(3.0) r2, b(1.0) r3
    assert(one.toSeq === Seq(("a", 1L, 3L, 1L), ("b", 3L, 3L, 2L),
      ("c", 2L, 3L, 1L), ("d", 1L, 1L, 1L)))
    val wide = Curation.ntileBuckets(df.repartition(7), "id", "grp",
        "score", 2)
      .select("id", "rank", "n_group", "bucket")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(wide.toSeq === one.toSeq)
  }

  test("ntileBuckets: a NULL group key buckets as its own partition (window semantics)") {
    // PARTITION BY grp treats NULL as a partition; the stats join is
    // null-safe so these rows must neither drop nor mis-bucket
    val df = Seq(("a", Some("g"), 3.0), ("b", None, 2.0),
      ("c", None, 1.0), ("d", None, 4.0), ("e", Some("g"), 1.0))
      .toDF("id", "grp", "score")
    val got = Curation.ntileBuckets(df, "id", "grp", "score", 2)
      .select("id", "bucket").as[(String, Long)].collect().toMap
    val want = df.withColumn("bucket",
        ntile(2).over(Window.partitionBy(col("grp"))
          .orderBy(col("score").desc, col("id"))).cast("long"))
      .select("id", "bucket").as[(String, Long)].collect().toMap
    assert(got === want)
    assert(got.size === 5, "NULL-group rows must not drop")
  }

  test("ntileBuckets: null id / null score rows are excluded; guards fire") {
    val df = Seq((Some("a"), Some(1.0)), (None, Some(2.0)),
      (Some("c"), None), (Some("d"), Some(0.5)))
      .toDF("id", "score").withColumn("grp", lit("g"))
    val got = Curation.ntileBuckets(df, "id", "grp", "score", 2)
      .select("id").as[String].collect().sorted
    assert(got.toSeq === Seq("a", "d"))
    intercept[IllegalArgumentException] {
      Curation.ntileBuckets(df, "id", "grp", "score", 1)
    }
  }

  test("boilerplateFraction: planted template counted, block-isolated, multiset occurrences") {
    val df = Seq(
      // s1: "x y z" 3-gram shared by docs 1 and 2 (df=2 -> boiler);
      // doc 1 repeats it twice -> both OCCURRENCES count
      (1L, "s1", "x y z w x y z"),   // shingles: xyz yzw zwx wxy xyz -> 5 total, 2 boiler
      (2L, "s1", "x y z q"),         // xyz yzq -> 2 total, 1 boiler
      (3L, "s1", "p q r"),           // pqr -> 1 total, 0 boiler
      // same text in a DIFFERENT block: df within s2 is 1 -> no boiler
      (4L, "s2", "x y z w"),
      (5L, "s2", "a b"))             // < n tokens: total 0, frac 0.0
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.boilerplateFraction(df, "doc_id", "text",
        "source", n = 3, minDf = 2L)
      .select("doc_id", "total", "n_boiler", "boiler_frac6")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 5, 2L, 0.4), (2L, 2, 1L, 0.5), (3L, 1, 0L, 0.0),
      (4L, 2, 0L, 0.0), (5L, 0, 0L, 0.0)))
    intercept[IllegalArgumentException] {
      TextAnalysis.boilerplateFraction(df, "doc_id", "text", "source",
        n = 3, minDf = 1L)
    }
  }
}
