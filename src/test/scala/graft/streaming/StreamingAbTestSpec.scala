package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.operators.Behavior
import graft.streaming.StreamingAbTest.{Exposure, UnitDelta}

/** Stream==batch for the experiment monitor: summed deltas reproduce
  * the batch abTest counters after every micro-batch prefix (the
  * StreamingUpsert convergence discipline — deltas are commutative,
  * so out-of-order delivery cannot move the counters), and
  * contamination surfaces as a mixed flag mid-stream instead of a
  * readout-time refusal.
  */
class StreamingAbTestSpec extends SparkSuiteBase {

  import spark.implicits._

  private def summed(rows: Seq[UnitDelta]): Map[Long, (Long, Long)] =
    rows.filterNot(_.mixed).groupBy(_.variant)
      .map { case (v, ds) => v -> (ds.map(_.dN).sum, ds.map(_.dConv).sum) }

  test("summed deltas == batch abTest counters after every prefix") {
    implicit val s = spark
    val ms = MemoryStream[Exposure](spark, 1)
    val q = StreamingAbTest.deltas(ms.toDS())
      .writeStream.format("memory").queryName("abtest_deltas")
      .outputMode("append").start()
    val batches = Seq(
      // batch 1: first sights, one immediate conversion
      Seq(Exposure(1, 0, converted = false), Exposure(2, 0, converted = true),
        Exposure(3, 1, converted = false)),
      // batch 2: late conversion for unit 1, repeat no-ops for 2/3
      Seq(Exposure(1, 0, converted = true), Exposure(2, 0, converted = true),
        Exposure(3, 1, converted = false), Exposure(4, 1, converted = true)),
      // batch 3: conversion repeats must not double-count
      Seq(Exposure(1, 0, converted = true), Exposure(4, 1, converted = true),
        Exposure(5, 1, converted = false)))
    var fed = Seq.empty[Exposure]
    batches.foreach { b =>
      ms.addData(b: _*)
      q.processAllAvailable()
      fed = fed ++ b
      val got = summed(spark.table("abtest_deltas").as[UnitDelta]
        .collect().toSeq)
      // batch reference over the same prefix
      val r = Behavior.abTest(fed.toDF("u", "v", "c"), "u", "v", "c").head()
      val want = Map(
        0L -> (r.getAs[Long]("n_a"), r.getAs[Long]("conv_a")),
        1L -> (r.getAs[Long]("n_b"), r.getAs[Long]("conv_b")))
      assert(got == want, s"prefix ${fed.size}: got $got want $want")
    }
    q.stop()
  }

  test("a unit seen under both variants flags mixed once, counters freeze") {
    implicit val s = spark
    val ms = MemoryStream[Exposure](spark, 1)
    val q = StreamingAbTest.deltas(ms.toDS())
      .writeStream.format("memory").queryName("abtest_mixed")
      .outputMode("append").start()
    ms.addData(Exposure(9, 0, converted = false))
    q.processAllAvailable()
    // contamination + a conversion under the WRONG variant: the flag
    // fires once, later wrong-variant traffic is ignored, counters
    // stay at the first variant's first sight
    ms.addData(Exposure(9, 1, converted = true))
    q.processAllAvailable()
    ms.addData(Exposure(9, 1, converted = true))
    q.processAllAvailable()
    val rows = spark.table("abtest_mixed").as[UnitDelta].collect().toSeq
    assert(rows.count(_.mixed) == 1, s"exactly one mixed flag: $rows")
    assert(rows.filter(_.mixed).head.variant == 1L,
      "the flag names the OFFENDING variant")
    assert(summed(rows) == Map(0L -> (1L, 0L)),
      "counters frozen at the first variant's first sight")
    q.stop()
  }
}
