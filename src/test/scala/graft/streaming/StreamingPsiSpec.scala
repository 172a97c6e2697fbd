package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.operators.Audit
import graft.streaming.StreamingPsi.Obs

/** Stream==batch for the PSI drift monitor: the readout over the
  * running (group, bin) aggregate equals the batch psiDrift over the
  * same prefix after EVERY micro-batch — including the moment a
  * drifting source crosses the 0.2 alert threshold mid-stream.
  */
class StreamingPsiSpec extends SparkSuiteBase {

  import spark.implicits._

  test("running-count readout == batch psiDrift after every prefix") {
    val ms = MemoryStream[Obs](spark, 1)
    val q = StreamingPsi.binCounts(ms.toDS(), binWidth = 10L, nBins = 8)
      .writeStream.format("memory").queryName("psi_counts")
      .outputMode("complete").start()
    // base stays put; "twin" mirrors it; "drift" starts aligned and
    // walks upward batch by batch until it must flag
    val batches = Seq(
      (0 until 20).map(i => Obs("base", (i % 4) * 10L)) ++
        (0 until 20).map(i => Obs("twin", (i % 4) * 10L)) ++
        (0 until 20).map(i => Obs("drift", (i % 4) * 10L)),
      (0 until 20).map(i => Obs("base", (i % 4) * 10L)) ++
        (0 until 20).map(i => Obs("twin", (i % 4) * 10L)) ++
        (0 until 20).map(i => Obs("drift", (i % 4) * 10L + 40L)),
      (0 until 40).map(i => Obs("drift", 70L)))
    var fed = Seq.empty[Obs]
    var lastDrift = Double.NaN
    batches.foreach { b =>
      ms.addData(b: _*)
      q.processAllAvailable()
      fed = fed ++ b
      val stream = StreamingPsi.psiOf(spark.table("psi_counts"),
          baseline = "base", nBins = 8)
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
      val batch = Audit.psiDrift(fed.toDF("group", "value"),
          "group", "value", baseline = "base",
          binWidth = 10L, nBins = 8)
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
      assert(stream == batch, s"prefix ${fed.size}: $stream vs $batch")
      lastDrift = stream("drift")._2
    }
    q.stop()
    // the walker must have tripped the alert by the final batch,
    // and the twin must never have
    assert(lastDrift > 0.2)
    val fin = StreamingPsi.psiOf(spark.table("psi_counts"), "base", 8)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(fin("drift") && !fin("twin"))
  }
}
