package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.operators.Sketches
import graft.streaming.StreamingHeavyHitters.Tok

/** Stream==batch for the Count-Min heavy-hitter monitor: the readout
  * over the running (lane, bucket) grid + vocabulary aggregate
  * equals the batch heavyHitters over the same prefix after EVERY
  * micro-batch — including the batch where a climber first crosses
  * the threshold. One-sided error is preserved: the stream readout
  * never misses a truly-heavy token.
  */
class StreamingHeavyHittersSpec extends SparkSuiteBase {

  import spark.implicits._

  private val LANES = 3
  private val WIDTH = 64

  test("running-grid readout == batch heavyHitters after every prefix") {
    val ms = MemoryStream[Tok](spark, 1)
    val qc = StreamingHeavyHitters.cmCounts(ms.toDS(), LANES, WIDTH)
      .writeStream.format("memory").queryName("hh_counts")
      .outputMode("complete").start()
    val qv = StreamingHeavyHitters.vocab(ms.toDS())
      .writeStream.format("memory").queryName("hh_vocab")
      .outputMode("complete").start()
    // "whale" is heavy from batch 1; "climber" accumulates and only
    // crosses minCount=12 in batch 3; the long tail stays light
    val batches = Seq(
      Seq.fill(15)(Tok("whale")) ++ Seq.fill(5)(Tok("climber")) ++
        (0 until 10).map(i => Tok(s"tail$i")),
      Seq.fill(3)(Tok("whale")) ++ Seq.fill(4)(Tok("climber")) ++
        (0 until 10).map(i => Tok(s"tail${i + 10}")),
      Seq.fill(4)(Tok("climber")) ++ Seq(Tok("tail3"), Tok("tail7")))
    var fed = Seq.empty[Tok]
    batches.foreach { b =>
      ms.addData(b: _*)
      qc.processAllAvailable(); qv.processAllAvailable()
      fed = fed ++ b
      val stream = StreamingHeavyHitters.heavyOf(
          spark.table("hh_counts"), spark.table("hh_vocab"),
          LANES, WIDTH, minCount = 12L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = Sketches.heavyHitters(
          fed.map(_.token).toDF("text"), "text",
          LANES, WIDTH, minCount = 12L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(stream == batch, s"prefix ${fed.size}: $stream vs $batch")
      // one-sided error: every truly-heavy token is reported
      val exact = fed.groupBy(_.token).view.mapValues(_.size).toMap
        .filter(_._2 >= 12)
      exact.keys.foreach(t =>
        assert(stream.contains(t), s"missed true heavy hitter $t"))
    }
    qc.stop(); qv.stop()
    val fin = StreamingHeavyHitters.heavyOf(spark.table("hh_counts"),
        spark.table("hh_vocab"), LANES, WIDTH, 12L)
      .collect().map(_.getString(0)).toSet
    assert(fin.contains("whale") && fin.contains("climber"))
  }
}
