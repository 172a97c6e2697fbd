package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.operators.Dedup

/** The chunk maintainer's claim: N id-ordered micro-batches leave
  * exactly the index one full [[Dedup.chunkDedup]] would, replays are
  * no-op ticks, and out-of-order ids fail loudly instead of silently
  * corrupting persisted outputs.
  */
class StreamingChunkMaintainerSpec extends SparkSuiteBase {

  private val corpus = Seq(
    (1L, "a b c d e f"),
    (2L, "a b c x y z"),          // shares "a b c" with doc 1
    (3L, "p q r s t u"),
    (10L, "x y z p q r new one here"), // shares chunks with 2 and 3
    (11L, "totally fresh words only"),
    (20L, "a b c p q r"))          // everything already seen

  private def outputsAt(dir: String): Map[Long, (String, Long, Long)] =
    spark.read.parquet(s"$dir/outputs")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_dedup"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_dropped")))).toMap

  private def fullMap(rows: Seq[(Long, String)]): Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    Dedup.chunkDedup(rows.toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("id-ordered micro-batches equal a single full chunk dedup") {
    import spark.implicits._
    val root = tmpDir("scm-root")
    val ckpt = tmpDir("scm-ckpt")
    val ms = MemoryStream[(Long, String)](spark, 1)
    val stream = ms.toDF().toDF("doc_id", "text")
    val q = StreamingChunkMaintainer.start(stream, "doc_id", "text",
        root, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      Seq(corpus.take(3), corpus.slice(3, 5), corpus.drop(5)).foreach { b =>
        ms.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val cur = StreamingChunkMaintainer.currentDir(spark, root)
    assert(cur.contains(s"$root/tick-2"), s"expected 3 committed ticks: $cur")
    assert(outputsAt(cur.get) == fullMap(corpus))
  }

  test("an empty or all-null-id bootstrap batch is a no-op, not a stream crash") {
    import spark.implicits._
    val root = tmpDir("scm-empty")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(StreamingChunkMaintainer.tick(empty, "doc_id", "text", root) == root)
    assert(StreamingChunkMaintainer.currentDir(spark, root).isEmpty)
    val nullIds = Seq((null.asInstanceOf[java.lang.Long], "x"))
      .toDF("doc_id", "text")
    assert(StreamingChunkMaintainer.tick(nullIds, "doc_id", "text", root) == root)
    // the first REAL batch still bootstraps normally afterwards
    val d0 = StreamingChunkMaintainer.tick(
      corpus.take(2).toDF("doc_id", "text"), "doc_id", "text", root)
    assert(d0 == s"$root/tick-0")
    assert(outputsAt(d0) == fullMap(corpus.take(2)))
  }

  test("replayed batches are no-op ticks; out-of-order ids fail loudly") {
    import spark.implicits._
    val root = tmpDir("scm-replay")
    val first = corpus.take(3).toDF("doc_id", "text")
    val d0 = StreamingChunkMaintainer.tick(first, "doc_id", "text", root)
    assert(d0 == s"$root/tick-0")
    val replayed = StreamingChunkMaintainer.tick(first, "doc_id", "text", root)
    assert(replayed == d0, "replayed batch must not advance the index")
    // mixed batch: replayed id 3 + fresh ids -> only fresh append, and
    // the result still equals the full re-mine
    val mixed = (corpus.slice(2, 5)).toDF("doc_id", "text")
    val d1 = StreamingChunkMaintainer.tick(mixed, "doc_id", "text", root)
    assert(d1 == s"$root/tick-1")
    assert(outputsAt(d1) == fullMap(corpus.take(5)))
    // an id BELOW the indexed max (not yet indexed, so the replay
    // filter passes it) must hit the operator's monotonicity require
    val stale = Seq((5L, "sneaky low id")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingChunkMaintainer.tick(stale, "doc_id", "text", root)
    }
    assert(e.getMessage.contains("id-monotonicity"))
    // the failed tick left no committed generation behind
    assert(StreamingChunkMaintainer.currentDir(spark, root).contains(d1))
  }
}
