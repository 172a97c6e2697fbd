package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.operators.Dedup

/** The streaming index maintainer's claim is the incremental index's
  * EXACTNESS claim lifted to micro-batches, plus the replay semantics
  * foreachBatch imposes: N batches through the sink must leave the
  * same index a single full re-mine would, and a replayed batch (the
  * at-least-once case) must be a no-op tick.
  */
class StreamingIndexMaintainerSpec extends SparkSuiteBase {

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta", "en"),
    (2L, "alpha beta gamma delta epsilon eta", "en"),
    (3L, "one two three four five six", "en"),
    (10L, "alpha beta gamma delta epsilon theta", "en"),
    (11L, "seven eight nine ten eleven twelve", "en"),
    (20L, "one two three four five seven", "en"),
    (21L, "completely unrelated text lives here", "en"))

  private def labelsAt(dir: String): Map[Long, Long] =
    spark.read.parquet(s"$dir/labels")
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("cluster"))
      .toMap

  test("micro-batched ticks equal a single full re-mine") {
    import spark.implicits._
    val root = tmpDir("sim-root")
    val ckpt = tmpDir("sim-ckpt")
    val ms = MemoryStream[(Long, String, String)](spark, 1)
    val stream = ms.toDF().toDF("doc_id", "text", "lang")
    // ProcessingTime(0), not the AvailableNow default: the data is
    // added AFTER the query starts, and AvailableNow would drain the
    // (empty) source and terminate before the first batch arrives
    val q = StreamingIndexMaintainer.start(stream, "doc_id", "text",
        "lang", root, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
        threshold = 0.5).start()
    try {
      Seq(corpus.take(3), corpus.slice(3, 5), corpus.drop(5)).foreach { b =>
        ms.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val cur = StreamingIndexMaintainer.currentDir(spark, root)
    assert(cur.contains(s"$root/tick-2"), s"expected 3 committed ticks: $cur")
    val all = corpus.toDF("doc_id", "text", "lang")
    val fullPairs = Dedup.ngramJaccardPairs(all, "doc_id", "text", "lang",
      n = 3, threshold = 0.5)
    val fullLabels = Dedup.clusters(all, "doc_id", fullPairs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
      .toMap
    assert(labelsAt(cur.get) == fullLabels,
      "streamed index diverges from the full re-mine")
  }

  test("a fully-replayed batch is a no-op tick; half-ticks are cleaned up") {
    import spark.implicits._
    val root = tmpDir("sim-replay")
    val first = corpus.take(3).toDF("doc_id", "text", "lang")
    val d0 = StreamingIndexMaintainer.tick(first, "doc_id", "text", "lang",
      root, threshold = 0.5)
    assert(d0 == s"$root/tick-0")

    // replay the SAME batch (crash between tick commit and checkpoint
    // commit): every id is already indexed -> no new tick dir
    val replayed = StreamingIndexMaintainer.tick(first, "doc_id", "text",
      "lang", root, threshold = 0.5)
    assert(replayed == d0, "replayed batch must not advance the index")
    assert(StreamingIndexMaintainer.currentDir(spark, root).contains(d0))

    // a crashed half-tick (dir present, no marker) is removed and the
    // tick re-derived cleanly on the next attempt
    val half = new java.io.File(s"$root/tick-1")
    assert(half.mkdirs())
    assert(new java.io.File(half, "garbage").createNewFile())
    val delta = corpus.slice(3, 5).toDF("doc_id", "text", "lang")
    val d1 = StreamingIndexMaintainer.tick(delta, "doc_id", "text", "lang",
      root, threshold = 0.5)
    assert(d1 == s"$root/tick-1")
    assert(!new java.io.File(half, "garbage").exists(),
      "half-tick garbage must be cleaned before the rebuild")
    // mixed batch: one replayed id, one fresh -> only the fresh id appends
    val mixed = (corpus.slice(4, 5) ++ corpus.drop(5))
      .toDF("doc_id", "text", "lang")
    val d2 = StreamingIndexMaintainer.tick(mixed, "doc_id", "text", "lang",
      root, threshold = 0.5)
    val all = corpus.toDF("doc_id", "text", "lang")
    val fullPairs = Dedup.ngramJaccardPairs(all, "doc_id", "text", "lang",
      n = 3, threshold = 0.5)
    val fullLabels = Dedup.clusters(all, "doc_id", fullPairs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
      .toMap
    assert(labelsAt(d2) == fullLabels)
  }

  test("intra-batch duplicate ids collapse to one row per doc") {
    import spark.implicits._
    val root = tmpDir("sim-intra")
    // bootstrap batch delivers doc 1 twice (at-least-once inside ONE
    // micro-batch); the index must hold each id exactly once
    val dup0 = (corpus.take(3) ++ corpus.take(1)).toDF("doc_id", "text", "lang")
    val d0 = StreamingIndexMaintainer.tick(dup0, "doc_id", "text", "lang",
      root, threshold = 0.5)
    val docs0 = spark.read.parquet(s"$d0/docs")
    assert(docs0.count() == docs0.select("doc").distinct().count(),
      "bootstrap tick must not index a doc twice")
    // append batch with an internal duplicate AND a replayed id
    val dup1 = (corpus.slice(3, 5) ++ corpus.slice(3, 4) ++ corpus.take(1))
      .toDF("doc_id", "text", "lang")
    val d1 = StreamingIndexMaintainer.tick(dup1, "doc_id", "text", "lang",
      root, threshold = 0.5)
    val docs1 = spark.read.parquet(s"$d1/docs")
    assert(docs1.count() == 5 &&
      docs1.select("doc").distinct().count() == 5,
      "append tick must dedupe within the batch before the anti-join")
    // and the labels still equal the full re-mine over the 5 docs
    val all = corpus.take(5).toDF("doc_id", "text", "lang")
    val fullLabels = Dedup.clusters(all, "doc_id",
        Dedup.ngramJaccardPairs(all, "doc_id", "text", "lang", 3, 0.5))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
      .toMap
    assert(labelsAt(d1) == fullLabels)
  }
}
