package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuiteBase
import graft.streaming.{InMemoryCluster, MessageMirror, RawMessage}

object EnvelopeSourceSpec {
  /** JVM-wide drain buffer for the checkpoint-resume test (foreachBatch
    * runs on executors; valid under local[*]).
    */
  val drained = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long, Long)]()
}

/** The DataSource-V2 envelope connector: partition planning mirrors
  * the reference's one-consumer-per-partition, offsets are replayable
  * checkpoint positions, and the whole mirror topology runs off it.
  */
class EnvelopeSourceSpec extends SparkSuiteBase {

  private val fmt = classOf[EnvelopeSource].getName

  private def raw(topic: String, part: Int, ledger: Long, entry: Long): RawMessage =
    RawMessage("t1", "ns1", topic, part, ledger, entry,
      s"$topic-$part-$ledger-$entry".getBytes("UTF-8"), null, 0L,
      1700000000000L + entry, Map.empty)

  test("batch read: full backfill, one Spark partition per (topic, partition)") {
    val broker = new InMemoryBroker
    EnvelopeBrokerRegistry.register("es-batch", broker)
    broker.add(raw("a", 0, 1, 0), raw("a", 0, 1, 1), raw("a", 1, 1, 0),
      raw("b", 0, 2, 5))
    val df = spark.read.format(fmt).option("broker", "es-batch").load()
    assert(df.schema == EnvelopeSource.schema)
    assert(df.count() == 4)
    assert(df.rdd.getNumPartitions == 3) // (a,0), (a,1), (b,0)
    val got = df.select("topic", "partition", "ledgerId", "entryId")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("a", 0, 1L, 0L), ("a", 0, 1L, 1L), ("a", 1, 1L, 0L),
      ("b", 0, 2L, 5L)))
  }

  test("column pruning reaches the scan: projection-only read emits pruned rows") {
    val broker = new InMemoryBroker
    EnvelopeBrokerRegistry.register("es-prune", broker)
    broker.add(raw("p", 0, 1, 0), raw("p", 0, 1, 1))
    val df = spark.read.format(fmt).option("broker", "es-prune").load()
      .select("topic", "entryId")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("p", 0L), ("p", 1L)))
    // the scan's output schema itself is pruned (not a post-scan
    // projection): BatchScan output carries exactly the two columns
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("topic") && scanLine.contains("entryId")
      && !scanLine.contains("value") && !scanLine.contains("properties"),
      s"scan not pruned: $scanLine")
  }

  test("short name resolves via DataSourceRegister") {
    val broker = new InMemoryBroker
    EnvelopeBrokerRegistry.register("es-short", broker)
    broker.add(raw("s", 0, 1, 0))
    val n = spark.read.format("pulsar-envelope")
      .option("broker", "es-short").load().count()
    assert(n == 1)
  }

  test("streaming: checkpointed offsets resume exactly where the last run stopped") {
    val broker = new InMemoryBroker
    EnvelopeBrokerRegistry.register("es-stream", broker)
    broker.add(raw("s", 0, 1, 0), raw("s", 0, 1, 1))
    val ckpt = tmpDir("es-stream-ckpt")

    // one drain = a fresh AvailableNow query against the SAME
    // checkpoint (the memory sink refuses checkpoint recovery, so the
    // collector is a foreachBatch into a JVM-wide buffer)
    def drainCount(): Long = {
      EnvelopeSourceSpec.drained.clear()
      val q = spark.readStream.format(fmt).option("broker", "es-stream").load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.select("topic", "partition", "ledgerId", "entryId").collect()
            .foreach(r => EnvelopeSourceSpec.drained.add(
              (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))))
        }
        .start()
      q.awaitTermination()
      EnvelopeSourceSpec.drained.size().toLong
    }
    assert(drainCount() == 2)
    // new messages + a NEW partition appear after the first run: the
    // next run reads ONLY the delta (offsets came from the checkpoint)
    broker.add(raw("s", 0, 1, 2), raw("s", 1, 1, 0))
    assert(drainCount() == 2)
    assert(EnvelopeSourceSpec.drained.contains(("s", 1, 1L, 0L)))
    // nothing new: third run reads nothing
    assert(drainCount() == 0)
  }

  test("per-partition order is preserved within Spark partitions") {
    val broker = new InMemoryBroker
    EnvelopeBrokerRegistry.register("es-order", broker)
    // insert out of order; the broker log sorts by (ledger, entry)
    broker.add(raw("o", 0, 2, 0), raw("o", 0, 1, 1), raw("o", 0, 1, 0))
    val df = spark.read.format(fmt).option("broker", "es-order").load()
    val perPart = df.select("ledgerId", "entryId").rdd
      .mapPartitions(it => Iterator(it.map(r => (r.getLong(0), r.getLong(1))).toSeq))
      .collect().filter(_.nonEmpty)
    assert(perPart.length == 1)
    assert(perPart.head == perPart.head.sorted)
  }

  test("admission control: maxRecordsPerMicroBatch chunks the backfill into bounded batches") {
    val broker = new InMemoryBroker
    EnvelopeBrokerRegistry.register("es-limit", broker)
    (0L until 5L).foreach(e => broker.add(raw("l", 0, 1, e)))
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format(fmt)
      .option("broker", "es-limit")
      .option("maxRecordsPerMicroBatch", "2").load()
      .writeStream
      .option("checkpointLocation", tmpDir("es-limit-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val n = batch.count()
        if (n > 0) sizes.add(n): Unit
      }
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val got = sizes.asScala.toSeq
    assert(got.sum == 5, s"all messages must arrive, got $got")
    assert(got.forall(_ <= 2), s"every batch must respect the limit, got $got")
    assert(got.length >= 3, s"the backfill must be chunked, got $got")
  }

  test("admission control allocates the batch budget fairly across partitions") {
    val broker = new InMemoryBroker
    EnvelopeBrokerRegistry.register("es-fair", broker)
    // two equally deep partitions; a greedy allocator would spend the
    // whole first batch on partition 0
    (0L until 4L).foreach { e =>
      broker.add(raw("f", 0, 1, e)); broker.add(raw("f", 1, 1, e))
    }
    val firstBatch = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val q = spark.readStream.format(fmt)
      .option("broker", "es-fair")
      .option("maxRecordsPerMicroBatch", "4").load()
      .writeStream
      .option("checkpointLocation", tmpDir("es-fair-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (id == 0)
          batch.select("partition", "entryId").collect()
            .foreach(r => firstBatch.add((r.getInt(0), r.getLong(1)))): Unit
      }
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val byPartition = firstBatch.asScala.toSeq.groupBy(_._1).view.mapValues(_.size).toMap
    // batch 0 carries 2 messages from EACH partition, not 4 from one
    assert(byPartition == Map(0 -> 2, 1 -> 2), s"unfair first batch: $byPartition")
  }

  test("a partition transiently absent from the broker listing keeps its checkpointed position") {
    val inner = new InMemoryBroker
    inner.add(raw("tp", 0, 1, 0), raw("tp", 0, 1, 1), raw("tp", 1, 1, 0))
    // a broker whose listing can transiently hide partition 1 (admin
    // hiccup / topic recreation on a live transport)
    var hide = false
    val flaky = new EnvelopeBroker {
      override def topicPartitions: Seq[(String, Int)] =
        inner.topicPartitions.filterNot(tp => hide && tp == (("tp", 1)))
      override def read(topic: String, partition: Int,
          from: (Long, Long), until: (Long, Long)): Iterator[RawMessage] =
        inner.read(topic, partition, from, until)
      override def latest(topic: String, partition: Int): (Long, Long) =
        if (hide && topic == "tp" && partition == 1) (0L, 0L)
        else inner.latest(topic, partition)
    }
    EnvelopeBrokerRegistry.register("flaky-listing", flaky)
    val stream = new EnvelopeMicroBatchStream("flaky-listing", None)
    val start = stream.latestOffset().asInstanceOf[EnvelopeOffset]
    assert(start.positions(("tp", 1)) == ((1L, 1L)))
    hide = true
    // with the partition hidden, its checkpointed position must be
    // carried forward unchanged — not rebuilt from (0,0)
    val next = stream.latestOffset(start,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      .asInstanceOf[EnvelopeOffset]
    assert(next.positions(("tp", 1)) == ((1L, 1L)),
      s"hidden partition lost its position: ${next.positions}")
    // and nothing replays when it reappears
    hide = false
    val after = stream.latestOffset(next,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      .asInstanceOf[EnvelopeOffset]
    assert(after.positions(("tp", 1)) == ((1L, 1L)))
    val parts = stream.planInputPartitions(next, after)
    assert(!parts.exists(_.asInstanceOf[EnvelopeInputPartition].partition == 1),
      "reappearing partition must not replay history")
  }

  test("batch write: rows land on the broker, replays are MessageId-idempotent") {
    import spark.implicits._
    val broker = new InMemoryBroker
    EnvelopeBrokerRegistry.register("es-write", broker)
    val df = Seq(raw("w", 0, 1, 0), raw("w", 0, 1, 1), raw("w", 1, 2, 0)).toDF()
    df.write.format(fmt).option("broker", "es-write").mode("append").save()
    assert(broker.topicPartitions == Seq(("w", 0), ("w", 1)))
    // replay the same frame: duplicate MessageIds are no-ops
    df.write.format(fmt).option("broker", "es-write").mode("append").save()
    val back = spark.read.format(fmt).option("broker", "es-write").load()
    assert(back.count() == 3)
  }

  test("streaming round trip: DSv2 source to DSv2 sink, cross-broker") {
    val a = new InMemoryBroker
    val b = new InMemoryBroker
    EnvelopeBrokerRegistry.register("es-rt-a", a)
    EnvelopeBrokerRegistry.register("es-rt-b", b)
    a.add(raw("r", 0, 1, 0), raw("r", 0, 1, 1), raw("r", 1, 1, 0))
    val q = spark.readStream.format(fmt).option("broker", "es-rt-a").load()
      .writeStream.format(fmt).option("broker", "es-rt-b")
      .option("checkpointLocation", tmpDir("es-rt-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.format(fmt).option("broker", "es-rt-b").load()
      .select("topic", "partition", "ledgerId", "entryId")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("r", 0, 1L, 0L), ("r", 0, 1L, 1L), ("r", 1, 1L, 0L)))
  }

  test("end-to-end: MessageMirror drains the DSv2 source into a destination cluster") {
    val broker = new InMemoryBroker
    EnvelopeBrokerRegistry.register("es-e2e", broker)
    broker.add(raw("tp", 0, 5, 1), raw("tp", 0, 5, 2), raw("tp", 1, 5, 1))
    val sink = new InMemoryCluster("es-e2e-dst")
    sink.clear()
    val src = spark.readStream.format(fmt).option("broker", "es-e2e").load()
    val q = MessageMirror.start(src, sink, tmpDir("es-e2e-ckpt"),
      Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(sink.messages.map(m => (m.topic, m.partition, m.ledgerId, m.entryId)).toSet
      == Set(("tp", 0, 5L, 1L), ("tp", 0, 5L, 2L), ("tp", 1, 5L, 1L)))
    // late messages: a second mirror run from the SAME checkpoint...
    // (fresh query, new checkpoint semantics differ; reuse checkpoint)
    broker.add(raw("tp", 0, 5, 3))
    val q2 = MessageMirror.start(src, sink, tmpDir("es-e2e-ckpt2"),
      Trigger.AvailableNow()).start()
    q2.awaitTermination()
    // replay through a fresh checkpoint re-reads everything; the
    // MessageId-idempotent sink absorbs the duplicates (at-least-once)
    assert(sink.messages.size == 4)
  }
}
