package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.RawMessage

/** DataSource-V2 connector for the replication envelope stream —
  * the Spark-side half of the reference's consumer plane
  * (`PulsarPartitionSyncWorker.java:95-124`): one input partition per
  * physical (topic, partition), per-partition (ledgerId, entryId)
  * order preserved, replayable offsets = the reference's subscription
  * read position.
  *
  * The TRANSPORT is pluggable behind [[EnvelopeBroker]]: the live
  * binding over the Pulsar reader/admin API is
  * `graft.sources.PulsarEnvelopeBroker` in the compile-off
  * `src/live-pulsar` source set (the pulsar-client jars cannot exist
  * in the offline build — set GRAFT_PULSAR_JARS to compile it and
  * PulsarBrokerTCKSpec to certify it); tests and the offline harness
  * use [[InMemoryBroker]] / [[FileBroker]] / the socket broker. All
  * the Spark machinery — TableProvider, capabilities, batch planning,
  * micro-batch offsets/ranges, InternalRow encoding — is real and
  * exercised end-to-end (EnvelopeSourceSpec, incl. driving
  * [[graft.streaming.MessageMirror]] from this source).
  *
  * Usage:
  * {{{
  *   spark.readStream.format("pulsar-envelope")
  *     .option("broker", "<registered broker name>").load()
  * }}}
  */
class EnvelopeSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "pulsar-envelope"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EnvelopeSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    // option keys reach getTable lowercased — go through the
    // case-insensitive wrapper
    val opts = new CaseInsensitiveStringMap(properties)
    val broker = opts.get("broker")
    require(broker != null && broker.nonEmpty,
      "option 'broker' (a registered EnvelopeBroker name) is required")
    val maxRecords = Option(opts.get("maxRecordsPerMicroBatch")).map(_.toLong)
    maxRecords.foreach(m => require(m > 0,
      s"maxRecordsPerMicroBatch must be positive, got $m"))
    new EnvelopeTable(broker, maxRecords)
  }
}

object EnvelopeSource {
  /** The wire schema is exactly [[RawMessage]] (FIXTURES.md §A.1). */
  val schema: StructType = Encoders.product[RawMessage].schema
}

/** Read-side transport: what a live connector implements over the
  * Pulsar reader API. Positions are (ledgerId, entryId) pairs ordered
  * lexicographically; `latest` returns the EXCLUSIVE end position
  * (one past the last message).
  *
  * BINDING CONTRACT: any implementation must pass the conformance kit
  * (`graft.sources.EnvelopeBrokerTCK` in the test sources — extend it
  * with a `newBroker()` provisioning the real backend). The TCK pins
  * the six clauses the replication pipeline leans on: per-partition
  * (ledger, entry) order, inclusive/exclusive range semantics,
  * side-effect-free replayable reads, MessageId-idempotent append,
  * read-consistent `advance`, and partition discovery with monotonic
  * `latest`. Passing it is the drop-in criterion for replacing
  * [[InMemoryBroker]] with a live transport.
  */
trait EnvelopeBroker {
  def topicPartitions: Seq[(String, Int)]
  /** Messages with from <= (ledger, entry) < until, in order. */
  def read(topic: String, partition: Int,
      from: (Long, Long), until: (Long, Long)): Iterator[RawMessage]
  def latest(topic: String, partition: Int): (Long, Long)

  /** Position after skipping at most `n` messages forward from `from`
    * (never past `until`), plus how many were skipped. Used by
    * admission control on the DRIVER — the default walks `read`, which
    * is fine in-memory but pulls payloads through the driver on a live
    * transport; a real implementation should override with a
    * metadata-only seek (e.g. ledger entry counts).
    */
  def advance(topic: String, partition: Int,
      from: (Long, Long), until: (Long, Long), n: Long): ((Long, Long), Long) = {
    val it = read(topic, partition, from, until)
    var last = from
    var skipped = 0L
    while (it.hasNext && skipped < n) {
      val m = it.next()
      last = (m.ledgerId, m.entryId + 1)
      skipped += 1
    }
    (last, skipped)
  }
}

/** JVM-wide broker registry (valid under local[*], where executors
  * share the driver JVM — same pattern as the InMemory* test fakes;
  * a live implementation would construct its client from connection
  * options instead).
  */
object EnvelopeBrokerRegistry {
  private val brokers = new ConcurrentHashMap[String, EnvelopeBroker]()
  def register(name: String, broker: EnvelopeBroker): Unit =
    brokers.put(name, broker)
  def get(name: String): EnvelopeBroker = {
    val b = brokers.get(name)
    require(b != null, s"no EnvelopeBroker registered under '$name'")
    b
  }
}

/** Write-side transport: what a live connector implements over a
  * Pulsar producer. `append` MUST be idempotent on the MessageId
  * (topic, partition, ledgerId, entryId) — streaming epochs replay on
  * failure (at-least-once), and MessageId dedup is what upgrades the
  * pipeline to effectively-once (same contract as
  * [[graft.streaming.DestinationSink]]).
  */
trait WritableEnvelopeBroker {
  def append(m: RawMessage): Unit
}

/** In-memory transport: per-partition message log keyed by MessageId
  * (duplicate appends are no-ops), sorted on read.
  */
class InMemoryBroker extends EnvelopeBroker with WritableEnvelopeBroker {
  private val logs =
    new ConcurrentHashMap[(String, Int), ConcurrentHashMap[(Long, Long), RawMessage]]()

  override def append(m: RawMessage): Unit =
    logs.computeIfAbsent((m.topic, m.partition),
      _ => new ConcurrentHashMap[(Long, Long), RawMessage]())
      .putIfAbsent((m.ledgerId, m.entryId), m)

  def add(msgs: RawMessage*): Unit = msgs.foreach(append)

  override def topicPartitions: Seq[(String, Int)] =
    logs.keySet().asScala.toSeq.sorted

  private def sorted(topic: String, partition: Int): Seq[RawMessage] = {
    val log = logs.get((topic, partition))
    if (log == null) Seq.empty
    else log.values.asScala.toSeq.sortBy(m => (m.ledgerId, m.entryId))
  }

  override def read(topic: String, partition: Int,
      from: (Long, Long), until: (Long, Long)): Iterator[RawMessage] =
    sorted(topic, partition).iterator.filter { m =>
      val pos = (m.ledgerId, m.entryId)
      Ordering[(Long, Long)].lteq(from, pos) &&
        Ordering[(Long, Long)].lt(pos, until)
    }

  override def latest(topic: String, partition: Int): (Long, Long) = {
    val s = sorted(topic, partition)
    if (s.isEmpty) (0L, 0L)
    else {
      val last = s.last
      (last.ledgerId, last.entryId + 1) // exclusive end
    }
  }
}

private[sources] class EnvelopeTable(
    brokerName: String,
    maxRecordsPerMicroBatch: Option[Long] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = s"pulsar-envelope($brokerName)"
  override def schema(): StructType = EnvelopeSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EnvelopeScanBuilder(brokerName, maxRecordsPerMicroBatch)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new EnvelopeWrite(brokerName)
    }
}

/** Column pruning (SupportsPushDownRequiredColumns): a projection-only
  * consumer (e.g. an offset audit reading `(topic, entryId)`) gets a
  * scan whose readers emit just those fields — the payload bytes never
  * leave the reader.
  */
private[sources] class EnvelopeScanBuilder(
    brokerName: String,
    maxRecordsPerMicroBatch: Option[Long])
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  private var required: StructType = EnvelopeSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new EnvelopeScan(brokerName, maxRecordsPerMicroBatch, required)
}

private[sources] class EnvelopeScan(
    brokerName: String,
    maxRecordsPerMicroBatch: Option[Long] = None,
    required: StructType = EnvelopeSource.schema) extends Scan {
  override def readSchema(): StructType = required
  override def description(): String = s"pulsar-envelope($brokerName)"

  private def readerFactory = EnvelopeReaderFactory(required)

  /** Batch scan: every partition read from its beginning to `latest`
    * — the reference's Earliest-position backfill (A14).
    */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val broker = EnvelopeBrokerRegistry.get(brokerName)
      broker.topicPartitions.map { case (t, p) =>
        val (el, ee) = broker.latest(t, p)
        EnvelopeInputPartition(brokerName, t, p, 0L, 0L, el, ee): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = readerFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EnvelopeMicroBatchStream(brokerName, maxRecordsPerMicroBatch, required)
}

/** Streaming offsets: per-partition exclusive end positions. Wire
  * format is `topic\u0001partition\u0001ledger\u0001entry` records
  * joined by `\u0002`, all on ONE line — Spark's offset log treats
  * each line of an offset's json as a separate SOURCE, so a multiline
  * encoding would corrupt recovery. The separators cannot appear in a
  * topic name; no JSON library dependency — the checkpoint just
  * round-trips the string.
  */
private[sources] case class EnvelopeOffset(
    positions: Map[(String, Int), (Long, Long)]) extends Offset {
  override def json(): String =
    positions.toSeq.sortBy(_._1).map { case ((t, p), (l, e)) =>
      Seq(t, p.toString, l.toString, e.toString).mkString("\u0001")
    }.mkString("\u0002")
}

private[sources] object EnvelopeOffset {
  def fromJson(s: String): EnvelopeOffset =
    EnvelopeOffset(
      s.split("\u0002").filter(_.nonEmpty).map { line =>
        val parts = line.split("\u0001")
        ((parts(0), parts(1).toInt), (parts(2).toLong, parts(3).toLong))
      }.toMap)
}

/** Micro-batch stream: each batch covers (startOffset, latestOffset]
  * per partition. Partitions that appear on the broker AFTER the
  * stream started are picked up by the next `latestOffset` call with
  * an implicit (0,0) start — the reference's partition-discovery
  * behavior (A13/A21).
  *
  * Admission control: with `maxRecordsPerMicroBatch` set, each batch
  * admits at most that many records (greedy in partition order) — the
  * knob that chunks a huge Earliest backfill into bounded batches
  * instead of one giant catch-up batch (at 100 TB the difference
  * between steady progress + checkpoints and a week-long batch that
  * can only fail whole).
  */
private[sources] class EnvelopeMicroBatchStream(
    brokerName: String,
    maxRecordsPerMicroBatch: Option[Long] = None,
    required: StructType = EnvelopeSource.schema)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows}

  private def broker = EnvelopeBrokerRegistry.get(brokerName)

  // AvailableNow: the end captured at stream start; batches never read
  // past it even if the broker keeps growing. Implemented here (not
  // via Spark's wrapper) because the wrapper does not forward the
  // source's default read limit — admission control would silently
  // turn off under AvailableNow.
  @volatile private var availableNowEnd: Option[Map[(String, Int), (Long, Long)]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd =
      Some(latestOffset().asInstanceOf[EnvelopeOffset].positions)

  override def initialOffset(): Offset = EnvelopeOffset(Map.empty)

  override def latestOffset(): Offset =
    EnvelopeOffset(broker.topicPartitions.map { case (t, p) =>
      ((t, p), broker.latest(t, p))
    }.toMap)

  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerMicroBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def reportLatestOffset(): Offset = latestOffset()

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[EnvelopeOffset].positions
    val ord = Ordering[(Long, Long)]
    // per-partition end: broker latest, clamped to the AvailableNow
    // capture (partitions discovered after the capture wait for the
    // next run), and NEVER below the checkpointed start — a partition
    // transiently absent from the broker listing (admin hiccup, topic
    // recreation on a live transport) reports latest (0,0); without
    // the floor its checkpointed position would be overwritten and a
    // reappearing partition would silently replay its full history.
    def endFor(t: String, p: Int, s: (Long, Long)): (Long, Long) = {
      val live = broker.latest(t, p)
      val capped = availableNowEnd match {
        case Some(cap) => ord.min(live, cap.getOrElse((t, p), s))
        case None => live
      }
      ord.max(capped, s)
    }
    // the partition universe is the live listing UNION the
    // checkpointed start's keys: checkpointed positions must never
    // drop out of the offset map just because the broker listing
    // momentarily misses the partition
    val allTps = {
      val live = broker.topicPartitions
      live ++ start.keys.filterNot(live.toSet).toSeq.sorted
    }
    limit match {
      case mr: ReadMaxRows =>
        // FAIR allocation: an even per-partition quota first, then a
        // greedy sweep for the leftover — a purely greedy partition-
        // order allocation would let one deep partition starve the
        // rest for the whole backfill (skewed progress, lagging cursor
        // translation for the starved partitions). Live brokers
        // override advance with a metadata-only seek so no payload
        // crosses the driver here.
        val tps = allTps
        val ends = scala.collection.mutable.LinkedHashMap(
          tps.map(tp => tp -> start.getOrElse(tp, (0L, 0L))): _*)
        var remaining = mr.maxRows()
        val quota = math.max(1L, remaining / math.max(1, tps.size))
        var pass = 0
        while (pass < 2 && remaining > 0) {
          tps.foreach { case (t, p) =>
            if (remaining > 0) {
              val here = if (pass == 0) math.min(quota, remaining) else remaining
              val s = ends((t, p))
              val (last, n) = broker.advance(t, p, s, endFor(t, p, s), here)
              ends((t, p)) = last
              remaining -= n
            }
          }
          pass += 1
        }
        EnvelopeOffset(ends.toMap)
      case _ =>
        EnvelopeOffset(allTps.map { case (t, p) =>
          val s = start.getOrElse((t, p), (0L, 0L))
          ((t, p), endFor(t, p, s))
        }.toMap)
    }
  }

  override def deserializeOffset(json: String): Offset =
    EnvelopeOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EnvelopeOffset].positions
    val e = end.asInstanceOf[EnvelopeOffset].positions
    e.toSeq.sortBy(_._1).flatMap { case ((t, p), (el, ee)) =>
      val (sl, se) = s.getOrElse((t, p), (0L, 0L))
      if (Ordering[(Long, Long)].lt((sl, se), (el, ee)))
        Some(EnvelopeInputPartition(brokerName, t, p, sl, se, el, ee): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    EnvelopeReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Write path: every task appends rows to the broker through the
  * MessageId-idempotent [[WritableEnvelopeBroker.append]]; commit is a
  * no-op because idempotence (not coordinator-side atomicity) is the
  * delivery contract — a replayed task/epoch re-appends the same
  * MessageIds harmlessly, exactly the mirror sink's at-least-once →
  * effectively-once upgrade (A14).
  */
private[sources] class EnvelopeWrite(brokerName: String)
    extends org.apache.spark.sql.connector.write.Write {
  import org.apache.spark.sql.connector.write._

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      EnvelopeWriterFactory(brokerName)
    override def commit(messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }

  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
      override def createStreamingWriterFactory(info: PhysicalWriteInfo)
          : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
        EnvelopeWriterFactory(brokerName)
      override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
      override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
    }
}

/** Serializable factory shipped to executors (carries only the broker
  * name; the broker itself is resolved from the registry task-side).
  */
private[sources] case class EnvelopeWriterFactory(brokerName: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory
    with org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new EnvelopeDataWriter(brokerName)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new EnvelopeDataWriter(brokerName)
}

private[sources] class EnvelopeDataWriter(brokerName: String)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val deserializer =
    ExpressionEncoder[RawMessage]().resolveAndBind().createDeserializer()
  private val broker = EnvelopeBrokerRegistry.get(brokerName) match {
    case w: WritableEnvelopeBroker => w
    case other => throw new IllegalArgumentException(
      s"broker '$brokerName' (${other.getClass.getName}) is not writable")
  }
  override def write(record: InternalRow): Unit =
    broker.append(deserializer(record))
  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage =
    new org.apache.spark.sql.connector.write.WriterCommitMessage {}
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

/** One physical (topic, partition) slice — the planning unit, exactly
  * the reference's one-consumer-per-partition (A13).
  */
private[sources] case class EnvelopeInputPartition(
    brokerName: String,
    topic: String,
    partition: Int,
    fromLedger: Long, fromEntry: Long,
    untilLedger: Long, untilEntry: Long) extends InputPartition

private[sources] case class EnvelopeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EnvelopeInputPartition]
    new PartitionReader[InternalRow] {
      private val serializer =
        ExpressionEncoder[RawMessage]().createSerializer()
      // project the full envelope row down to the pruned schema with a
      // codegen'd UnsafeProjection over bound field references
      private val full = EnvelopeSource.schema
      private val project =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
          required.fields.toSeq.map { f =>
            val i = full.fieldIndex(f.name)
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              i, f.dataType, f.nullable): org.apache.spark.sql.catalyst.expressions.Expression
          })
      private val it = EnvelopeBrokerRegistry.get(p.brokerName)
        .read(p.topic, p.partition,
          (p.fromLedger, p.fromEntry), (p.untilLedger, p.untilEntry))
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = project(serializer(it.next())).copy(); true }
        else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
