package graft.streaming

import java.sql.Timestamp

/** The engine's stream row type — the Pulsar message envelope as
  * copied by the reference's data plane
  * (`PulsarPartitionSyncWorker.java:220-231`): opaque `byte[]` payload,
  * typed envelope. `key`/`eventTime` are optional; the reference's copy
  * rules (`key != null`, `eventTime != 0`) map to `None` here
  * (FIXTURES.md §A.1).
  */
case class PulsarMessage(
    tenant: String,
    namespace: String,
    topic: String,
    partition: Int, // -1 = non-partitioned
    ledgerId: Long,
    entryId: Long, // (ledgerId, entryId) = MessageId, lexicographic order
    value: Array[Byte],
    key: Option[String],
    eventTime: Option[Timestamp],
    publishTime: Timestamp,
    properties: Map[String, String])

/** Wire-format message as a raw source emits it, before the envelope
  * projection: `eventTimeMillis == 0` means "absent" and a null key
  * means "absent" (the two rules at
  * `PulsarPartitionSyncWorker.java:223-228`).
  */
case class RawMessage(
    tenant: String,
    namespace: String,
    topic: String,
    partition: Int,
    ledgerId: Long,
    entryId: Long,
    value: Array[Byte],
    key: String, // nullable
    eventTimeMillis: Long, // 0 = absent
    publishTimeMillis: Long,
    properties: Map[String, String])

/** Metadata-tree rows (control plane, FIXTURES.md §A.2). */
case class TenantRow(tenant: String, allowedClusters: Seq[String])
case class NamespaceRow(tenant: String, namespace: String, policiesJson: String)
case class TopicRow(
    tenant: String,
    namespace: String,
    topic: String,
    partitioned: Boolean,
    partitions: Int, // 0 if not partitioned
    properties: Map[String, String])

/** One physical partition to create on the destination (A13 fan-out
  * output; also emitted for partition-count growth on synced topics).
  */
case class PartitionRow(
    tenant: String,
    namespace: String,
    topic: String,
    partitionIndex: Int,
    physicalTopic: String)

/** One schema version of a topic (schema-sync extension — the
  * reference README's unimplemented goal; see
  * MetadataSync.schemaCreates).
  */
case class SchemaRow(
    tenant: String,
    namespace: String,
    topic: String,
    version: Int,
    schemaType: String, // e.g. AVRO | JSON | PROTOBUF | BYTES
    schemaJson: String)

/** Cursor statistics observation (FIXTURES.md §A.3). */
case class CursorStat(
    topic: String,
    partition: Int,
    cursor: String,
    readLedger: Long,
    readEntry: Long,
    observedTs: Timestamp)

/** One src→dst MessageId mapping (the reference's offset map entry). */
case class OffsetMapping(
    topic: String,
    partition: Int,
    srcLedger: Long,
    srcEntry: Long,
    dstLedger: Long,
    dstEntry: Long,
    recordedTs: Timestamp)
