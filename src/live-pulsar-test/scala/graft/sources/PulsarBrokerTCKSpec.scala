package graft.sources

/** Certifies the live Pulsar binding against the SAME conformance kit
  * the in-memory, file, and socket transports pass — the drop-in
  * criterion stated in [[EnvelopeBroker]]'s contract. Compile-off with
  * the binding itself (see build.sbt / GRAFT_PULSAR_JARS); running it
  * needs a standalone broker:
  *
  * {{{
  *   pulsar standalone &          # broker with default ports
  *   GRAFT_PULSAR_JARS=... \
  *   PULSAR_SERVICE_URL=pulsar://localhost:6650 \
  *   PULSAR_ADMIN_URL=http://localhost:8080 \
  *     sbt "testOnly graft.sources.PulsarBrokerTCKSpec"
  * }}}
  *
  * Prerequisite for the IDEMPOTENCE/CONCURRENCY clauses:
  * `brokerDeduplicationEnabled=true` on the test tenant (the binding's
  * producer-dedup mapping, PulsarEnvelopeBroker clause 4) — the
  * provisioning below sets it per namespace through the admin API.
  *
  * Each `newBroker()` provisions a FRESH namespace (the TCK requires
  * an empty broker per test), so runs are isolated and repeatable.
  */
class PulsarBrokerTCKSpec extends EnvelopeBrokerTCK {

  private val serviceUrl =
    sys.env.getOrElse("PULSAR_SERVICE_URL", "pulsar://localhost:6650")
  private val adminUrl =
    sys.env.getOrElse("PULSAR_ADMIN_URL", "http://localhost:8080")

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)
  private val runId = java.util.UUID.randomUUID().toString.take(8)

  override def brokerName: String = "PulsarEnvelopeBroker"

  override def newBroker(): EnvelopeBroker with WritableEnvelopeBroker = {
    val ns = s"public/graft-tck-$runId-${counter.incrementAndGet()}"
    val admin = org.apache.pulsar.client.admin.PulsarAdmin.builder()
      .serviceHttpUrl(adminUrl).build()
    try {
      admin.namespaces().createNamespace(ns)
      admin.namespaces().setDeduplicationStatus(ns, true)
    } finally admin.close()
    new PulsarEnvelopeBroker(serviceUrl, adminUrl, ns)
  }
}
