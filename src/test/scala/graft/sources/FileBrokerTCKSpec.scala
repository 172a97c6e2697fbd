package graft.sources

import graft.streaming.RawMessage

/** The durable file-backed transport passes the SAME contract suite
  * as the in-memory broker — the TCK's reusability is the point: a
  * live Pulsar binding is one more `newBroker()` away.
  */
class FileBrokerTCKSpec extends EnvelopeBrokerTCK with graft.SparkSuiteBase {
  override def newBroker(): EnvelopeBroker with WritableEnvelopeBroker =
    new FileBroker(
      java.nio.file.Files.createTempDirectory("file-broker-tck").toString)
  override def brokerName: String = "FileBroker"

  test("[FileBroker] foreign directories and files don't break discovery") {
    val dir = java.nio.file.Files.createTempDirectory("file-broker-foreign").toString
    val b = new FileBroker(dir)
    b.append(graft.streaming.RawMessage("t", "ns", "real", 0, 1L, 0L,
      "x".getBytes("UTF-8"), null, 0L, 100L, Map.empty))
    // tooling leftovers: a dir with __ but no numeric suffix, a dir
    // with a non-base64 prefix, a stray file in a partition dir —
    // all used to throw NumberFormatException/IllegalArgumentException
    // out of discovery (round-5 advisor finding); they must be skipped
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "editor__backup"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "!!not-base64!!__3"))
    val partDir = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(p => p.getFileName.toString.endsWith("__0")).findFirst().get()
    java.nio.file.Files.write(partDir.resolve("README.txt"),
      "junk".getBytes("UTF-8"))
    assert(b.topicPartitions == Seq(("real", 0)))
    assert(b.read("real", 0, (0L, 0L), b.latest("real", 0)).size == 1)
  }

  test("[FileBroker] durability: a new broker over the same directory sees the log") {
    val dir = java.nio.file.Files.createTempDirectory("file-broker-dur").toString
    val a = new FileBroker(dir)
    val m = RawMessage("t", "ns", "topic/with/slashes", 3, 7L, 9L,
      Array[Byte](1, 2, 3), "k1", 0L, 42L, Map("a" -> "b", "c" -> "d:e,f"))
    a.append(m)
    // a FRESH instance (new JVM stand-in) over the same root
    val b = new FileBroker(dir)
    assert(b.topicPartitions == Seq(("topic/with/slashes", 3)))
    val got = b.read("topic/with/slashes", 3, (0L, 0L), b.latest("topic/with/slashes", 3)).toSeq
    assert(got.size == 1)
    val g = got.head
    assert(g.copy(value = null) == m.copy(value = null))
    assert(g.value.toSeq == m.value.toSeq)
  }

  test("[FileBroker] drives the DSv2 batch scan end to end") {
    val dir = java.nio.file.Files.createTempDirectory("file-broker-dsv2").toString
    val broker = new FileBroker(dir)
    (0L until 6L).foreach { e =>
      broker.append(RawMessage("t", "ns", "dsv2", 0, e / 3, e % 3,
        s"payload-$e".getBytes("UTF-8"), null, 0L, 100L + e, Map.empty))
    }
    EnvelopeBrokerRegistry.register("file-broker-dsv2-test", broker)
    val df = spark.read.format("pulsar-envelope")
      .option("broker", "file-broker-dsv2-test").load()
    assert(df.count() == 6)
    val positions = df.select("ledgerId", "entryId")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(positions == (0L until 6L).map(e => (e / 3, e % 3)))
  }
}
