package graft.streaming

import java.sql.Timestamp

import graft.{SparkSuiteBase, SyncMain}

/** E2E: the deployable entry point (`graft.SyncMain`) drives the whole
  * replication topology over durable [[FileCluster]] roots — metadata
  * tick, AvailableNow mirror through the DSv2 envelope source, offset
  * recording, cursor translation — and a SECOND invocation over the
  * same roots converges to a no-op (the restartable-backfill claim;
  * contrast the reference's `PulsarSyncStarter.java:26-33`, which
  * constructs the pipeline and starts nothing).
  */
class SyncMainSpec extends SparkSuiteBase {

  private def seedSource(root: String): FileCluster = {
    val src = new FileCluster(spark, root, "src-cluster")
    src.createTenants(Seq(TenantRow("acme", Seq("src-cluster"))))
    src.createNamespaces(Seq(NamespaceRow("acme", "prod", """{"retention":7}""")))
    src.createTopics(Seq(
      TopicRow("acme", "prod", "tp", partitioned = true, partitions = 2, Map("team" -> "data"))))
    src.addMessages(
      RawMessage("acme", "prod", "tp", 0, 5, 0, "a0".getBytes("UTF-8"),
        null, 0L, 1700000000000L, Map.empty),
      RawMessage("acme", "prod", "tp", 0, 5, 1, "a1".getBytes("UTF-8"),
        "k1", 1700000001000L, 1700000060000L, Map("h" -> "v")),
      RawMessage("acme", "prod", "tp", 1, 7, 0, "b0".getBytes("UTF-8"),
        null, 0L, 1700000120000L, Map.empty))
    // consumer observed at src position (5,1) on partition 0
    src.observeCursor(CursorStat("tp", 0, "sub", 5, 1,
      Timestamp.valueOf("2024-01-01 10:00:00")))
    src
  }

  test("SyncMain --once: full topology end-to-end over file roots, idempotent re-run") {
    val srcRoot = tmpDir("sm-src")
    val dstRoot = tmpDir("sm-dst")
    seedSource(srcRoot)

    val args = SyncMain.parse(Array(
      "--src", srcRoot, "--dst", dstRoot, "--once",
      "--subscription", "smoke", "--cluster-name", "dst-east"))
    assert(SyncMain.run(spark, args) == 0)

    val dst = new FileCluster(spark, dstRoot, "dst-east")
    // control plane landed, allowedClusters rewritten to the dst id
    assert(dst.tenants.collect().map(_.getString(0)).toSeq == Seq("acme"))
    assert(dst.namespaces.count() == 1)
    val topicRow = dst.topics.collect().head
    assert(topicRow.getAs[String]("topic") == "tp"
      && topicRow.getAs[Int]("partitions") == 2)

    // data plane: all three messages mirrored, per-partition order
    // kept, dst MessageIds assigned densely per partition
    val mirrored = dst.mirroredMessages
    assert(mirrored.map(m => (m.partition, new String(m.value, "UTF-8"))).sorted
      == Seq((0, "a0"), (0, "a1"), (1, "b0")))
    val p0 = mirrored.filter(_.partition == 0).map(m => (m.ledgerId, m.entryId))
    assert(p0 == Seq((1000L, 0L), (1000L, 1L)))
    // envelope copy rules survive the round trip (key/eventTime/props)
    val a1 = mirrored.find(m => new String(m.value, "UTF-8") == "a1").get
    assert(a1.key == "k1" && a1.eventTimeMillis == 1700000001000L
      && a1.properties == Map("h" -> "v"))

    // offset map recorded one mapping per message
    val rec = FileOffsetRecorder(s"$dstRoot/offsetmap")
    assert(rec.mappings.size == 3)

    // cursor plane: the observation at (5,1) translated through the
    // recorded map to the dst id of that exact message
    val expectedDst = rec.mappings
      .find(m => m.partition == 0 && m.srcLedger == 5 && m.srcEntry == 1).get
    assert(dst.dstCursors == Map(("tp", 0, "sub") ->
      ("create", expectedDst.dstLedger, expectedDst.dstEntry)))

    // SECOND run over the same roots: converges — no new messages, no
    // duplicate metadata, cursor state survives (no re-create)
    assert(SyncMain.run(spark, args) == 0)
    val dst2 = new FileCluster(spark, dstRoot, "dst-east")
    assert(dst2.mirroredMessages.size == 3)
    assert(dst2.tenants.count() == 1)
    assert(FileOffsetRecorder(s"$dstRoot/offsetmap").mappings.size == 3)
  }

  test("SyncMain catches up: new source data since the last run is mirrored from the checkpoint") {
    val srcRoot = tmpDir("sm2-src")
    val dstRoot = tmpDir("sm2-dst")
    val src = seedSource(srcRoot)
    val args = SyncMain.parse(Array("--src", srcRoot, "--dst", dstRoot, "--once"))
    assert(SyncMain.run(spark, args) == 0)

    // new messages + a new topic appear between runs
    src.addMessages(RawMessage("acme", "prod", "tp", 0, 6, 0,
      "a2".getBytes("UTF-8"), null, 0L, 1700000180000L, Map.empty))
    src.createTopics(Seq(TopicRow("acme", "prod", "tp2",
      partitioned = false, partitions = 0, Map.empty)))

    assert(SyncMain.run(spark, args) == 0)
    val dst = new FileCluster(spark, dstRoot)
    assert(dst.mirroredMessages.count(_.partition == 0) == 3)
    // the catch-up message continued the dense dst sequence
    assert(dst.mirroredMessages.filter(_.partition == 0)
      .map(m => (m.ledgerId, m.entryId)).max == ((1000L, 2L)))
    assert(dst.topics.count() == 2)
  }

  test("continuous mode over file roots: new entities and data picked up by the cadences") {
    val srcRoot = tmpDir("smc-src")
    val dstRoot = tmpDir("smc-dst")
    val src = seedSource(srcRoot)
    val dst = new FileCluster(spark, dstRoot, "dst-east")
    val conf = SyncConfig(subscriptionName = "cont",
      autoUpdateTenant = true, autoUpdateNamespace = true,
      autoUpdateTopic = true, autoUpdatePartition = true,
      autoUpdateSubscription = true)
    val pipe = new SyncPipeline(spark, src, dst, conf)
    val recorder = FileOffsetRecorder(s"$dstRoot/offsetmap")
    val sup = pipe.superviseMirror(s"$dstRoot/_ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L),
      offsets = Some(recorder))
    val ticker = pipe.runContinuous(
      metadataPeriodMillis = 200L, partitionPeriodMillis = 200L,
      cursorPeriodMillis = 200L,
      offsetMap = Some(() => recorder.toDF(spark)))
    try {
      def eventually[A](what: String, timeoutMs: Long = 120000L)(
          cond: => Boolean): Unit = {
        val t0 = System.nanoTime()
        while (!cond) {
          if ((System.nanoTime() - t0) / 1000000L > timeoutMs)
            fail(s"timed out waiting for $what")
          Thread.sleep(100L)
        }
      }
      eventually("initial topology")(dst.mirroredMessages.size == 3)
      // entities + data arriving AFTER start are picked up by the
      // periodic re-ticks (A21) — no restart, no manual tick
      src.createTenants(Seq(TenantRow("late-tenant", Seq("src-cluster"))))
      src.addMessages(RawMessage("acme", "prod", "tp", 1, 7, 1,
        "b1".getBytes("UTF-8"), null, 0L, 1700000240000L, Map.empty))
      src.observeCursor(CursorStat("tp", 1, "sub2", 7, 0,
        Timestamp.valueOf("2024-01-01 11:00:00")))
      eventually("late tenant")(
        dst.tenants.collect().map(_.getString(0)).toSet("late-tenant"))
      eventually("late message")(dst.mirroredMessages.size == 4)
      eventually("late cursor")(dst.dstCursors.contains(("tp", 1, "sub2")))
    } finally {
      ticker.close()
      sup.close()
    }
  }

  test("arg parsing: env fallback, required flags, unknown levels rejected") {
    intercept[IllegalArgumentException] { SyncMain.parse(Array("--dst", "/x")) }
    intercept[IllegalArgumentException] {
      SyncMain.parse(Array("--src", "/a", "--dst", "/b", "bogus"))
    }
    intercept[IllegalArgumentException] {
      SyncMain.parse(Array("--src", "/a", "--dst", "/b",
        "--auto-update", "tenant,frobnicate"))
    }
    val a = SyncMain.parse(Array("--src", "/a", "--dst", "/b",
      "--auto-update", "tenant,subscription", "--cursor-period-ms", "250"))
    assert(a.checkpoint == "/b/_checkpoints" && a.subscription == "graft-sync"
      && a.autoUpdate == Set("tenant", "subscription")
      && a.cursorPeriodMs == 250L && !a.once)
  }
}
