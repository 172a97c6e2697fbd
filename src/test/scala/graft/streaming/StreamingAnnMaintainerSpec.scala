package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.operators.{HardlinkProbe, SimilarityIndex}

/** The streaming ANN maintainer's claim mirrors the dedup
  * maintainer's: N micro-batched vector appends must leave the same
  * IVF index a single build over everything would, a replayed batch
  * must be a no-op tick, and the rotation must hardlink-carry the
  * untouched cell files rather than rewrite them.
  */
class StreamingAnnMaintainerSpec extends SparkSuiteBase {

  private val dims = 8
  private val cells = 4

  /** Deterministic unit-ish vectors: id i leans along axis i % dims,
    * so cell assignment is stable and every cell is populated.
    */
  private def vec(i: Long): Array[Float] = {
    val v = Array.fill(dims)(0.1f)
    v((i % dims).toInt) = 1.0f
    v
  }

  private def corpus(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, vec(i).toSeq)).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
  }

  /** The index's logical (id → cell) map: bulk `cells` plus any
    * append tail (the r17 layout — appends land as multi-cell tail
    * files, not per-cell part-files).
    */
  private def cellsAt(dir: String): Map[Long, Int] =
    SimilarityIndex.indexedIdCells(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("micro-batched vector appends equal a single full build") {
    import spark.implicits._
    val root = tmpDir("ann-root")
    val ckpt = tmpDir("ann-ckpt")
    val allIds = (0L until 40L)
    val ms = MemoryStream[(Long, Seq[Float])](spark, 1)
    val stream = ms.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val q = StreamingAnnMaintainer.start(stream, "vec_id", "embedding",
        root, ckpt, numCells = cells,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1 holds the smallest ids, so the bootstrap's smallest-id
      // centroids equal the full build's
      Seq(allIds.take(16), allIds.slice(16, 28), allIds.drop(28)).foreach { b =>
        ms.addData(b.map(i => (i, vec(i).toSeq)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val cur = StreamingAnnMaintainer.currentDir(spark, root)
    assert(cur.contains(s"$root/tick-2"), s"expected 3 committed ticks: $cur")

    val fullDir = tmpDir("ann-full")
    SimilarityIndex.buildIvf(corpus(allIds), "vec_id", "embedding",
      cells, fullDir)
    assert(cellsAt(cur.get) === cellsAt(fullDir),
      "streamed index diverges from the one-shot build")

    // probes through both indexes agree
    val probes = corpus(Seq(100L, 101L, 102L))
    def topk(dir: String) = SimilarityIndex.ivfProbe(probes, "vec_id",
        "embedding", dir, numCells = cells, nprobe = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(topk(cur.get) === topk(fullDir))
  }

  test("PQ ticks equal a single full IVF-PQ build; probes agree") {
    val root = tmpDir("annpq-root")
    val allIds = (0L until 40L)
    // batch 1 carries the 16 smallest ids = centroid AND codebook
    // seeds of the full build, so the frozen geometries coincide
    Seq(allIds.take(16), allIds.slice(16, 28), allIds.drop(28)).foreach { b =>
      StreamingAnnMaintainer.tickPq(corpus(b), "vec_id", "embedding",
        root, numCells = cells, numSub = 2, numCentroids = 16)
    }
    val maintained = StreamingAnnMaintainer.currentDir(spark, root).get
    val full = tmpDir("annpq-full")
    SimilarityIndex.buildIvfPq(corpus(allIds), "vec_id", "embedding",
      numCells = cells, numSub = 2, numCentroids = 16, dir = full)
    val probes = corpus(Seq(1L, 2L, 3L))
    def rows(dir: String) = SimilarityIndex.ivfPqProbe(probes,
        "vec_id", "embedding", dir,
        numCells = cells, nprobe = cells, numSub = 2, numCentroids = 16,
        k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(rows(maintained) == rows(full))
    // replay of an already-applied batch is a no-op tick
    val before = maintained
    val after = StreamingAnnMaintainer.tickPq(corpus(allIds.drop(28)),
      "vec_id", "embedding", root, numCells = cells, numSub = 2,
      numCentroids = 16)
    assert(after == before)
  }

  test("replayed batches are no-op ticks; fresh ids still append") {
    val root = tmpDir("ann-replay")
    val first = corpus(0L until 16L)
    val d0 = StreamingAnnMaintainer.tick(first, "vec_id", "embedding",
      root, numCells = cells)
    assert(d0 == s"$root/tick-0")

    // full replay (crash between tick commit and checkpoint commit)
    val replayed = StreamingAnnMaintainer.tick(first, "vec_id", "embedding",
      root, numCells = cells)
    assert(replayed == d0, "replayed batch must not advance the index")

    // crashed half-tick is cleaned and re-derived
    val half = new java.io.File(s"$root/tick-1")
    assert(half.mkdirs())
    assert(new java.io.File(half, "garbage").createNewFile())
    // mixed batch: 8 replayed ids + 8 fresh — only the fresh append,
    // and intra-batch duplicates collapse first
    val mixed = corpus((8L until 24L) ++ (16L until 24L))
    val d1 = StreamingAnnMaintainer.tick(mixed, "vec_id", "embedding",
      root, numCells = cells)
    assert(d1 == s"$root/tick-1")
    assert(!new java.io.File(half, "garbage").exists(),
      "half-tick garbage must be cleaned before the rebuild")
    assert(cellsAt(d1).keySet === (0L until 24L).toSet)
    // and no id holds duplicate rows (replays and intra-batch dupes
    // were really dropped, not just masked by the map)
    assert(SimilarityIndex.indexedIdCells(spark, d1).count() === 24L)
    // appended rows rank against the PERSISTED centroids: assignment
    // of old ids is untouched
    val before = cellsAt(d0)
    assert(cellsAt(d1).view.filterKeys(_ < 16L).toMap === before)
  }

  test("compaction restores one file per cell; appends keep working") {
    val root = tmpDir("ann-compact")
    StreamingAnnMaintainer.tick(corpus(0L until 16L),
      "vec_id", "embedding", root, numCells = cells)
    StreamingAnnMaintainer.tick(corpus(16L until 24L),
      "vec_id", "embedding", root, numCells = cells)
    val d2 = StreamingAnnMaintainer.tick(corpus(24L until 32L),
      "vec_id", "embedding", root, numCells = cells)
    def filesPerCell(dir: String): Map[String, Int] =
      HardlinkProbe.dataFiles(s"$dir/cells").keys
        .groupBy(_.split('/')(0)).view.mapValues(_.size).toMap
    // the multi-append index accumulates TAIL files (the r17 layout:
    // a tick writes O(1) multi-cell tail files, never per-cell ones)
    assert(HardlinkProbe.dataFiles(s"$d2/tail").nonEmpty,
      "fixture should accumulate tail files")
    val cdir = tmpDir("ann-compacted")
    SimilarityIndex.compactIvf(spark, d2, cdir)
    // same rows, one file per cell, tail folded away, probes unaffected
    assert(cellsAt(cdir) === cellsAt(d2))
    assert(filesPerCell(cdir).values.forall(_ == 1),
      s"compaction must leave one file per cell: ${filesPerCell(cdir)}")
    assert(HardlinkProbe.dataFiles(s"$cdir/tail").isEmpty,
      "compaction must fold the tail into the bulk cells frame")
    // and the compacted index accepts further appends
    val post = tmpDir("ann-post")
    SimilarityIndex.appendIvf(corpus(Seq(200L)), "vec_id", "embedding",
      cdir, post)
    assert(SimilarityIndex.indexedIdCells(spark, post).count() === 33L)
  }

  test("untouched cell files carry as hardlinks, not copies") {
    val root = tmpDir("ann-hardlink")
    val d0 = StreamingAnnMaintainer.tick(corpus(0L until 16L),
      "vec_id", "embedding", root, numCells = cells)
    // a delta landing in ONE cell: vectors all leaning along axis 0
    val d1 = StreamingAnnMaintainer.tick(corpus(Seq(64L, 72L)),
      "vec_id", "embedding", root, numCells = cells)
    // every pre-existing data file (bulk cells AND prior tail files)
    // is inode-identical in the new tick
    val before = HardlinkProbe.dataFiles(s"$d0/cells") ++
      HardlinkProbe.dataFiles(s"$d0/tail").map { case (k, v) =>
        s"tail/$k" -> v
      }
    val after = HardlinkProbe.dataFiles(s"$d1/cells") ++
      HardlinkProbe.dataFiles(s"$d1/tail").map { case (k, v) =>
        s"tail/$k" -> v
      }
    before.foreach { case (rel, ino) =>
      assert(after.get(rel).contains(ino), s"rewritten: $rel")
    }
    // and the delta added at least one genuinely new (tail) file
    assert(after.size > before.size)
  }
}
