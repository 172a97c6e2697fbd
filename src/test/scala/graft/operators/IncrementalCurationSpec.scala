package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuiteBase, Tables}

/** The incremental curation index must reproduce Curation.curate()
  * bit-for-bit across appends — including a CHAIN of appends with
  * rotated index directories (the real tick-after-tick deployment),
  * and without ever re-reading old corpus or eval text.
  */
class IncrementalCurationSpec extends SparkSuiteBase {

  private def decisionMap(df: org.apache.spark.sql.DataFrame,
      idName: String): Map[Long, (Long, Int, Boolean, Boolean, Boolean, Boolean)] =
    df.collect().map { r =>
      r.getAs[Long](idName) -> ((r.getAs[Long]("cluster"),
        r.getAs[Int]("passes"), r.getAs[Boolean]("ok_quality"),
        r.getAs[Boolean]("contaminated"), r.getAs[Boolean]("keep_dedup"),
        r.getAs[Boolean]("keep")))
    }.toMap

  test("a chain of two appends equals a from-scratch curate") {
    val docs = Tables.documents(spark, sfDir)
    val train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val eval = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    // three slices of the train split; build on slice 0, append 1, 2
    def slice(k: Int) = train.filter(pmod(col("doc_id"), lit(3)) === k)
    val dir = tmpDir("inccur-chain")

    IncrementalCuration.buildIndex(slice(0), eval, "doc_id", "text",
      "lang", Seq("the", "a"), dir = s"$dir/v0")
    IncrementalCuration.append(slice(1), "doc_id", "text", "lang",
      s"$dir/v0", s"$dir/v1")
    val after2 = IncrementalCuration.append(slice(2), "doc_id", "text",
      "lang", s"$dir/v1", s"$dir/v2")

    val full = Curation.curate(train, eval, "doc_id", "text", "lang",
      Seq("the", "a"))
    assert(decisionMap(after2, "doc") == decisionMap(full, "doc_id"),
      "chained appends diverge from the from-scratch decision frame")
  }

  test("compaction preserves content and appends keep working after it") {
    val docs = Tables.documents(spark, sfDir)
    val train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val eval = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    def slice(k: Int) = train.filter(pmod(col("doc_id"), lit(3)) === k)
    val dir = tmpDir("inccur-compact")
    IncrementalCuration.buildIndex(slice(0), eval, "doc_id", "text",
      "lang", Seq("the", "a"), dir = s"$dir/v0")
    IncrementalCuration.append(slice(1), "doc_id", "text",
      "lang", s"$dir/v0", s"$dir/v1")
    val after2 = IncrementalCuration.append(slice(2), "doc_id", "text",
      "lang", s"$dir/v1", s"$dir/v2")
    val before = decisionMap(after2, "doc")

    IncrementalCuration.compact(spark, s"$dir/v2", s"$dir/c2")
    // identical decision content through the compaction
    val compacted = spark.read.parquet(s"$dir/c2/decisions")
      .select("doc", "cluster", "passes", "ok_quality", "contaminated",
        "keep_dedup", "keep")
    assert(decisionMap(compacted, "doc") == before)
    // two ticks accumulated two delta file-sets in the append-only
    // frames; compaction collapses them back to one write's worth
    val v2Sh = HardlinkProbe.dataFiles(s"$dir/v2/dedup/shingles").size
    val c2Sh = HardlinkProbe.dataFiles(s"$dir/c2/dedup/shingles").size
    assert(c2Sh < v2Sh, s"compaction did not reduce files ($v2Sh -> $c2Sh)")
    // the compacted index accepts the next tick (empty delta = no-op)
    // and still matches the from-scratch frame
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    val afterNoop = IncrementalCuration.append(empty, "doc_id", "text",
      "lang", s"$dir/c2", s"$dir/v3")
    val full = Curation.curate(train, eval, "doc_id", "text", "lang",
      Seq("the", "a"))
    assert(decisionMap(afterNoop, "doc") == decisionMap(full, "doc_id"),
      "append after compaction diverges from the from-scratch frame")
  }

  test("curation rotation carries untouched frames by hardlink") {
    val docs = Tables.documents(spark, sfDir)
    val train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val eval = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    def slice(k: Int) = train.filter(pmod(col("doc_id"), lit(3)) === k)
    val dir = tmpDir("inccur-link")
    IncrementalCuration.buildIndex(
      train.filter(pmod(col("doc_id"), lit(3)) =!= 2), eval,
      "doc_id", "text", "lang", Seq("the", "a"), dir = s"$dir/base")
    IncrementalCuration.append(slice(2), "doc_id", "text", "lang",
      s"$dir/base", s"$dir/out")

    // frozen + append-only frames: every old file carried as the same
    // inode (eval-shingles gains nothing; signals gains delta files)
    for (frame <- Seq("eval-shingles", "signals")) {
      val base = HardlinkProbe.dataFiles(s"$dir/base/$frame")
      val out = HardlinkProbe.dataFiles(s"$dir/out/$frame")
      assert(base.nonEmpty)
      base.foreach { case (rel, ino) =>
        assert(out.get(rel).contains(ino),
          s"$frame/$rel was rewritten instead of hardlinked")
      }
    }
    assert(HardlinkProbe.dataFiles(s"$dir/out/signals").size >
      HardlinkProbe.dataFiles(s"$dir/base/signals").size,
      "signals gained no delta files")
    // decisions: untouched cluster buckets carry over as hardlinks
    val baseDec = HardlinkProbe.dataFiles(s"$dir/base/decisions")
    val outDec = HardlinkProbe.dataFiles(s"$dir/out/decisions")
    baseDec.foreach { case (rel, ino) =>
      outDec.get(rel).foreach(o =>
        assert(o == ino, s"decisions/$rel was copied, not hardlinked"))
    }
    assert(baseDec.exists { case (rel, ino) =>
      outDec.get(rel).contains(ino)
    }, "every decisions bucket was rewritten — no pruning")
  }

  test("append never needs old corpus or eval text (sources deleted)") {
    import spark.implicits._
    val olds = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota", "en"),
      (3L, "one two three four five six seven eight", "en"))
      .toDF("doc_id", "text", "lang")
    val eval = Seq((100L, "nine ten eleven twelve thirteen", "en"))
      .toDF("doc_id", "text", "lang")
    val dir = tmpDir("inccur-del")
    val oldPath = s"$dir/old"; val evalPath = s"$dir/eval"
    olds.write.parquet(oldPath); eval.write.parquet(evalPath)
    IncrementalCuration.buildIndex(
      spark.read.parquet(oldPath), spark.read.parquet(evalPath),
      "doc_id", "text", "lang", Seq("the", "a"),
      jaccardThreshold = 0.5, dir = s"$dir/base")
    // destroy both corpora: an append that rescans either cannot work
    Seq(oldPath, evalPath).foreach { p0 =>
      val p = new org.apache.hadoop.fs.Path(p0)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    val delta = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta kappa", "en"),
      (11L, "nine ten eleven twelve thirteen fourteen fifteen sixteen", "en"))
      .toDF("doc_id", "text", "lang")
    val out = IncrementalCuration.append(delta, "doc_id", "text", "lang",
      s"$dir/base", s"$dir/out")
    val m = decisionMap(out, "doc")
    // 1, 2, 10 near-dup cluster labeled 1; 3 and 11 singletons
    assert(m(1L)._1 == 1L && m(2L)._1 == 1L && m(10L)._1 == 1L)
    assert(m(3L)._1 == 3L && m(11L)._1 == 11L)
    // doc 11 shares 5-gram 'nine ten eleven twelve thirteen' with the
    // (deleted) eval corpus — the frozen shingle index must flag it
    assert(m(11L)._4, "doc 11 must be contaminated via the frozen eval set")
    assert(!m(3L)._4)
    // exactly one survivor in the near-dup cluster
    assert(Seq(1L, 2L, 10L).count(id => m(id)._5) == 1)
  }
}
