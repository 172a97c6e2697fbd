package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN indexes: build the expensive part of a similarity
  * search (centroid training + corpus assignment / bucket hashing)
  * ONCE, write it as parquet with a config fingerprint, and let any
  * later job probe it — the universal real-world ANN deployment
  * shape (indexing and probing are separate jobs with separate
  * cadences; rebuilding cells per query run is what [[Similarity]]'s
  * in-memory path does and what this module kills at 100 TB).
  *
  * Index layouts (parquet under one directory):
  *
  * IVF ([[buildIvf]] / [[ivfProbe]]):
  *   - `centroids` (cell, centroid: array<float>) — numCells rows
  *   - `cells`     (neighbor_id, cv, cell) PARTITIONED BY cell — the
  *     inverted file. Partitioning is the on-disk probe win: a probe
  *     touching `nprobe` cells reads those directories and NOTHING
  *     else (static partition pruning, asserted in the spec), so
  *     probe IO is ~nprobe/numCells of the corpus.
  *   - `tail`      (neighbor_id, cv, cell) — cell as a DATA column:
  *     per-tick append files ([[appendIvf]]; r16 VERDICT #3). Probes
  *     read bulk + tail with the same cell filter (pushed to the
  *     tail's row groups); [[compactIvf]] folds the tail back into
  *     the bulk. Absent on a fresh build or fresh compaction, and
  *     bounded by the compaction cadence — the LSM delta shape.
  *   - `meta`      (version, kind, num_cells, dims)
  *
  * Sign-bucket LSH ([[buildSignBucket]] / [[signBucketProbe]]):
  *   - `buckets` (neighbor_id, cv, bucket) PARTITIONED BY bucket
  *     (2^bits directories at most — the `bits <= 12` require keeps
  *     the partition count filesystem-sane)
  *   - `meta`    (version, kind, bits, dims)
  *
  * STALE-CONFIG SAFETY: the probe functions take the caller's
  * expected configuration and refuse an index whose persisted meta
  * disagrees (wrong numCells/bits/dims/kind or an unknown schema
  * version fails loudly with the mismatch in the message). A silent
  * config drift would return plausible-but-wrong neighbors — the
  * worst failure mode an ANN store can have.
  */
object SimilarityIndex {

  private val SchemaVersion = 1

  /** Build and persist an IVF index. Centroids default to the
    * smallest-id stand-in (deterministic, oracle-reproducible — q46's
    * mode); pass `Some(Similarity.trainIvfCentroids(...))` for
    * trained cells. Probe-side ranking must use the same centroids —
    * they are persisted, so [[ivfProbe]] always does.
    */
  def buildIvf(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int,
      dir: String,
      centroids: Option[Seq[Array[Float]]] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents: Seq[(Int, Array[Float])] = centroids match {
      case Some(cs) =>
        require(cs.size == numCells,
          s"got ${cs.size} centroids for numCells=$numCells")
        cs.zipWithIndex.map { case (v, i) => (i, v) }
      case None =>
        Similarity.smallestIdCentroids(corpus, idCol, vecCol, numCells)
    }
    require(cents.nonEmpty, "cannot index an empty corpus")
    // fail at BUILD time, not at first probe: a corpus smaller than
    // numCells yields fewer centroids, and persisting the requested
    // numCells would create an index every ivfProbe rejects
    require(cents.size == numCells,
      s"corpus yields only ${cents.size} distinct centroid rows for " +
        s"numCells=$numCells — shrink numCells or grow the corpus")
    val dims = cents.head._2.length
    cents.map { case (i, v) => (i, v.toSeq) }.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    corpus.select(
        col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        Similarity.cellAssign(spark, cents, col(vecCol)).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
    writeMeta(spark, dir, "ivf", numCells, dims)
  }

  /** APPEND a delta of new vectors into a persisted IVF index:
    * `srcDir → dstDir` copy-free rotation — the bulk `cells`
    * partitions AND any existing tick tail carry as hardlinks, the
    * delta's rows land as per-tick MULTI-CELL tail files (`tail/`,
    * cell as a data column), and centroids/meta carry frozen
    * (assignment must keep using the PERSISTED centroids or old and
    * new vectors would live in different geometries).
    *
    * Why a tail instead of per-cell appends (r16 VERDICT #3): the
    * r16 tick wrote one part-file into EVERY delta cell per tick —
    * `autoCells` grows the cell count with the corpus, so the deck30
    * tick paid ~650 parquet footer/commit round-trips for a 1% delta
    * (~8–10 s of pure file metadata). The tail is the LSM shape: a
    * tick writes O(delta tasks) files regardless of cell count,
    * probes read the partition-pruned bulk plus the (delta-sized,
    * compaction-bounded) tail with the same cell filter — pushed to
    * the tail's parquet row groups — and [[compactIvf]] folds the
    * tail back into one file per cell between read barriers. Results
    * are layout-invariant (append==build stays spec-pinned).
    *
    * The per-tick cost is delta-sized: one codegen cellRank scan of
    * the delta plus O(1) tail file writes; the existing corpus is
    * never read or rewritten. Delta ids must be new to the index (the
    * streaming maintainer anti-joins replayed ids before calling).
    * Same stale-config discipline as the probes: meta version/kind
    * and vector dims are validated before any write.
    */
  def appendIvf(
      delta: DataFrame,
      idCol: String,
      vecCol: String,
      srcDir: String,
      dstDir: String): DataFrame = {
    require(srcDir != dstDir, "append rotates to a fresh directory")
    val spark = delta.sparkSession
    // ONE meta read: the append path's expected numCells IS the stored
    // value, so the earlier read-then-checkMeta spelling re-read the
    // same 1-row file twice (a fixed job per tick — the tick's cost is
    // supposed to be delta-sized, so fixed jobs are the residual term)
    val metaRows = spark.read.parquet(s"$srcDir/meta").collect()
    require(metaRows.length == 1, s"corrupt index meta at $srcDir/meta")
    val numCells = metaRows(0).getAs[Int]("param")
    checkMetaRow(metaRows(0), srcDir, "ivf", numCells,
      probeDims = firstDims(delta, vecCol))
    val cents = spark.read.parquet(s"$srcDir/centroids")
      .collect().map(r => (r.getAs[Int]("cell"),
        r.getSeq[Float](r.fieldIndex("centroid")).toArray))
      .sortBy(_._1).toSeq
    val assigned = delta.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      Similarity.cellAssign(spark, cents, col(vecCol)).as("cell"))
    appendTail(spark, assigned, srcDir, dstDir)
    IndexRotation.rotateFrozen(spark, s"$srcDir/centroids", s"$dstDir/centroids")
    IndexRotation.rotateFrozen(spark, s"$srcDir/meta", s"$dstDir/meta")
    indexedRows(spark, dstDir)
  }

  /** The tail-rotation shared by [[appendIvf]] and [[appendIvfPq]]:
    * hardlink-carry the bulk `cells` partitions untouched, then
    * hardlink-carry + append the per-tick tail. The delta lands
    * sorted by cell inside its files so the probe-side `cell` filter
    * prunes on parquet row-group min/max stats.
    */
  private def appendTail(spark: SparkSession, assigned: DataFrame,
      srcDir: String, dstDir: String): Unit = {
    IndexRotation.rotateFrozen(spark, s"$srcDir/cells", s"$dstDir/cells")
    IndexRotation.rotateAppendOnly(spark, s"$srcDir/tail", s"$dstDir/tail",
      assigned.sortWithinPartitions(col("cell")))
    ()
  }

  /** The index's LOGICAL row frame: the bulk partitioned `cells`
    * frame plus the append tail (absent on a freshly built or freshly
    * compacted index). Column order is normalized to the tail's
    * (data-column) order; the bulk side's `cell` partition column is
    * selected into the same position.
    */
  private[graft] def indexedRows(spark: SparkSession, dir: String): DataFrame = {
    val bulk = spark.read.parquet(s"$dir/cells")
    val cols = bulk.columns.filter(_ != "cell").map(col).toSeq :+ col("cell")
    val base = bulk.select(cols: _*)
    if (new java.io.File(s"$dir/tail").isDirectory) {
      // explicit schema: the tail dir exists but may hold zero files
      // (an empty-delta tick), and inference cannot read that
      base.unionByName(
        spark.read.schema(base.schema).parquet(s"$dir/tail"))
    } else base
  }

  /** Column-pruned id frame over bulk + tail — the streaming
    * maintainer's replay anti-join input.
    */
  def indexedIds(spark: SparkSession, dir: String, as: String): DataFrame =
    indexedRows(spark, dir).select(col("neighbor_id").as(as))

  /** (neighbor_id, cell) over bulk + tail — the layout-invariant
    * assignment view the maintainer specs assert against.
    */
  def indexedIdCells(spark: SparkSession, dir: String): DataFrame =
    indexedRows(spark, dir).select(col("neighbor_id"), col("cell"))

  /** [[indexedRows]] restricted to `cells` — the probe-side read. The
    * bulk side prunes STATICALLY on the `cell` partition directories;
    * the tail side (delta-sized, compaction-bounded) pushes the same
    * filter to its parquet row groups.
    */
  private def probeRows(spark: SparkSession, dir: String,
      cells: Seq[Int]): DataFrame =
    indexedRows(spark, dir)
      .filter(if (cells.isEmpty) lit(false) // empty probes → empty result
        else col("cell").isin(cells: _*))

  /** Compact a multi-append IVF index into `dstDir`: every tick
    * appends tail files, so a long-lived maintained index accumulates
    * a tail that taxes every probe's extra read. Folds the tail back
    * into the bulk `cells` frame at one file per cell partition (same
    * rows, same layout contract); the compacted index carries NO
    * tail. Centroids and meta carry frozen. Run between read
    * barriers, like the dedup index's compaction.
    */
  def compactIvf(spark: SparkSession, srcDir: String, dstDir: String): Unit = {
    indexedRows(spark, srcDir)
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dstDir/cells")
    IndexRotation.rotateFrozen(spark, s"$srcDir/centroids", s"$dstDir/centroids")
    IndexRotation.rotateFrozen(spark, s"$srcDir/meta", s"$dstDir/meta")
    ()
  }

  /** Probe a persisted IVF index: rank the persisted centroids per
    * probe (one codegen scan — centroids are numCells driver
    * literals), then join against ONLY the probed cell partitions.
    * `numCells` is the caller's expected config — checked against the
    * index meta.
    */
  def ivfProbe(
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      indexDir: String,
      numCells: Int,
      nprobe: Int,
      k: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= numCells, "need 1 <= nprobe <= numCells")
    val spark = probes.sparkSession
    checkMeta(spark, indexDir, "ivf", numCells,
      probeDims = firstDims(probes, vecCol))
    val cents = spark.read.parquet(s"$indexDir/centroids")
      .orderBy(col("cell")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).toSeq
    require(cents.size == numCells,
      s"index at $indexDir holds ${cents.size} centroids, expected $numCells")
    val probeCells = probes.select(
      col(idCol).as("probe_id"), col(vecCol).as("pv"),
      explode(transform(
        slice(Similarity.cellRank(spark, cents, col(vecCol)), 1, nprobe),
        s => s.getField("cell"))).as("cell"))
    // static partition prune: the distinct probed-cell set is bounded
    // by numCells (small by construction), so collecting it is
    // driver-safe and turns the cell join into a scan of exactly the
    // probed directories
    val probedCells = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val assigned = probeRows(spark, indexDir, probedCells)
    val pairs = assigned.join(broadcast(probeCells), "cell")
      .select(col("probe_id"), col("neighbor_id"),
        Similarity.cos6(spark, col("pv"), col("cv")).as("cos"))
    Similarity.ranked(pairs, k)
  }

  /** Build and persist an IVF-PQ index (Jégou 2011 §V — the
    * billion-scale layout): cells hold PQ CODES, not raw vectors, so
    * the persisted inverted file is numSub ints/vector instead of
    * dims floats — the representation that makes the on-disk index
    * (and every probe's IO) ~64× smaller at 100 TB. ONE codegen'd
    * corpus scan computes cell + codes.
    *
    * Layout: `centroids` (cell, centroid) and `codebooks`
    * (m, cid, centroid) — both driver-sized; `cells`
    * (neighbor_id, codes) PARTITIONED BY cell; `meta` kind='ivfpq'
    * (+ num_sub/num_centroids in `pqmeta`). Same stale-config
    * discipline as the other indexes: probes validate every
    * parameter and the vector dimensionality before reading a cell.
    *
    * Centroids default to the smallest-id stand-in; codebook seeds
    * are always the smallest-id corpus vectors (both deterministic,
    * q46/q98's mode); pass trained centroids for real distributions.
    */
  def buildIvfPq(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int,
      numSub: Int,
      numCentroids: Int,
      dir: String,
      centroids: Option[Seq[Array[Float]]] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val seeds = ProductQuant.seedVectors(corpus, idCol, vecCol,
      math.max(numCells, numCentroids))
    val cents: Seq[(Int, Array[Float])] = centroids match {
      case Some(cs) =>
        require(cs.size == numCells,
          s"got ${cs.size} centroids for numCells=$numCells")
        cs.zipWithIndex.map { case (v, i) => (i, v) }
      case None =>
        seeds.take(numCells).zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    }
    val books = ProductQuant.slicedBooks(seeds, numSub, numCentroids)
    val dims = seeds.head.length
    cents.map { case (i, v) => (i, v.toSeq) }.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    books.zipWithIndex.flatMap { case (sub, m) =>
      sub.zipWithIndex.map { case (cv, cid) => (m, cid, cv.toSeq) }
    }.toSeq.toDF("m", "cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    val booksLit = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)
    corpus.select(
        col(idCol).as("neighbor_id"),
        graft.plans.PqEncodeExpr.pqEncode(spark, col(vecCol), booksLit)
          .as("codes"),
        Similarity.cellAssign(spark, cents, col(vecCol)).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
    writeMeta(spark, dir, "ivfpq", numCells, dims)
    Seq((numSub, numCentroids)).toDF("num_sub", "num_centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/pqmeta")
  }

  /** Read an IVF-PQ index's driver-sized parts in ONE pass over each
    * 1-row/driver-sized file. `expected = Some((numCells, numSub,
    * numCentroids))` validates a probe's config against the meta;
    * `None` (the append path) trusts the stored config — the append's
    * expected values ARE the stored ones, and the earlier spelling
    * read meta and pqmeta twice each per tick for that tautology.
    * Returns (numCells, numSub, numCentroids, cents, books).
    */
  private def readPqIndex(spark: SparkSession, indexDir: String,
      expected: Option[(Int, Int, Int)],
      probeDims: Option[Int])
      : (Int, Int, Int, Seq[(Int, Array[Float])], Array[Array[Array[Float]]]) = {
    val metaRows = spark.read.parquet(s"$indexDir/meta").collect()
    require(metaRows.length == 1, s"corrupt index meta at $indexDir/meta")
    val numCells = expected.map(_._1)
      .getOrElse(metaRows(0).getAs[Int]("param"))
    checkMetaRow(metaRows(0), indexDir, "ivfpq", numCells,
      probeDims = probeDims)
    val pq = spark.read.parquet(s"$indexDir/pqmeta").collect()
    require(pq.length == 1, s"corrupt pq meta at $indexDir/pqmeta")
    val (s0, c0) = (pq(0).getAs[Int]("num_sub"),
      pq(0).getAs[Int]("num_centroids"))
    expected.foreach { case (_, numSub, numCentroids) =>
      require(s0 == numSub && c0 == numCentroids,
        s"index at $indexDir was built with numSub=$s0/numCentroids=$c0; " +
          s"probe expects $numSub/$numCentroids — stale config, rebuild " +
          "or fix the caller")
    }
    val cents = spark.read.parquet(s"$indexDir/centroids")
      .orderBy(col("cell")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).toSeq
    require(cents.size == numCells,
      s"index at $indexDir holds ${cents.size} centroids, expected $numCells")
    val bookRows = spark.read.parquet(s"$indexDir/codebooks")
      .orderBy(col("m"), col("cid")).collect()
    val books = bookRows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray)
      }.toArray
    require(books.length == s0 && books.forall(_.length == c0),
      s"corrupt codebooks at $indexDir/codebooks")
    (numCells, s0, c0, cents, books)
  }

  /** Probe a persisted IVF-PQ index: rank the persisted centroids per
    * probe, build the probe's ADC lookup table from the persisted
    * codebooks (both driver-sized), then ADC-scan ONLY the probed
    * cell partitions (static partition pruning, like [[ivfProbe]]).
    * Output: (probe_id, rnk, neighbor_id, adist).
    */
  def ivfPqProbe(
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      indexDir: String,
      numCells: Int,
      nprobe: Int,
      numSub: Int,
      numCentroids: Int,
      k: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= numCells, "need 1 <= nprobe <= numCells")
    val spark = probes.sparkSession
    val (_, _, _, cents, books) = readPqIndex(spark, indexDir,
      Some((numCells, numSub, numCentroids)),
      probeDims = firstDims(probes, vecCol))
    val probeCells = probes.select(
      col(idCol).as("probe_id"),
      ProductQuant.lutColumn(col(vecCol), books).as("lut"),
      explode(transform(
        slice(Similarity.cellRank(spark, cents, col(vecCol)), 1, nprobe),
        s => s.getField("cell"))).as("cell"))
    val probedCells = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val assigned = probeRows(spark, indexDir, probedCells)
    ProductQuant.rankAdc(assigned.join(broadcast(probeCells), "cell"), k)
  }

  /** APPEND a delta into a persisted IVF-PQ index — [[appendIvf]]'s
    * copy-free tail rotation with the delta encoded by the PERSISTED
    * codebooks and assigned by the PERSISTED centroids (both frozen:
    * re-deriving either would put old and new vectors in different
    * quantization geometries). Per-tick cost is one codegen scan of
    * the delta plus O(1) tail file writes (r16 VERDICT #3 — see
    * [[appendIvf]]).
    */
  def appendIvfPq(
      delta: DataFrame,
      idCol: String,
      vecCol: String,
      srcDir: String,
      dstDir: String): DataFrame = {
    require(srcDir != dstDir, "append rotates to a fresh directory")
    val spark = delta.sparkSession
    val (_, _, _, cents, books) = readPqIndex(spark, srcDir, None,
      probeDims = firstDims(delta, vecCol))
    val booksLit = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val assigned = delta.select(
      col(idCol).as("neighbor_id"),
      graft.plans.PqEncodeExpr.pqEncode(spark, col(vecCol), booksLit)
        .as("codes"),
      Similarity.cellAssign(spark, cents, col(vecCol)).as("cell"))
    appendTail(spark, assigned, srcDir, dstDir)
    Seq("centroids", "codebooks", "meta", "pqmeta").foreach { f =>
      IndexRotation.rotateFrozen(spark, s"$srcDir/$f", s"$dstDir/$f")
    }
    indexedRows(spark, dstDir)
  }

  /** [[compactIvf]] for the PQ layout: the tail folds into one file
    * per cell partition; centroids/codebooks/meta carry frozen.
    */
  def compactIvfPq(spark: SparkSession, srcDir: String, dstDir: String): Unit = {
    indexedRows(spark, srcDir)
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dstDir/cells")
    Seq("centroids", "codebooks", "meta", "pqmeta").foreach { f =>
      IndexRotation.rotateFrozen(spark, s"$srcDir/$f", s"$dstDir/$f")
    }
    ()
  }

  /** Build and persist a sign-bucket LSH index over the first `bits`
    * dimensions.
    */
  def buildSignBucket(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int,
      dir: String): Unit = {
    require(bits >= 1 && bits <= 12,
      "bits > 12 would create >4096 bucket partitions — use multi-table " +
        "slices or IVF for finer granularity")
    val spark = corpus.sparkSession
    val dims = corpus.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .head(1).headOption.map(_.getSeq[Float](0).size).getOrElse(0)
    corpus.select(
        col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        graft.functions.VectorFns.signBucket(col(vecCol), bits).as("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/buckets")
    writeMeta(spark, dir, "signbucket", bits, dims)
  }

  /** Probe a persisted sign-bucket index. `bits` is the caller's
    * expected config — checked against the index meta (a probe hashed
    * with different bits would land in systematically wrong buckets).
    */
  def signBucketProbe(
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      indexDir: String,
      bits: Int,
      k: Int): DataFrame = {
    val spark = probes.sparkSession
    checkMeta(spark, indexDir, "signbucket", bits,
      probeDims = firstDims(probes, vecCol))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"),
      graft.functions.VectorFns.signBucket(col(vecCol), bits).as("bucket"))
    // distinct probe buckets are bounded by min(|probes|, 2^bits) and
    // bits <= 12, so the static prune list stays small
    val probed = p.select(col("bucket")).distinct()
      .collect().map(_.getString(0)).toSeq
    val c = spark.read.parquet(s"$indexDir/buckets")
      .filter(if (probed.isEmpty) lit(false) // empty probes → empty result
        else col("bucket").isin(probed: _*))
    val pairs = c.join(broadcast(p), "bucket")
      .select(col("probe_id"), col("neighbor_id"),
        Similarity.cos6(spark, col("pv"), col("cv")).as("cos"))
    Similarity.ranked(pairs, k)
  }

  /** Build and persist a multi-table sign-bucket index: `tables`
    * independent hash tables over disjoint dimension slices (the
    * recall-amplified variant — a pair is a candidate when ANY table
    * buckets it together). Tables whose slice overruns the vector are
    * skipped, mirroring [[Similarity.multiTableSignBucketTopK]].
    */
  def buildMultiTable(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int,
      tables: Int,
      dir: String): Unit = {
    require(bits >= 1 && bits <= 12, "bits must be in [1, 12]")
    require(tables >= 1 && tables * (1 << bits) <= 8192,
      "tables * 2^bits partition directories must stay filesystem-sane")
    val spark = corpus.sparkSession
    val dims = corpus.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .head(1).headOption.map(_.getSeq[Float](0).size).getOrElse(0)
    multiTableKeyed(corpus, idCol, vecCol, bits, tables,
        "neighbor_id", "cv")
      .write.mode("overwrite").partitionBy("tbl", "bkt")
      .parquet(s"$dir/tables")
    writeMeta(spark, dir, "multitable", bits, dims, param2 = tables)
  }

  /** Probe a persisted multi-table index; `bits` and `tables` are the
    * caller's expected config, checked against the meta. Candidate
    * copies from multiple tables collapse through the deterministic
    * 6-decimal cosine + distinct, exactly like the in-memory operator.
    */
  def multiTableProbe(
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      indexDir: String,
      bits: Int,
      tables: Int,
      k: Int): DataFrame = {
    val spark = probes.sparkSession
    checkMeta(spark, indexDir, "multitable", bits, param2 = Some(tables),
      probeDims = firstDims(probes, vecCol))
    val p = multiTableKeyed(probes, idCol, vecCol, bits, tables,
      "probe_id", "pv")
    // static prune: distinct probed (table, bucket) pairs are bounded
    // by tables x 2^bits <= 8192 — collected and expressed as an
    // OR-of-ANDs over the two partition columns
    val probed = p.select(col("tbl"), col("bkt")).distinct().collect()
      .map(r => (r.getInt(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // empty probe set → empty result (the in-memory operator's
    // behavior), not a crash
    val prune =
      if (probed.isEmpty) lit(false)
      else probed.map { case (t, bs) =>
        col("tbl") === t && col("bkt").isin(bs: _*)
      }.reduce(_ || _)
    val c = spark.read.parquet(s"$indexDir/tables").filter(prune)
    val pairs = c.join(broadcast(p), Seq("tbl", "bkt"))
      .select(col("probe_id"), col("neighbor_id"),
        Similarity.cos6(spark, col("pv"), col("cv")).as("cos"))
      .distinct()
    Similarity.ranked(pairs, k)
  }

  /** The exploded (id, vec, tbl, bkt) frame both multi-table sides
    * use — one row per table whose `bits`-wide slice fits the vector.
    */
  private def multiTableKeyed(df: DataFrame, idCol: String, vecCol: String,
      bits: Int, tables: Int, idAs: String, vecAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
        explode(transform(sequence(lit(0), lit(tables - 1)),
          t => struct(t.as("tbl"),
            graft.functions.VectorFns
              .signBucketAt(col(vecCol), t * lit(bits), bits).as("bkt"))))
          .as("tb"))
      .select(col(idAs), col(vecAs),
        col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
      .where(size(col(vecAs)) >= (col("tbl") + lit(1)) * lit(bits))

  private def writeMeta(spark: SparkSession, dir: String, kind: String,
      param: Int, dims: Int, param2: Int = 0): Unit = {
    import spark.implicits._
    Seq((SchemaVersion, kind, param, dims, param2))
      .toDF("version", "kind", "param", "dims", "param2")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def checkMeta(spark: SparkSession, dir: String, kind: String,
      param: Int, param2: Option[Int] = None,
      probeDims: Option[Int] = None): Unit = {
    val rows = spark.read.parquet(s"$dir/meta").collect()
    require(rows.length == 1, s"corrupt index meta at $dir/meta")
    checkMetaRow(rows(0), dir, kind, param, param2, probeDims)
  }

  /** [[checkMeta]] on an already-read meta row — the append paths read
    * the meta anyway, and validating the row they hold saves a fixed
    * parquet-read job per tick.
    */
  private def checkMetaRow(r: org.apache.spark.sql.Row, dir: String,
      kind: String, param: Int, param2: Option[Int] = None,
      probeDims: Option[Int] = None): Unit = {
    val (ver, k0, p0) =
      (r.getAs[Int]("version"), r.getAs[String]("kind"), r.getAs[Int]("param"))
    require(ver == SchemaVersion,
      s"index at $dir has schema version $ver; this build understands " +
        s"$SchemaVersion — rebuild the index")
    require(k0 == kind,
      s"index at $dir is a '$k0' index; this probe expects '$kind'")
    require(p0 == param,
      s"index at $dir was built with $k0=$p0; probe expects $param — " +
        "stale config, rebuild or fix the caller")
    param2.foreach { p2 =>
      val stored = r.getAs[Int]("param2")
      require(stored == p2,
        s"index at $dir was built with $p2Name=$stored; probe expects " +
          s"$p2 — stale config, rebuild or fix the caller")
    }
    // the doc's STALE-CONFIG SAFETY claim includes dimensionality: a
    // probe whose vectors differ in length from the indexed corpus
    // would silently compute cosines over mismatched prefixes and
    // return plausible-but-wrong neighbors
    probeDims.foreach { d =>
      val stored = r.getAs[Int]("dims")
      // dims=0 marks an empty-corpus bucket index (nothing was
      // indexed, probes legitimately return empty) — skip
      require(stored == 0 || stored == d,
        s"index at $dir holds $stored-dim vectors; probe vectors have " +
          s"$d dims — wrong embedding space, rebuild or fix the caller")
    }
  }

  /** Dimensionality of the first non-null probe vector (None when the
    * probe set is empty — empty probes short-circuit to empty results
    * before any cosine, so there is nothing to validate).
    */
  private def firstDims(df: DataFrame, vecCol: String): Option[Int] =
    df.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .head(1).headOption.map(_.getSeq[Float](0).size)

  private val p2Name = "tables"
}
