package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path utilities (SURVEY "optimize for scale" / BASELINE north
  * star): bucketed co-located joins and skew salting. Test-scale data
  * never *needs* these — they exist so the 100 TB deployment shape is
  * code, not a comment, and their plan effects are asserted in
  * ScaleOpsSpec.
  */
object ScaleOps {

  /** Distributed strictly-before prefix sum over a global total order
    * — appends `prefixName` = Σ `value` over every row strictly
    * before the current one in `orderCols` order, WITHOUT a global
    * single-task window: range-partition on the order columns, one
    * per-partition aggregate collected to the driver (numParts longs
    * — bounded by the partition count, not the data), then a
    * partition-local window plus the partition's offset. With
    * `value = lit(1L)` this is the 0-based global rank
    * (`arrivalBatchesScalable`); with a token count it is the
    * sequence-packing prefix (`TextAnalysis.packScan`) — ONE copy of
    * the subtle machinery both lean on.
    *
    * Lifecycle: the range-partitioned frame is persisted because
    * `spark_partition_id()` is NONDETERMINISTIC across executions —
    * the offsets job and the final job must observe one pid layout or
    * a task retry silently corrupts every prefix. The result is
    * materialized (eager localCheckpoint) and the intermediate cache
    * is released before returning, so repeated calls never stack
    * pinned frames; the returned frame is self-contained and
    * lineage-truncated.
    *
    * `orderCols` must be a total order (no ties) — with ties the
    * strictly-before frame is tie-order-dependent.
    *
    * Partition sizing: each range partition is sorted and
    * cumulative-summed by a SINGLE task, so the partition count — not
    * the data — bounds the per-task work. Auto-sized inputs whose
    * exact byte estimate fits `maxSingleTaskBytes` (32 MiB default)
    * skip the range machinery entirely and stream the prefix in one
    * coalesced task — vocabulary/catalog-sized frames pay one job
    * instead of the ~4 fixed jobs (cache count, range sampling,
    * offset collect, checkpoint scan) that dominate them; corpus-
    * sized frames take the distributed path unchanged. Above the
    * gate, `numParts <= 0` (the
    * default) derives the count from an EXACT row count times the
    * schema width ([[autoRangeParts]]), clamped to
    * [shuffle.partitions, maxAutoParts]: a growing input picks more
    * partitions by itself instead of sharding a 100 TB corpus into
    * ~3 TB single-task sorts (the round-5 fixed-32 defect). The 1 MiB
    * default target is in schema-width bytes (8 B per long), which
    * undercount the real in-task footprint (UnsafeRow + sort array +
    * the pid-stability persist) by roughly an order of magnitude —
    * 1 MiB of estimate is ~10 MiB of real partition, comfortably one
    * task's sort and far fewer task waves than the earlier 64 KiB
    * target (which cost 10 waves of sub-second tasks on a 600k-row
    * rank frame). The `maxAutoParts` cap bounds the driver's offset
    * map and the task count at extreme scale; at the cap, partitions
    * grow linearly but stay far under the single-task sort bound for
    * any plausible narrow-projection input (callers pass (key, value)
    * projections, never corpus text).
    */
  /** Rendezvous (highest-random-weight) assignment: every item picks
    * the worker maximizing md5(worker ‖ item-key) (Thaler & Ravishankar
    * 1996) — the consistent work-assignment rule behind partition →
    * sync-worker fan-out: adding/removing ONE worker moves only the
    * items that hashed to it (~1/W of the load), where a modulo
    * assignment reshuffles nearly everything. The [[SURVEY]] §2A
    * partition-fan-out story as a first-class relational operator.
    *
    * Pure integer comparisons over the portable md5 family — no
    * shuffle, no join, no explode: the argmax is ONE row-local
    * greatest() fold over worker-literal structs (codegen'd), so the
    * operator costs exactly one scan at any scale. Ties (md5
    * collisions) break to the LARGER worker name via the struct's
    * second field — deterministic in any engine.
    *
    * Output: the input plus a `worker` column.
    */
  def rendezvousAssign(
      items: DataFrame,
      keyCols: Seq[String],
      workers: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "rendezvousAssign needs key columns")
    require(workers.nonEmpty && workers.distinct.size == workers.size,
      "workers must be non-empty and distinct")
    val key = concat_ws("#", keyCols.map(c => col(c).cast("string")): _*)
    val cands = workers.map { w =>
      struct(
        graft.functions.PortableHash.md5Long60(
          concat(lit(w), lit("|"), key)).as("h"),
        lit(w).as("w"))
    }
    val pick =
      if (cands.size == 1) lit(workers.head)
      else greatest(cands: _*).getField("w")
    items.withColumn("worker", pick)
  }

  def prefixSumByRange(
      df: DataFrame,
      orderCols: Seq[String],
      value: org.apache.spark.sql.Column,
      prefixName: String,
      numParts: Int = 0,
      targetPartBytes: Long = 1L << 20,
      maxAutoParts: Int = 131072,
      maxSingleTaskBytes: Long = 1L << 25): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val storage = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // evaluate `value` once up front so the per-partition sums, the
    // streaming scan, and the auto-sizing all read one column; cache
    // the input when auto-sizing so the exact count does not recompute
    // the caller's upstream a second time (the count job materializes
    // the cache, every later pass reads it)
    val withV = df.withColumn("__pfx_v", value.cast("long"))
    val cached = if (numParts > 0) withV else withV.persist(storage)
    try {
      val baseLen0 = df.schema.fields.length
      // size-routed fast path (the foldLabels/broadcast-gate
      // discipline): an auto-sized input whose exact byte estimate
      // fits one task's sort skips the WHOLE range machinery — no
      // range-sampling job, no exchange, no per-partition offset
      // collect — and streams the prefix in one coalesced task over
      // the already-parallel upstream (partial aggregation upstream
      // of the coalesce still runs wide). Above the gate — any
      // corpus-sized frame at cluster scale — the range-partitioned
      // path below is taken unchanged; the gate only trims the fixed
      // ~4-job scheduler cost that dominates catalog/vocabulary-sized
      // frames. maxSingleTaskBytes <= 0 disables the fast path (the
      // sizing spec pins the distributed path's behavior that way).
      val rowWidth = 8L +
        df.schema.fields.map(_.dataType.defaultSize.toLong).sum
      if (numParts <= 0 && maxSingleTaskBytes > 0 &&
          BigInt(cached.count()) * rowWidth <= maxSingleTaskBytes) {
        val enc0 = Encoders.row(StructType(df.schema.fields :+
          StructField(prefixName, LongType, nullable = false)))
        return cached
          .coalesce(1)
          .sortWithinPartitions(orderCols.map(col): _*)
          .mapPartitions { it =>
            var running = 0L
            it.map { r =>
              val out = new Array[Any](baseLen0 + 1)
              var i = 0
              while (i < baseLen0) { out(i) = r.get(i); i += 1 }
              out(baseLen0) = running
              if (!r.isNullAt(baseLen0)) running += r.getLong(baseLen0)
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(out))
            }
          }(enc0).localCheckpoint(true)
      }
      val parts = if (numParts > 0) numParts
                  else autoRangeParts(cached, targetPartBytes, maxAutoParts)
      val parted = cached
        .repartitionByRange(parts, orderCols.map(col): _*)
        .sortWithinPartitions(orderCols.map(col): _*)
        .withColumn("__pfx_pid", spark_partition_id())
        .persist(storage)
      try {
        val sums = parted.groupBy(col("__pfx_pid"))
          .agg(coalesce(sum(col("__pfx_v")), lit(0L)).as("__s"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val offsets = (0 until parts).map { p =>
          p -> (0 until p).map(q => sums.getOrElse(q, 0L)).sum
        }.toMap
        // cumulative sum = one STREAMING scan of the already-sorted
        // cached partitions (the row's own stored pid keys the offset,
        // so a task retry observing a different task id cannot corrupt
        // the prefix) — no second exchange, no window re-sort; each
        // range partition is one O(rows) task
        val baseLen = df.schema.fields.length
        val enc = Encoders.row(StructType(df.schema.fields :+
          StructField(prefixName, LongType, nullable = false)))
        parted.mapPartitions { it =>
          var curPid = -1
          var running = 0L
          it.map { r =>
            val pid = r.getInt(baseLen + 1)
            if (pid != curPid) { curPid = pid; running = offsets(pid) }
            val out = new Array[Any](baseLen + 1)
            var i = 0
            while (i < baseLen) { out(i) = r.get(i); i += 1 }
            out(baseLen) = running
            if (!r.isNullAt(baseLen)) running += r.getLong(baseLen)
            Row.fromSeq(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(out))
          }
        }(enc).localCheckpoint(true)
      } finally {
        parted.unpersist()
        ()
      }
    } finally {
      if (!(numParts > 0)) cached.unpersist()
      ()
    }
  }

  /** The partition count [[prefixSumByRange]] derives when `numParts`
    * is not given: `ceil(exact row count x schema width /
    * targetPartBytes)`, clamped to [session shuffle partitions,
    * maxAutoParts]. Exposed so callers (and the sizing spec) can
    * observe the choice.
    *
    * Why a COUNT and not Catalyst's size estimate: the estimate is
    * unusable on exactly the inputs this helper sees in practice —
    * a stat-less LogicalRDD (localCheckpoint) reports the
    * `spark.sql.defaultSizeInBytes` sentinel scaled by projection
    * width ratios, and non-CBO join estimation MULTIPLIES child
    * sizes, so a 5000-row checkpointed join output "estimated" tens
    * of TB and scheduled 131k range-sort tasks in the round-6 bench.
    * The count is one extra job over the caller's narrow (key, value)
    * projection — metadata-cheap on parquet, partition-count-cheap on
    * a checkpoint — and it cannot be poisoned.
    */
  def autoRangeParts(
      df: DataFrame,
      targetPartBytes: Long = 1L << 20,
      maxAutoParts: Int = 131072): Int = {
    val floor = df.sparkSession.sessionState.conf.numShufflePartitions
    val rowWidth = 8L + df.schema.fields.map(_.dataType.defaultSize.toLong).sum
    val bySize =
      (BigInt(df.count()) * rowWidth + targetPartBytes - 1) / targetPartBytes
    bySize.min(maxAutoParts).max(floor).toInt
  }

  /** Persist a table bucketed+sorted on its join key. Two tables
    * bucketed the same way join with ZERO shuffle (the scan satisfies
    * the hash-partitioning requirement) — at 100 TB this is the
    * difference between an exchange of the full fact table per join
    * and none. Requires a catalog table (saveAsTable), not a bare
    * parquet path: bucketing metadata lives in the catalog.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Equi-join two same-bucketed catalog tables (helper so callers
    * keep the co-location contract in one place).
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Skew-salted inner equi-join: the big (skewed) side gets a random
    * salt in [0, salts); the small side is replicated `salts` times;
    * the join key becomes (key, salt), spreading a hot key over
    * `salts` reducers. Correctness: every big-side row matches exactly
    * the one replica with its salt, so the result multiset equals the
    * unsalted join (asserted in ScaleOpsSpec). AQE's skew-join
    * handling covers sort-merge cases adaptively; explicit salting is
    * for aggregations-after-join and deterministic plans.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Z-order (Morton) layout assignment (q109): quantize two integral
    * dimensions into `bins` equal-width bins, interleave the bin bits
    * ([[graft.plans.ZOrderExpr]], codegen), and map the z-value to one
    * of `numFiles` equal-width z-ranges. Range-partitioning/writing by
    * `file` then gives every file a near-rectangular (dimA, dimB)
    * bounding box, so a 2-D selection prunes to the files whose box
    * intersects — the layout trick behind `OPTIMIZE ZORDER BY`
    * (Delta/Iceberg), as a plain deterministic column. Appends
    * `bin_a`, `bin_b`, `zval`, `file`; row-preserving.
    *
    * The min/max quantization anchors are ONE exact aggregate (4 longs
    * to the driver). All arithmetic is fixed-order IEEE double
    * (`floor((x - min) * bins / range)`) — exact while
    * `(x - min) * bins < 2^53`, i.e. any dimension span below ~2^42
    * at 1024 bins — so the DuckDB oracle replays it bit-identically.
    * Balance caveat (documented contract): equal-width z-ranges give
    * equal-size files for roughly uniform dims; heavily skewed dims
    * want rank-based binning in place of min/max scaling (the
    * prefix-sum rank machinery above drops in), which changes only
    * the `bin` definition, not the interleave or the file math.
    */
  def zorderLayout(
      df: DataFrame,
      dimA: String,
      dimB: String,
      bins: Int,
      numFiles: Int): DataFrame = {
    require(bins > 1 && bins <= (1 << graft.plans.ZOrderExpr.Bits),
      s"bins must be in (1, 65536], got $bins")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val spark = df.sparkSession
    val mm = df.agg(
      min(col(dimA).cast("long")), max(col(dimA).cast("long")),
      min(col(dimB).cast("long")), max(col(dimB).cast("long")),
      sum(when(col(dimA).isNull || col(dimB).isNull, 1L).otherwise(0L)))
      .collect()(0)
    require(!mm.isNullAt(0) && !mm.isNullAt(2),
      "zorderLayout needs at least one row with non-null dimensions")
    // a null dimension would silently assign file = null and shunt the
    // row outside every bounding box a pruning reader consults — fail
    // loudly instead (callers route or filter nulls first)
    require(mm.getLong(4) == 0L,
      s"zorderLayout found ${mm.getLong(4)} rows with null dimension " +
        "values — a null file assignment silently escapes 2-D pruning; " +
        "filter or route them first")
    val (minA, maxA) = (mm.getLong(0), mm.getLong(1))
    val (minB, maxB) = (mm.getLong(2), mm.getLong(3))
    val bitsUsed = 64 - java.lang.Long.numberOfLeadingZeros((bins - 1).toLong)
    val zSpace = math.pow(4.0, bitsUsed.toDouble)
    def bin(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      floor((c.cast("long") - lit(lo)).cast("double") * lit(bins.toDouble) /
        lit((hi - lo + 1).toDouble)).cast("long")
    df.withColumn("bin_a", bin(col(dimA), minA, maxA))
      .withColumn("bin_b", bin(col(dimB), minB, maxB))
      .withColumn("zval",
        graft.plans.ZOrderExpr.zorder(spark, col("bin_a"), col("bin_b")))
      .withColumn("file",
        floor(col("zval").cast("double") * lit(numFiles.toDouble) /
          lit(zSpace)).cast("long"))
  }

  /** Production-shape skew join (q105): salt ONLY the keys whose
    * big-side frequency crosses `hotThreshold`, and replicate the
    * small side ONLY for those keys. [[saltedJoin]] multiplies the
    * entire small side by `salts`; at 100 TB with a 10 GB dim table
    * that is `salts` x 10 GB of shuffle for keys that were never hot.
    * Here the replication cost is `|hot| x (salts - 1)` rows — the
    * skew fix is paid exactly where the skew is.
    *
    * Hot-key detection is an EXACT count over the big side's key
    * column (column-pruned scan, partial-agg shuffle of distinct keys
    * — not rows); a sampled estimate drops in unchanged when even one
    * pruned scan is too much, and the result is identical either way
    * (salting never changes the join multiset, only its layout).
    * The hot set rides a broadcast into both sides, so no extra
    * shuffle is added to either input.
    *
    * Big-side salt is `monotonically_increasing_id mod salts` —
    * deterministic for a fixed partition layout, and any assignment is
    * correct: each big row meets exactly the one replica carrying its
    * salt. Cold keys keep salt 0 and meet the single un-replicated
    * row, so the plan degenerates to the plain join when nothing is
    * hot. Result multiset == plain inner join (oracle-gated by q105;
    * spread/replication asserted in ScaleOpsSpec).
    */
  def hotKeySaltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      hotThreshold: Long): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val hot = broadcast(
      big.groupBy(col(key)).agg(count(lit(1)).as("__c"))
        .where(col("__c") >= hotThreshold)
        .select(col(key), lit(true).as("__hot")))
    val bigSalted = big.join(hot, Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"),
          pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
          .otherwise(lit(0)))
      .drop("__hot")
    val smallSalted = small.join(hot, Seq(key), "left")
      .withColumn("__salt",
        explode(when(col("__hot"), sequence(lit(0), lit(salts - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    bigSalted.join(smallSalted, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted two-phase aggregation for skewed group keys: pre-aggregate
    * on (key, salt), then final-aggregate on key. For algebraic
    * aggregates (sum/count/min/max) the result is identical to a
    * direct groupBy; the hot key's partial work spreads over `salts`
    * tasks. (Catalyst's partial aggregation already does this for the
    * map side; explicit salting helps when the *reduce* side is the
    * hot spot, e.g. high-cardinality payloads per group.)
    */
  def saltedSumAgg(
      df: DataFrame,
      key: String,
      valueCol: String,
      salts: Int): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Bloom-pruned inner equi-join — the explicit RUNTIME-FILTER shape
    * (what `spark.sql.optimizer.runtime.bloomFilter` injects when its
    * heuristics fire, here as a deterministic operator): the dim
    * side's DISTINCT join keys are folded into an `m`-bit Bloom
    * filter, and the fact side is pruned BEFORE the join by `k`
    * broadcast semi-joins on its computed bit positions — a fact row
    * survives only if ALL `k` of its key's bits are set. The exact
    * join then removes the Bloom's false positives, so the result
    * multiset is EXACTLY the plain join's (oracle-gated by q119: the
    * oracle IS the plain join).
    *
    * Hash family: `xxhash64(i, key)` per lane — the filter is
    * RESULT-INVISIBLE (any FP set yields the same join output), so
    * unlike q97's Bloom — whose bit set IS the oracle surface and
    * pays the portable md5 — the prune takes the one-instruction
    * hash. The first cut of this operator used the md5 family and
    * spent 2.8 s at sf0.1 hashing 6M fact keys; xxhash64 removes
    * ~2 s of pure digest cost from the hot path.
    *
    * Why this matters at 100 TB: a selective dim predicate ("this
    * brand", "this day") leaves a dim subset whose raw keys may still
    * be tens of GB — too big to broadcast into the fact scan — while
    * its Bloom bit frame is ≤ min(m, |dim|·k) longs by construction
    * (~1 MB at m = 2²⁰), so the fact table's non-matching rows (often
    * >99%) die before the join exchange instead of shuffling. The
    * prune is k BroadcastHashJoin semis on codegen'd integer columns —
    * no explode, no extra shuffle, no row-id aggregate on the fact
    * path; the bit frame is materialized ONCE (localCheckpoint, tiny)
    * and reused by all k semis. False-positive rate follows the
    * standard (1−e^{−kn/m})^k; correctness never depends on it.
    */
  def bloomPrunedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      m: Int = 1 << 20,
      k: Int = 4): DataFrame = {
    require(m > 0 && k > 0, "bloom needs positive m and k")
    def laneBit(i: Int): org.apache.spark.sql.Column =
      pmod(xxhash64(lit(i), col(key)), lit(m.toLong))
    val bits = dim.select(col(key)).distinct()
      .select(explode(array((0 until k).map(laneBit): _*)).as("bit"))
      .distinct()
      .localCheckpoint(true)
    val pruned = (0 until k).foldLeft(fact) { case (df, i) =>
      df.withColumn(s"__bit$i", laneBit(i))
        .join(broadcast(bits.withColumnRenamed("bit", s"__bit$i")),
          Seq(s"__bit$i"), "left_semi")
        .drop(s"__bit$i")
    }
    pruned.join(dim, Seq(key))
  }

  /** Key-distribution profile — the diagnostic that DECIDES the scale
    * levers above (salting factor for [[hotKeySaltedJoin]]/
    * [[saltedSumAgg]], bucket counts, AQE skew thresholds): one row
    * of per-key-count statistics.
    *
    *   n_rows, n_keys, max_cnt       — the raw shape
    *   skew6 = max_cnt / (n_rows/n_keys)   — >> 1 means salt
    *   hot_keys / hot_rows           — keys (and their row mass)
    *                                   above hotFactor × the mean
    *   entropy6 = ln N − (Σ c·ln c)/N — key-distribution entropy in
    *                                   nats (ln n_keys if uniform)
    *
    * Scale shape: ONE combinable count aggregate over the corpus
    * (shuffles the key space), then two aggregates over the
    * key-space-sized count frame with the 1-row stats frame
    * broadcast into the hot filter. Nothing is collected beyond the
    * single output row; the count frame is computed once
    * (localCheckpoint) and shared by both passes.
    */
  def keyProfile(
      df: DataFrame,
      keyCol: String,
      hotFactor: Double = 1.5): DataFrame = {
    require(hotFactor > 0, "hotFactor must be positive")
    def pr6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val stats = counts.agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("max_cnt"),
      pr6(sum(col("c").cast("double") * log(col("c").cast("double"))))
        .as("__sclnc"))
    val hot = counts.crossJoin(broadcast(stats.select(
        (col("n_rows").cast("double") / col("n_keys")).as("__mean"))))
      .where(col("c") > lit(hotFactor) * col("__mean"))
      .agg(coalesce(count(lit(1)), lit(0L)).as("hot_keys"),
        coalesce(sum(col("c")), lit(0L)).as("hot_rows"))
    stats.crossJoin(hot)
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        col("hot_keys"), col("hot_rows"),
        pr6(col("max_cnt") /
          (col("n_rows").cast("double") / col("n_keys"))).as("skew6"),
        pr6(log(col("n_rows").cast("double")) -
          col("__sclnc") / col("n_rows")).as("entropy6"))
  }

  /** Quantile normalization of a target column against a REFERENCE
    * snapshot's distribution (the rank-map trick genomics normalizes
    * arrays with and feature pipelines use for drift correction): the
    * value at rank r_B of n_B target rows maps to the reference value
    * at rank `ceil(r_B · n_A / n_B)` — ALL-INTEGER rank arithmetic
    * (no quantile-fraction floats to disagree on), ties totally
    * ordered by (value, id) on both sides.
    *
    * Scale shape: both ranks come from [[prefixSumByRange]] (the q89
    * discipline — never a single-task global window), the map is one
    * integer expression, and the lookup is an equi-join on the
    * computed reference rank. Only the two scalar counts touch the
    * driver.
    *
    * Output: (idCol, value, norm_value) for every target row.
    */
  def quantileNormalize(
      ref: DataFrame,
      target: DataFrame,
      idCol: String,
      valueCol: String): DataFrame = {
    val ra = prefixSumByRange(
        ref.select(col(idCol).as("__rid"),
          col(valueCol).cast("double").as("__rv")),
        Seq("__rv", "__rid"), lit(1L), "__r0")
      .select((col("__r0") + lit(1L)).as("__ra"), col("__rv"))
    val rb = prefixSumByRange(
        target.select(col(idCol), col(valueCol).cast("double").as("value")),
        Seq("value", idCol), lit(1L), "__r0")
      .select(col(idCol), col("value"), (col("__r0") + lit(1L)).as("__rb"))
    // counts read off the checkpointed ranked frames (max rank == n) —
    // counting the RAW inputs would cost an extra full pass per side
    def countOf(df: DataFrame, rankCol: String): Long = {
      val r = df.agg(max(col(rankCol))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val nA = countOf(ra, "__ra")
    val nB = countOf(rb, "__rb")
    require(nA > 0 && nB > 0, "quantileNormalize needs non-empty frames")
    rb.withColumn("__ra", expr(s"((__rb * ${nA}L) + ${nB}L - 1L) div ${nB}L"))
      .join(ra, Seq("__ra"))
      .select(col(idCol), col("value"), col("__rv").as("norm_value"))
  }

  /** Zone-map layout writer: sort-cluster `df` by `orderCols` into
    * `numFiles` deterministic files (file = exclusive-prefix-rank ÷
    * rows-per-file over ONE range-partitioned prefix sum — no
    * sampling-based range partitioner, so the layout is bit-stable
    * across runs), write the data partitioned by `__zfile`, and
    * persist a ZONE MAP beside it: per-file (min, max, count) of
    * `statCol` — the file-skipping index an unpartitioned lakehouse
    * table keeps where directory partitioning is too coarse.
    *
    * Layout lands at `dir/data/__zfile=k/...`; the zone map (one
    * ~numFiles-row parquet) at `dir/zonemap`. Build cost is one data
    * pass + one stats pass; every subsequent range query pays only
    * the zone-map read (metadata-sized) plus the files that actually
    * overlap — see [[zoneMapPrunedScan]].
    */
  def zoneMapLayout(
      df: DataFrame,
      orderCols: Seq[String],
      statCol: org.apache.spark.sql.Column,
      numFiles: Int,
      dir: String): Unit = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val n = df.count()
    val rpf = math.max(1L, (n + numFiles - 1) / numFiles)
    prefixSumByRange(df, orderCols, lit(1L), "__rk")
      .withColumn("__zfile", expr(s"__rk div ${rpf}L"))
      .drop("__rk")
      .write.partitionBy("__zfile").mode("overwrite").parquet(s"$dir/data")
    val spark = df.sparkSession
    spark.read.parquet(s"$dir/data")
      .groupBy(col("__zfile"))
      .agg(min(statCol).as("mn"), max(statCol).as("mx"),
        count(lit(1)).as("c"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/zonemap")
  }

  /** Range query over a [[zoneMapLayout]]: read the zone map
    * (metadata-sized), keep files whose [mn, mx] overlaps [lo, hi],
    * and scan ONLY those — the `__zfile` partition filter prunes the
    * skipped files' directories at planning time, so the saved IO is
    * real, not a post-scan filter. The zone-map collect is bounded
    * by the FILE count (the layout's knob), never the data.
    *
    * Returns (prunedData, nFilesTotal, nFilesScanned) — the caller
    * applies its own residual predicate/aggregate to `prunedData`
    * (boundary files contain out-of-range rows by construction).
    */
  def zoneMapPrunedScan(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      statCol: org.apache.spark.sql.Column,
      lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column): (DataFrame, Long, Long) = {
    val zm = spark.read.parquet(s"$dir/zonemap")
    val nTotal = zm.count()
    val picked = zm.filter(col("mx") >= lo && col("mn") <= hi)
      .select(col("__zfile").cast("long"))
      .collect().map(_.getLong(0)).sorted
    val pruned = spark.read.parquet(s"$dir/data")
      .filter(col("__zfile").isin(picked.map(java.lang.Long.valueOf): _*))
    (pruned, nTotal, picked.length.toLong)
  }

  /** Compaction planner: assign an ORDERED list of (small) files to
    * output bins of ~`targetBytes` — the job a lakehouse OPTIMIZE
    * runs before rewriting a small-file-bloated table. Ordered
    * coalesce (files keep their `orderCols` order — time-ordered
    * ingest files compact into time-contiguous outputs, preserving
    * clustering) with the bin boundary at every `targetBytes` of
    * CUMULATIVE input: bin = floor(bytes_before / target). One file
    * never splits; a file larger than `targetBytes` gets its own bin
    * (its successor's cumulative jumps past the boundary).
    *
    * Scale shape: one range-partitioned prefix sum over the FILE
    * STATS frame (metadata-sized — millions of files, not the data),
    * one hash aggregate to the bin frame. The data itself is never
    * read: the plan is what the rewrite job executes afterwards.
    *
    * Output per bin: (bin_id, n_files, total_bytes, fill6 —
    * total/target, > 1 exactly when the bin closes past the
    * boundary or holds one oversized file), ordered by bin_id.
    */
  def compactionPlan(
      files: DataFrame,
      orderCols: Seq[String],
      bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val stats = files.select(
      (orderCols.map(col) :+ col(bytesCol).cast("long").as("__bytes")): _*)
    prefixSumByRange(stats, orderCols, col("__bytes"), "__before")
      .withColumn("bin_id", expr(s"__before div ${targetBytes}L"))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_files"), sum(col("__bytes"))
        .as("total_bytes"))
      .withColumn("fill6",
        floor(col("total_bytes").cast("double") /
          lit(targetBytes.toDouble) * lit(1e6) + lit(0.5)) / lit(1e6))
  }
}
