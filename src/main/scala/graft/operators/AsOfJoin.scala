package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (floor) join — the reference's offset-translation lookup
  * (`SparseMap.get` floor semantics, `SparseMap.java:55-62`,
  * `PulsarPartitionSyncWorker.java:211-218`), generalized: for each
  * probe row, attach the payload of the latest build row with
  * `buildTs <= probeTs` within the same key group; no floor ⇒ null
  * payload (the reference NPEs on this case — we fix it, SURVEY §2A
  * quirks).
  *
  * Implementation: union-tagged window, not a range join. Both sides
  * are unioned, sorted per key by (ts, side, payload) and the payload
  * is carried forward with `last(ignoreNulls)` over an unbounded
  * preceding frame. Cost at scale: ONE shuffle on the key columns and
  * a per-key sort — no O(probe×build) intermediate, no skew-prone
  * range-join blowup, and Catalyst keeps the whole thing in two
  * whole-stage-codegen spans. Ties: build rows sort before probe rows
  * at equal ts (`<=` semantics); equal-ts build rows resolve to the
  * greatest payload struct (documented, deterministic).
  */
object AsOfJoin {

  /** @param probe    left side; all its columns are preserved
    * @param build    right side; `keys ++ payload` columns are read
    * @param keys     equi-join key columns present on both sides
    * @param probeTs  ordering column on `probe`
    * @param buildTs  ordering column on `build`
    * @param payload  build columns to attach (null when no floor row);
    *                 attached under their own names — callers rename on
    *                 clash
    */
  def floorJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTs: String,
      buildTs: String,
      payload: Seq[String]): DataFrame = {
    val payloadStruct = struct(payload.map(build(_)): _*)
    // a null build ts satisfies NO comparison (`b.ts <= p.ts` is never
    // true in SQL) — without the filter it would sort nulls-first and
    // become a phantom floor for probes with no real one
    val b = build.filter(build(buildTs).isNotNull).select(
      keys.map(build(_)) ++ Seq(
        build(buildTs).as("__asof_ts"),
        lit(0).as("__asof_side"),
        payloadStruct.as("__asof_payload")): _*)
    val probeOnly = probe.columns.filterNot(keys.contains).toSeq
    val bSchema = b.schema("__asof_payload").dataType
    val p = probe.select(
      (keys ++ probeOnly).map(probe(_)) ++ Seq(
        probe(probeTs).as("__asof_ts"),
        lit(1).as("__asof_side"),
        lit(null).cast(bSchema).as("__asof_payload")): _*)
    val unioned = p.unionByName(b, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts"), col("__asof_side"), col("__asof_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      // a null PROBE ts matches nothing either (`b.ts <= NULL` is
      // never true) — nulls-first ordering happens to give it an
      // empty frame here, but the guard states the contract instead
      // of leaning on sort-order coincidence
      .withColumn("__asof_hit",
        when(col("__asof_ts").isNotNull,
          last(col("__asof_payload"), ignoreNulls = true).over(w)))
      .filter(col("__asof_side") === 1)
    carried.select(
      (keys ++ probeOnly).map(col) ++
        payload.map(f => col(s"__asof_hit.$f").as(f)): _*)
  }

  /** Forward as-of: attach the payload of the EARLIEST build row with
    * `buildTs >= probeTs` in the key group (pandas merge_asof
    * direction='forward'); no ceiling ⇒ null payload. Same
    * union-tagged-window machinery as [[floorJoin]] with the sort
    * reversed: ONE key shuffle, one per-key sort, no range-join
    * blowup. Ties: build rows sort before probe rows at equal ts
    * (`>=` semantics); equal-ts build rows resolve to the greatest
    * payload struct — the same deterministic convention as the floor.
    */
  def ceilJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTs: String,
      buildTs: String,
      payload: Seq[String]): DataFrame = {
    val payloadStruct = struct(payload.map(build(_)): _*)
    // null build ts matches nothing (`b.ts >= p.ts` never true)
    val b = build.filter(build(buildTs).isNotNull).select(
      keys.map(build(_)) ++ Seq(
        build(buildTs).as("__asof_ts"),
        lit(0).as("__asof_side"),
        payloadStruct.as("__asof_payload")): _*)
    val probeOnly = probe.columns.filterNot(keys.contains).toSeq
    val bSchema = b.schema("__asof_payload").dataType
    val p = probe.select(
      (keys ++ probeOnly).map(probe(_)) ++ Seq(
        probe(probeTs).as("__asof_ts"),
        lit(1).as("__asof_side"),
        lit(null).cast(bSchema).as("__asof_payload")): _*)
    val unioned = p.unionByName(b, allowMissingColumns = true)
    // descending ts: "carried forward" = the nearest ts >= probe ts;
    // ascending payload keeps last() = greatest struct among ties
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts").desc, col("__asof_side"), col("__asof_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      // a null PROBE ts sorts nulls-LAST under desc, so its preceding
      // frame would contain EVERY build row and fabricate a match —
      // the guard enforces `b.ts >= NULL is never true`
      .withColumn("__asof_hit",
        when(col("__asof_ts").isNotNull,
          last(col("__asof_payload"), ignoreNulls = true).over(w)))
      .filter(col("__asof_side") === 1)
    carried.select(
      (keys ++ probeOnly).map(col) ++
        payload.map(f => col(s"__asof_hit.$f").as(f)): _*)
  }

  /** Nearest as-of: attach the payload of the build row whose ts is
    * CLOSEST to the probe's, in either direction (pandas merge_asof
    * direction='nearest'); distance ties break toward the floor side.
    * `distance(probeTs, buildTs)` must be a non-negative orderable
    * column (e.g. `(a, b) => abs(unix_millis(a) - unix_millis(b))`) —
    * the caller owns the metric because ts types vary.
    *
    * `tolerance`: optional predicate on the same two columns; a hit
    * whose predicate is false is nulled out (pandas' tolerance=).
    *
    * Cost: the floor and ceiling candidates are computed in ONE
    * window exec — same partitioning + ordering, two frames
    * (unbounded-preceding for the floor carry, unbounded-following
    * with `first` for the strictly-later ceiling) — so the whole
    * operator is still one key shuffle + one per-key sort.
    */
  def nearestJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTs: String,
      buildTs: String,
      payload: Seq[String],
      distance: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      tolerance: Option[(org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column] = None)
      : DataFrame = {
    // carry the build ts inside the struct so distance/tolerance can
    // read it after the window pass
    val payloadStruct = struct(
      (build(buildTs).as("__ts") +: payload.map(build(_))): _*)
    // null build ts is on neither side of any probe
    val b = build.filter(build(buildTs).isNotNull).select(
      keys.map(build(_)) ++ Seq(
        build(buildTs).as("__asof_ts"),
        lit(0).as("__asof_side"),
        payloadStruct.as("__asof_payload")): _*)
    val probeOnly = probe.columns.filterNot(keys.contains).toSeq
    val bSchema = b.schema("__asof_payload").dataType
    val p = probe.select(
      (keys ++ probeOnly).map(probe(_)) ++ Seq(
        probe(probeTs).as("__asof_ts"),
        lit(1).as("__asof_side"),
        lit(null).cast(bSchema).as("__asof_payload")): _*)
    val unioned = p.unionByName(b, allowMissingColumns = true)
    val order = Seq(col("__asof_ts"), col("__asof_side"), col("__asof_payload"))
    val wFloor = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // probe rows sort AFTER equal-ts build rows, so current-row →
    // following sees only strictly-later builds: the floor side owns
    // equal ts, exactly once
    val wCeil = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val probeTsCol = col("__asof_ts")
    def guarded(hit: org.apache.spark.sql.Column) = tolerance match {
      case Some(tol) =>
        when(hit.isNotNull && tol(probeTsCol, hit.getField("__ts")), hit)
      case None => hit
    }
    val carried = unioned
      // null probe ts: neither direction can match (`<= NULL` /
      // `> NULL` are never true) — without the guard the ceiling
      // frame of a nulls-first-sorted probe row spans every build row
      .withColumn("__floor",
        when(probeTsCol.isNotNull,
          guarded(last(col("__asof_payload"), ignoreNulls = true).over(wFloor))))
      .withColumn("__ceil",
        when(probeTsCol.isNotNull,
          guarded(first(col("__asof_payload"), ignoreNulls = true).over(wCeil))))
      .filter(col("__asof_side") === 1)
      // nearest with floor-wins ties: take the ceiling only when it is
      // strictly closer (or the floor is missing)
      .withColumn("__hit",
        when(col("__floor").isNull, col("__ceil"))
          .when(col("__ceil").isNull, col("__floor"))
          .when(distance(probeTsCol, col("__ceil.__ts"))
            < distance(probeTsCol, col("__floor.__ts")), col("__ceil"))
          .otherwise(col("__floor")))
    carried.select(
      (keys ++ probeOnly).map(col) ++
        payload.map(f => col(s"__hit.$f").as(f)): _*)
  }
}
