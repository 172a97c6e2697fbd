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
    val b = build.select(
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
      .withColumn("__asof_hit", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
    carried.select(
      (keys ++ probeOnly).map(col) ++
        payload.map(f => col(s"__asof_hit.$f").as(f)): _*)
  }
}
