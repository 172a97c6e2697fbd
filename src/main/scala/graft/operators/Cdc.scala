package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture compaction operators: latest-wins upsert
  * resolution and SCD-type-2 interval building — the two standard
  * shapes for turning an append-only change log (which is exactly
  * what a replicated topic is — the reference mirrors such logs
  * verbatim, `PulsarSync.java:53-61`) into queryable current-state /
  * history tables.
  *
  * Scale notes:
  *   - [[latestWins]] is a hash AGGREGATE (`max` over a struct whose
  *     leading fields are the version order), NOT a row_number
  *     window: partial aggregation combines map-side, so the shuffle
  *     carries one row per (partition, key) instead of the full log.
  *     At 100 TB of events with 10^8 keys that is the difference
  *     between shuffling the corpus and shuffling the key space.
  *   - [[scd2]] needs full per-key order (intervals are defined by
  *     neighbors), so it IS a window — but change-filter and
  *     interval/version assembly share one partitioning: a single
  *     key-shuffle, both window passes pipelined on the same sort
  *     (plan-asserted in CdcSpec).
  */
object Cdc {

  /** One row per key: the payload of the row with the greatest
    * `orderCols` tuple. `orderCols` must end in a per-key-unique
    * tiebreak (e.g. an event id) so the payload never participates in
    * the comparison.
    */
  def latestWins(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "latestWins needs key and order columns")
    val carried = orderCols ++ payloadCols
    df.groupBy(keyCols.map(col): _*)
      .agg(max(struct(carried.map(col): _*)).as("__last"))
      .select(keyCols.map(col) ++
        carried.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** SCD-type-2 history: collapse consecutive rows whose `attrCols`
    * are unchanged (null-safe compare), then emit one row per
    * surviving change with `valid_from` = its `tsCol`, `valid_to` =
    * the NEXT change's `tsCol` (null while current), and a per-key
    * 1-based `ver`. Ordering inside a key is (tsCol, tieCols...) —
    * tieCols must make it total.
    */
  def scd2(
      df: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      tsCol: String,
      tieCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "scd2 needs key and attribute columns")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    val attr: Column = struct(attrCols.map(col): _*)
    df.select((keyCols ++ attrCols ++ (tsCol +: tieCols)).distinct.map(col): _*)
      .withColumn("__prev", lag(attr, 1).over(w))
      .where(col("__prev").isNull || !(attr <=> col("__prev")))
      .drop("__prev")
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("ver", row_number().over(w))
      .drop(tieCols: _*)
  }

  /** Golden-record survivorship (the MDM merge rule "most recent
    * non-null wins, per field"): one row per key where EACH field
    * independently takes the value from the LATEST record in which
    * that field was non-null — so a sparse recent record updates the
    * fields it carries without nulling out the rest.
    *
    * Like [[latestWins]] this is a pure hash aggregate —
    * `max(CASE WHEN field IS NOT NULL THEN (order…, field) END)` per
    * field, all fields in ONE combinable pass — never a per-field
    * window or self-join. `n_records` counts the merged records.
    */
  def goldenRecord(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      fieldCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty && fieldCols.nonEmpty,
      "goldenRecord needs key, order, and field columns")
    val aggs = count(lit(1)).as("n_records") +: fieldCols.map { f =>
      max(when(col(f).isNotNull,
        struct((orderCols.map(col) :+ col(f).as("__v")): _*)))
        .getField("__v").as(f)
    }
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Snapshot reconciliation diff — the "did the copy drift" check a
    * replication pipeline runs between a source table and its mirror
    * (or two daily snapshots): one full-outer key join classifies
    * every key as added / removed / changed / unchanged (null-safe
    * per-column compare, so a real NULL→value transition counts as a
    * change and NULL==NULL does not), and ONE combinable aggregate
    * emits the summary plus a per-column changed count (which column
    * drifts is the actionable part).
    *
    * Output: (chk, cnt) rows — `added`, `removed`, `changed`,
    * `unchanged`, then `changed:<col>` per compare column. Constant
    * output size however large the snapshots; the only exchange is
    * the key join.
    */
  def snapshotDiff(
      a: DataFrame,
      b: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "snapshotDiff needs key and compare columns")
    val an = a.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__ina", lit(1))
    val bn = b.select((keyCols ++ compareCols).map(c =>
        col(c).as(s"__b_$c")): _*)
      .withColumn("__inb", lit(1))
    val keyCond = keyCols.map(k => col(k) <=> col(s"__b_$k")).reduce(_ && _)
    val joined = an.join(bn, keyCond, "full_outer")
    val colDiff = compareCols.map(c =>
      (!(col(c) <=> col(s"__b_$c"))).cast("long"))
    val isAdded = col("__ina").isNull
    val isRemoved = col("__inb").isNull
    val anyDiff = compareCols.map(c => !(col(c) <=> col(s"__b_$c")))
      .reduce(_ || _)
    // index-keyed aliases + struct-array pivot (no parsed stack
    // string) — the columnProfile discipline for hostile names
    val flagCols = Seq(
      isAdded.cast("long").as("__add"),
      isRemoved.cast("long").as("__rem"),
      (!isAdded && !isRemoved && anyDiff).cast("long").as("__chg"),
      (!isAdded && !isRemoved && !anyDiff).cast("long").as("__unch")) ++
      colDiff.zipWithIndex.map { case (d, i) =>
        when(col("__ina").isNotNull && col("__inb").isNotNull, d)
          .otherwise(lit(0L)).as(s"__d_$i")
      }
    val flagged = joined.select(flagCols: _*)
    val aggs = Seq(sum(col("__add")).as("added"),
      sum(col("__rem")).as("removed"),
      sum(col("__chg")).as("changed"),
      sum(col("__unch")).as("unchanged")) ++
      compareCols.indices.map(i => sum(col(s"__d_$i")).as(s"__dc_$i"))
    val one = flagged.agg(aggs.head, aggs.tail: _*)
    val stacked = Seq(
      struct(lit("added").as("chk"), col("added").as("cnt")),
      struct(lit("removed").as("chk"), col("removed").as("cnt")),
      struct(lit("changed").as("chk"), col("changed").as("cnt")),
      struct(lit("unchanged").as("chk"), col("unchanged").as("cnt"))) ++
      compareCols.indices.map(i =>
        struct(lit(s"changed:${compareCols(i)}").as("chk"),
          col(s"__dc_$i").as("cnt")))
    one.select(explode(array(stacked: _*)).as("__p"))
      .select(col("__p.chk").as("chk"),
        coalesce(col("__p.cnt"), lit(0L)).as("cnt"))
  }
}
