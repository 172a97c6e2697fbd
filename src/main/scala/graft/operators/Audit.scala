package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing (the Deequ/expectations shape —
  * Schelter et al. 2018, "Automating Large-Scale Data Quality
  * Verification"): a fixed report of (check, checked, violations)
  * rows over a table, one row per constraint.
  *
  * Check families:
  *   - [[notNull]]     — null count per column
  *   - [[predicate]]   — rows violating an arbitrary row-local rule
  *   - [[unique]]      — duplicate row count over a key subset
  *                       (n_rows − n_distinct_keys)
  *   - [[foreignKey]]  — child keys with no parent (orphans), via a
  *                       DISTINCT-side anti-join
  *
  * Scale shape: every null/predicate check is ONE combinable
  * conditional-count aggregate, and ALL of them over the same table
  * fold into a SINGLE scan (one aggregate node, no per-check passes —
  * plan-asserted in AuditSpec). `unique` is a combinable
  * count-distinct-style aggregate over the key space; `foreignKey`
  * anti-joins the DISTINCT child keys (key-space-sized, broadcast
  * when small) — never the child rows. The report is a union of
  * one-row frames: constant-sized output however large the inputs.
  */
object Audit {

  final case class Rule(name: String, violatedWhen: Column)

  /** One row per column: (chk = "not_null:<col>", checked = rows,
    * violations = nulls). All columns in one scan.
    */
  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    scanChecks(df, cols.map(c =>
      Rule(s"not_null:$c", col(c).isNull)))

  /** One row per rule, all rules in ONE scan/aggregate. */
  def scanChecks(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be distinct (they key the report map)")
    val aggs = count(lit(1)).as("checked") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.violatedWhen, 1L).otherwise(0L)).as(s"__v$i")
      }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val pairs = rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(lit(r.name), struct(col("checked"),
        coalesce(col(s"__v$i"), lit(0L)).as("violations")))
    }
    row.select(explode(map(pairs: _*)).as(Seq("chk", "__s")))
      .select(col("chk"), col("__s.checked").as("checked"),
        col("__s.violations").as("violations"))
  }

  /** (chk = "unique:<keys>", checked = rows, violations = rows in
    * excess of one per key).
    */
  def unique(df: DataFrame, keys: Seq[String]): DataFrame = {
    val name = s"unique:${keys.mkString(",")}"
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("checked"),
        coalesce(sum(col("c") - 1), lit(0L)).as("violations"))
      .select(lit(name).as("chk"), col("checked"), col("violations"))
  }

  /** (chk = "fk:<child>-><parent>", checked = DISTINCT child keys,
    * violations = orphan keys). The anti-join runs on the distinct
    * key frame, not child rows.
    */
  def foreignKey(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      name: String): DataFrame = {
    val keys = child.select(col(childKey).as("__k"))
      .where(col("__k").isNotNull).distinct()
    val orphans = keys.join(
      parent.select(col(parentKey).as("__k")).distinct(),
      Seq("__k"), "left_anti")
    keys.agg(count(lit(1)).as("checked")).crossJoin(
        orphans.agg(count(lit(1)).as("violations")))
      .select(lit(s"fk:$name").as("chk"), col("checked"),
        col("violations"))
  }

  /** The full report: union of all requested checks. */
  def report(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "empty audit")
    parts.reduceLeft(_ unionAll _)
  }
}
