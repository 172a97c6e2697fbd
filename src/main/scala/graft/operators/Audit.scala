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

  /** One-pass numeric column profile: for every column one row
    * (column, n_rows, n_nulls, vmin, vmax, mean6). ALL columns fold
    * into a SINGLE scan/aggregate (the [[scanChecks]] discipline —
    * one combinable aggregate node emits every stat, then a row-local
    * `stack` pivots the single stat row to long format), so profiling
    * k columns of a 100 TB table costs one pass regardless of k.
    * mean6 is null for all-null columns (zero-denominator convention).
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    // internal aliases are INDEX-keyed and the pivot is a struct
    // array, never a parsed `stack(...)` string — a column name with
    // '-', '.' or spaces must not reach any SQL parser
    val aggCols = count(lit(1)).as("__n") +:
      cols.indices.flatMap(i => Seq(
        sum(when(col(cols(i)).isNull, 1L).otherwise(0L)).as(s"__nulls_$i"),
        min(col(cols(i)).cast("double")).as(s"__min_$i"),
        max(col(cols(i)).cast("double")).as(s"__max_$i"),
        sum(col(cols(i)).cast("double")).as(s"__sum_$i")))
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val stacked = cols.indices.map(i =>
      struct(lit(cols(i)).as("column"), col(s"__nulls_$i").as("n_nulls"),
        col(s"__min_$i").as("vmin"), col(s"__max_$i").as("vmax"),
        col(s"__sum_$i").as("__vsum")))
    one.select(col("__n").as("n_rows"), explode(array(stacked: _*)).as("__p"))
      .select(col("__p.column").as("column"), col("n_rows"),
        col("__p.n_nulls").as("n_nulls"),
        col("__p.vmin").as("vmin"), col("__p.vmax").as("vmax"),
        when(col("n_rows") - col("__p.n_nulls") === 0,
            lit(null).cast("double"))
          .otherwise(floor(col("__p.__vsum")
            / (col("n_rows") - col("__p.n_nulls")).cast("double")
            * lit(1e6) + lit(0.5)) / lit(1e6)).as("mean6"))
  }

  /** Benford first-significant-digit audit (Benford 1938; the
    * fabricated-data / unit-mixup screen financial auditors run, and
    * a cheap synthetic-data smell test for generated numeric
    * columns): observed first-digit rates of a positive column
    * against the Benford expectation log10(1 + 1/d), with the
    * per-digit deviation. One combinable 9-group aggregate; the
    * digit is `floor(v / 10^floor(log10 v))` — libm log10 is
    * correctly rounded in both engines (q51/q85 precedent), so the
    * digit extraction never disagrees.
    *
    * Output: (digit, cnt, obs_rate6, exp_rate6, dev6) for the digits
    * present. Zero/negative rows are excluded (no first significant
    * digit).
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val digit = floor(v / pow(lit(10.0), floor(log10(v)))).cast("int")
    val counts = df.filter(v > 0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("__n"))
    counts.crossJoin(tot)
      .select(col("digit"), col("cnt"),
        (floor(col("cnt").cast("double") / col("__n").cast("double")
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("obs_rate6"),
        (floor(log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("exp_rate6"))
      .withColumn("dev6",
        floor((col("obs_rate6") - col("exp_rate6")) * lit(1e6) + lit(0.5))
          / lit(1e6))
  }

  /** Snapshot drift report (the distribution-shift monitor a
    * continuously-ingested corpus needs next to [[scanChecks]]'s
    * within-snapshot rules): [[columnProfile]] of two snapshots
    * joined per column, with the deltas a drift alert keys on —
    * mean shift, null-rate shift, and whether the observed value
    * range EXPANDED (new out-of-range values arriving is the classic
    * upstream-schema-change symptom). Two single-scan profiles + one
    * k-row join: the snapshots are never co-shuffled.
    *
    * Output per column: (column, n_a, n_b, mean_a6, mean_b6,
    * mean_delta6, null_rate_a6, null_rate_b6, range_expanded).
    */
  def driftReport(
      a: DataFrame,
      b: DataFrame,
      cols: Seq[String]): DataFrame = {
    val pa = columnProfile(a, cols)
    val pb = columnProfile(b, cols)
    def nullRate(n: Column, nulls: Column): Column =
      when(n === 0, lit(null).cast("double"))
        .otherwise(floor(nulls.cast("double") / n.cast("double")
          * lit(1e6) + lit(0.5)) / lit(1e6))
    pa.select(col("column"), col("n_rows").as("n_a"),
        col("n_nulls").as("__nulls_a"), col("vmin").as("__min_a"),
        col("vmax").as("__max_a"), col("mean6").as("mean_a6"))
      .join(pb.select(col("column"), col("n_rows").as("n_b"),
        col("n_nulls").as("__nulls_b"), col("vmin").as("__min_b"),
        col("vmax").as("__max_b"), col("mean6").as("mean_b6")),
        Seq("column"))
      .select(col("column"), col("n_a"), col("n_b"),
        col("mean_a6"), col("mean_b6"),
        (floor((col("mean_b6") - col("mean_a6")) * lit(1e6) + lit(0.5))
          / lit(1e6)).as("mean_delta6"),
        nullRate(col("n_a"), col("__nulls_a")).as("null_rate_a6"),
        nullRate(col("n_b"), col("__nulls_b")).as("null_rate_b6"),
        (col("__min_b") < col("__min_a") || col("__max_b") > col("__max_a"))
          .as("range_expanded"))
  }

  /** Association strength between two CATEGORICAL columns: mutual
    * information (nats) and Cramér's V from the full r×c contingency
    * grid — the audit run before trusting a stratification key or
    * suspecting label leakage between two metadata columns (is
    * `source` just `lang` in disguise?). Listwise deletion of nulls.
    *
    * χ² sums over ALL grid cells including observed-zero ones (a
    * zero cell contributes its expectation e_ij); MI terms vanish at
    * n_ij = 0. Both statistics snap each cell term to integer
    * micro-units BEFORE summing (the q163 order-independence
    * discipline — the grid is small, but partition add order must
    * still never move a hash), so the only unrounded floats are
    * row-local. Cramér's V reads NULL when min(r, c) = 1 (a constant
    * column has no association to measure).
    *
    * Scale shape: ONE corpus hash aggregate to the (a, b) cell frame
    * (map-side combined, grid-sized result); marginals, totals, the
    * zero-filled grid and both statistics are grid-sized arithmetic.
    *
    * Output: ONE row (n, n_a_classes, n_b_classes, mi6, chi2_6,
    * cramers_v6).
    */
  def categoricalAssociation(
      df: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("__a"), col(bCol).as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__nij"))
      .localCheckpoint(true) // grid-sized; read by marginals + grid + total
    val ra = cells.groupBy(col("__a")).agg(sum(col("__nij")).as("__ni"))
    val rb = cells.groupBy(col("__b")).agg(sum(col("__nij")).as("__nj"))
    val tot = cells.agg(coalesce(sum(col("__nij")), lit(0L)).as("__n"))
    val grid = ra.crossJoin(rb)
      .join(cells, Seq("__a", "__b"), "left")
      .select(col("__ni"), col("__nj"),
        coalesce(col("__nij"), lit(0L)).as("__nij"))
      .crossJoin(broadcast(tot))
    val nd = col("__n").cast("double")
    val nijd = col("__nij").cast("double")
    val nid = col("__ni").cast("double")
    val njd = col("__nj").cast("double")
    val e = nid * njd / nd
    val miTerm = when(col("__nij") > 0,
      floor((nijd / nd) * log(nd * nijd / (nid * njd)) * lit(1e6) + lit(0.5))
        .cast("long")).otherwise(0L)
    val chiTerm = floor((nijd - e) * (nijd - e) / e * lit(1e6) + lit(0.5))
      .cast("long")
    val s = grid.agg(sum(miTerm).as("__mi_micro"),
      sum(chiTerm).as("__chi_micro"))
    val rc = ra.agg(count(lit(1)).as("__r"))
      .crossJoin(rb.agg(count(lit(1)).as("__c")))
      .crossJoin(tot)
    def pr6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    s.crossJoin(rc).select(
      col("__n").as("n"), col("__r").as("n_a_classes"),
      col("__c").as("n_b_classes"),
      (col("__mi_micro").cast("double") / lit(1e6)).as("mi6"),
      (col("__chi_micro").cast("double") / lit(1e6)).as("chi2_6"),
      when(least(col("__r"), col("__c")) > 1,
        pr6(sqrt((col("__chi_micro").cast("double") / lit(1e6)) /
          (col("__n").cast("double") *
            (least(col("__r"), col("__c")) - lit(1L)).cast("double")))))
        .otherwise(lit(null).cast("double")).as("cramers_v6"))
  }

  /** Population Stability Index of a numeric column per group against
    * a BASELINE group — the monitoring score model-risk teams bin
    * score/feature distributions with (PSI < 0.1 stable, > 0.2
    * actionable drift; the industry folklore thresholds). Fixed-width
    * binning (`binWidth`, `nBins`, clamped to the last bin) so bin
    * identity is a pure row-local function — a quantile binning would
    * make every group's PSI depend on a global sort. Laplace +1
    * smoothing on BOTH sides (p = (c+1)/(n+B)) keeps every bin
    * strictly positive — PSI's ln(p/q) is undefined on empty bins and
    * epsilon hacks are engine-dependent; +1 is exact integer
    * arithmetic.
    *
    * Determinism: bin counts are exact integer aggregates over the
    * full group×bin GRID (zero-filled — absent bins still carry
    * smoothing mass); each bin's (p−q)·ln(p/q) term snaps to integer
    * NANO-units before the per-group sum (the q190 snap-then-sum
    * discipline, 1e-9 granularity because PSI terms are O(1e-4)),
    * so partition add order can never move the hash.
    *
    * Scale shape: ONE corpus hash aggregate to the (group, bin)
    * frame (map-side combined, grid-sized), a broadcast of the
    * baseline's B bins, grid-sized arithmetic after.
    *
    * Output per non-baseline group: (groupCol, n_rows, psi6,
    * drifted = psi6 > 0.2), ordered by group.
    */
  def psiDrift(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      baseline: String,
      binWidth: Long,
      nBins: Int): DataFrame = {
    require(binWidth > 0 && nBins > 1, "psiDrift needs binWidth>0, nBins>1")
    val counts = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"),
        psiBin(col(valueCol), binWidth, nBins).as("__bin"))
      .groupBy(col("__g"), col("__bin")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // grid-sized; feeds grid + totals below
    psiFromCounts(counts, baseline, nBins)
      .withColumnRenamed("__g", groupCol)
  }

  /** The row-local bin assignment [[psiDrift]] uses — exposed so a
    * STREAMING monitor can maintain the same (group, bin) counts
    * incrementally (graft.streaming.StreamingPsi): floor(v/w) over
    * clamped non-negative longs, exact while v < 2^53, top bin
    * clamps overflow.
    */
  def psiBin(value: Column, binWidth: Long, nBins: Int): Column =
    least(
      floor(greatest(value.cast("long"), lit(0L)) /
        lit(binWidth.toDouble)).cast("long"),
      lit(nBins - 1L))

  /** PSI from a pre-aggregated (__g, __bin, __c) count frame — the
    * shared math of the batch operator and its streaming twin (whose
    * running aggregate produces exactly this frame at every
    * micro-batch). Output keeps the `__g` column name; [[psiDrift]]
    * renames it.
    */
  def psiFromCounts(
      counts: DataFrame,
      baseline: String,
      nBins: Int): DataFrame = {
    // grid-sized; breaks self-join lineage (the grid below joins the
    // frame against its own distinct — a streaming-snapshot input
    // otherwise trips conflicting-reference resolution)
    val c = counts.localCheckpoint(true)
    val grid = c.select(col("__g")).distinct()
      .crossJoin(
        c.sparkSession.range(nBins).select(col("id").as("__bin")))
      .join(c, Seq("__g", "__bin"), "left")
      .select(col("__g"), col("__bin"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val totals = grid.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    val withP = grid.join(totals, Seq("__g"))
      .select(col("__g"), col("__bin"), col("__n"),
        ((col("__c") + lit(1L)).cast("double") /
          (col("__n") + lit(nBins.toLong)).cast("double")).as("__p"))
    val base = withP.filter(col("__g") === baseline)
      .select(col("__bin"), col("__p").as("__q"))
    val term = (col("__p") - col("__q")) * log(col("__p") / col("__q"))
    withP.filter(col("__g") =!= baseline)
      .join(broadcast(base), Seq("__bin"))
      .select(col("__g"), col("__n"),
        floor(term * lit(1e9) + lit(0.5)).cast("long").as("__t9"))
      .groupBy(col("__g"))
      .agg(max(col("__n")).as("n_rows"), sum(col("__t9")).as("__s9"))
      .select(col("__g"), col("n_rows"),
        (floor(col("__s9").cast("double") / lit(1e9) * lit(1e6) + lit(0.5))
          / lit(1e6)).as("psi6"))
      .withColumn("drifted", col("psi6") > lit(0.2))
  }

  /** k-anonymity audit over quasi-identifier columns (Sweeney 2002):
    * the share of rows whose quasi-identifier tuple is shared by
    * fewer than k rows — the released-data privacy readout a
    * training-corpus export runs BEFORE shipping (a row in a size-1
    * QI group is individually re-identifiable however the direct
    * identifiers were scrubbed).
    *
    * Pure integer counting: one hash aggregate to the QI-group frame
    * (map-side combined), one combinable readout aggregate over it;
    * the share is the only float, 6dp-snapped. NULL QI values form
    * their own groups (null-safe grouping — the SQL GROUP BY
    * convention both engines share).
    *
    * Output: ONE row (k, n_rows, n_groups, n_small_groups,
    * n_rows_small, share_small6, min_group_size, k_anonymous =
    * n_rows_small == 0).
    */
  def kAnonymity(
      df: DataFrame,
      qiCols: Seq[String],
      k: Long): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymity needs quasi-identifier columns")
    require(k >= 2, s"k must be >= 2, got $k")
    val g = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("__n"))
    def p6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    g.agg(count(lit(1)).as("n_groups"),
        coalesce(sum(col("__n")), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("__n") < k, 1L).otherwise(0L)), lit(0L))
          .as("n_small_groups"),
        coalesce(sum(when(col("__n") < k, col("__n")).otherwise(0L)),
          lit(0L)).as("n_rows_small"),
        min(col("__n")).as("min_group_size"))
      .select(lit(k).as("k"), col("n_rows"), col("n_groups"),
        col("n_small_groups"), col("n_rows_small"),
        when(col("n_rows") > 0, p6(col("n_rows_small").cast("double") /
          col("n_rows").cast("double")))
          .otherwise(lit(null).cast("double")).as("share_small6"),
        col("min_group_size"),
        (col("n_rows_small") === 0L).as("k_anonymous"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): the companion
    * release gate to [[kAnonymity]] — a QI group can be large (so it
    * passes k-anonymity) yet still leak if every member shares the
    * same SENSITIVE value. Measures, per quasi-identifier group, the
    * number of distinct sensitive values, and reports the share of
    * rows sitting in groups with diversity < l (the homogeneity-
    * attack surface).
    *
    * Scale shape: one exact distinct-per-group aggregate — computed
    * as a hash aggregate over (QI, sensitive) first (map-side
    * combined to the distinct-pair frame, which is the only corpus-
    * sized exchange) and a second group-sized aggregate over it; the
    * readout is ONE row. NULL sensitive values count as a value of
    * their own (a group that is all-NULL is diversity 1 — still
    * homogeneous, still leaking).
    *
    * Output: ONE row (l, n_rows, n_groups, n_low_groups, n_rows_low,
    * share_low6, min_diversity, l_diverse = n_rows_low == 0).
    */
  def lDiversity(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      l: Long): DataFrame = {
    require(qiCols.nonEmpty, "lDiversity needs quasi-identifier columns")
    require(!qiCols.contains(sensitiveCol),
      "sensitive column must not be part of the quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    def p6(c: Column) = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    // distinct-pair frame first: (QI, sensitive) -> n rows, so the
    // diversity count is an exact count over a pre-combined frame
    val pairs = df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val g = pairs.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__div"), sum(col("__n")).as("__rows"))
    g.agg(count(lit(1)).as("n_groups"),
        coalesce(sum(col("__rows")), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("__div") < l, 1L).otherwise(0L)), lit(0L))
          .as("n_low_groups"),
        coalesce(sum(when(col("__div") < l, col("__rows")).otherwise(0L)),
          lit(0L)).as("n_rows_low"),
        min(col("__div")).as("min_diversity"))
      .select(lit(l).as("l"), col("n_rows"), col("n_groups"),
        col("n_low_groups"), col("n_rows_low"),
        when(col("n_rows") > 0, p6(col("n_rows_low").cast("double") /
          col("n_rows").cast("double")))
          .otherwise(lit(null).cast("double")).as("share_low6"),
        col("min_diversity"),
        (col("n_rows_low") === 0L).as("l_diverse"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007): the
    * third release gate of the family — a QI group can clear
    * k-anonymity AND l-diversity yet still leak when its sensitive
    * distribution differs sharply from the table's (skewness attack:
    * "diverse but all-extreme"). Per QI group, the ordered-distance
    * Earth Mover's Distance between the group's distribution over the
    * sensitive values and the GLOBAL distribution:
    * EMD = (1/(m−1)) · Σ_{j<m} |Σ_{i≤j} (q_i − p_i)| over the m
    * globally-ordered sensitive values; the release is t-close when
    * every group's EMD ≤ t.
    *
    * The sensitive column must be ORDERED and LOW-CARDINALITY (a
    * bucketed numeric or an ordinal code): the value domain is
    * rank-indexed with ONE m-row single-task window (catalog-sized by
    * contract) and broadcast, and the per-group frame is groups × m
    * rows — the QI-group window partitions are exactly m rows each,
    * never corpus-sized. Portability discipline: q_i and p_i are
    * double divisions of exact counts (bit-identical cross-engine),
    * the cumulative sum runs in pinned rank order (sequential in both
    * engines), each |cum| is SNAPPED TO 1e-6 FIXED-POINT LONGS before
    * the per-group sum (long addition is order-free where a double
    * sum is not), and the final EMD is 6-dp rounded.
    *
    * Output: ONE row (t, n_rows, n_groups, n_far_groups, n_rows_far,
    * share_far6, max_emd6, t_close = n_rows_far == 0).
    *
    * NULL semantics (r16 ADVICE): a null sensitive value (or a null
    * QI component) is a legitimate domain value / group key — the
    * dense-domain join back is NULL-SAFE (`<=>`), so a null-keyed
    * group's own mass reaches its distribution instead of silently
    * vanishing (a plain join would leave the group's q summing below
    * 1 and distort every EMD). Nulls rank FIRST in the sensitive
    * domain order (pinned; Spark's default). Cross-engine note: a
    * SQL oracle replaying this operator must pin NULLS FIRST
    * explicitly — DuckDB defaults to nulls-last.
    */
  def tCloseness(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      t: Double): DataFrame = {
    require(qiCols.nonEmpty, "tCloseness needs quasi-identifier columns")
    require(!qiCols.contains(sensitiveCol),
      "sensitive column must not be part of the quasi-identifier")
    require(t > 0 && t < 1, s"t must be in (0, 1), got $t")
    def p6(c: Column) = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    import org.apache.spark.sql.expressions.Window
    val pairs = df
      .groupBy((qiCols.map(col) :+ col(sensitiveCol).as("__v")): _*)
      .agg(count(lit(1)).as("__n"))
    val glob = pairs.groupBy(col("__v")).agg(sum(col("__n")).as("__g"))
    // m-row unpartitioned window: the sensitive DOMAIN, not the corpus
    val globR = glob.select(col("__v"), col("__g"),
      row_number().over(Window.orderBy(col("__v").asc_nulls_first))
        .as("__r"))
    val tot = glob.agg(sum(col("__g")).as("__nn"),
      count(lit(1)).as("__m"))
    val grp = pairs.groupBy(qiCols.map(col): _*)
      .agg(sum(col("__n")).as("__rows"))
    // null-safe dense join (scaladoc NULL semantics): the left side's
    // (QI, __v) grid includes null domain values and null QI keys;
    // plain equality would never match them and the group's own mass
    // would drop out of its distribution
    val pr = pairs.select((qiCols.map(c => col(c).as(s"__p_$c")) :+
      col("__v").as("__pv") :+ col("__n")): _*)
    val joinCond = (qiCols.map(c => col(c) <=> col(s"__p_$c")) :+
      (col("__v") <=> col("__pv"))).reduce(_ && _)
    val dense = grp
      .crossJoin(broadcast(globR)).crossJoin(broadcast(tot))
      .join(pr, joinCond, "left")
      .drop((qiCols.map(c => s"__p_$c") :+ "__pv"): _*)
    val w = Window.partitionBy(qiCols.map(col): _*).orderBy(col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val term = coalesce(col("__n"), lit(0L)).cast("double") /
      col("__rows").cast("double") -
      col("__g").cast("double") / col("__nn").cast("double")
    val cum = dense.select((qiCols.map(col) :+ col("__rows") :+
      col("__r") :+ col("__m") :+ sum(term).over(w).as("__cd")): _*)
    val perGroup = cum.groupBy(qiCols.map(col): _*)
      .agg(max(col("__rows")).as("__rows"), max(col("__m")).as("__m"),
        sum(when(col("__r") < col("__m"),
          floor(abs(col("__cd")) * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(0L)).as("__micro"))
      .select(col("__rows"),
        when(col("__m") > 1,
          p6((col("__micro").cast("double") / lit(1e6)) /
            (col("__m") - lit(1)).cast("double")))
          .otherwise(lit(0.0)).as("__emd6"))
    perGroup.agg(count(lit(1)).as("n_groups"),
        coalesce(sum(col("__rows")), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("__emd6") > t, 1L).otherwise(0L)), lit(0L))
          .as("n_far_groups"),
        coalesce(sum(when(col("__emd6") > t, col("__rows"))
          .otherwise(0L)), lit(0L)).as("n_rows_far"),
        max(col("__emd6")).as("max_emd6"))
      .select(lit(t).as("t"), col("n_rows"), col("n_groups"),
        col("n_far_groups"), col("n_rows_far"),
        when(col("n_rows") > 0, p6(col("n_rows_far").cast("double") /
          col("n_rows").cast("double")))
          .otherwise(lit(null).cast("double")).as("share_far6"),
        col("max_emd6"),
        (col("n_rows_far") === 0L).as("t_close"))
  }
}
