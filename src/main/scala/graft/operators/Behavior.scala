package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-behavior analytics over the event stream (the classic
  * product-analytics pair every OLAP engine grows: windowed funnels —
  * ClickHouse `windowFunnel`'s greedy semantics — and cohort
  * retention). Both are pure relational shapes with integer-ms/day
  * arithmetic, so the DuckDB oracles replay them exactly.
  */
object Behavior {

  /** Windowed event funnel: per user, the furthest stage reached
    * where each stage's event is the EARLIEST event of that type at
    * or after the previous matched event, and within `windowMs` of it
    * (the published greedy `windowFunnel` matching — each step's
    * window re-anchors on the previous matched event). Every stage-0
    * event starts its own candidate chain; a user's level is the max
    * over their chains.
    *
    * Implementation: stages chain through [[AsOfJoin.ceilJoin]]
    * (union-tagged per-key window — ONE key shuffle per step, no
    * range-join blowup), then one fold computes the chain level
    * row-locally and a per-user max + histogram aggregate finish.
    * Timestamps flatten to unix ms up front (the q17/q67 events
    * convention, oracle twin `epoch_ms`).
    *
    * Output: (level, n_users) — n_users whose MAX level is exactly
    * `level`, levels 1..stages.size; users with no stage-0 event are
    * absent.
    */
  def eventFunnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      windowMs: Long): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least 2 stages")
    require(windowMs > 0, "windowMs must be positive")
    val ms = events.select(col(userCol),
      unix_millis(col(tsCol)).as("__ms"), col(typeCol))
    def stage(i: Int): DataFrame = ms
      .filter(col(typeCol) === stages(i))
      .select(col(userCol), col("__ms").as(s"__t$i"))
    val chained = (1 until stages.size).foldLeft(stage(0)) { (cur, i) =>
      AsOfJoin.ceilJoin(cur, stage(i), Seq(userCol),
        probeTs = s"__t${i - 1}", buildTs = s"__t$i",
        payload = Seq(s"__t$i"))
    }
    val lvl: Column = (1 until stages.size).foldLeft(lit(1)) { (acc, i) =>
      when(acc === i && col(s"__t$i").isNotNull
          && (col(s"__t$i") - col(s"__t${i - 1}")) <= windowMs, i + 1)
        .otherwise(acc)
    }
    chained
      .select(col(userCol), lvl.as("__lvl"))
      .groupBy(col(userCol))
      .agg(max(col("__lvl")).as("level"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Cohort retention: users cohort by their FIRST-seen epoch day;
    * each (cohort, later activity) pair lands in a week offset
    * bucket. All arithmetic is integer epoch-day/week math (floor
    * division on non-negative day deltas), so the matrix is exact
    * and engine-portable. Output: (cohort_epoch_day, week_offset,
    * n_users) — distinct users from the cohort active in that week.
    *
    * Scale shape: one (user)-keyed min aggregate, one broadcast-free
    * equi-join back on the user key, one (cohort, offset) count
    * distinct — the join and both aggregates share the user-key
    * partitioning until the final small matrix.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val days = events.select(col(userCol),
      floor(unix_millis(col(tsCol)) / lit(86400000L)).cast("long").as("__d"))
    val cohorts = days.groupBy(col(userCol))
      .agg(min(col("__d")).as("cohort_epoch_day"))
    days.join(cohorts, Seq(userCol))
      .select(col(userCol), col("cohort_epoch_day"),
        floor((col("__d") - col("cohort_epoch_day")) / lit(7L)).cast("long")
          .as("week_offset"))
      .groupBy(col("cohort_epoch_day"), col("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-key event
    * sequences: counts of consecutive (from → to) event types under
    * the total (ts, tie) order, with row-normalized transition
    * probabilities (6dp). One key shuffle for the lead window; the
    * (from, to) aggregate and the per-from totals are
    * state-space-sized (|types|²), and the normalization join
    * broadcasts the totals.
    */
  def markovTransitions(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    // |types|^2-sized — materialized so the totals aggregate and the
    // normalization join don't replay the corpus window twice (the
    // keyProfile shared-small-frame discipline)
    val trans = events
      .select(col(keyCol), col(tsCol), col(tieCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val totals = trans.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__tot"))
    trans.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (floor(col("n").cast("double") / col("__tot") * lit(1e6) +
          lit(0.5)) / lit(1e6)).as("p6"))
  }

  /** Sliding-window distinct actives (the "7-day active users per
    * day" reduction): for each day d in the observed span, the count
    * of DISTINCT keys seen in [d − windowDays + 1, d].
    *
    * Shape: collapse to the (epoch-day, key) frame first (one
    * combinable distinct — the corpus-sized term), then explode each
    * observation into the `windowDays` window-ends it serves and run
    * ONE count-distinct aggregate per window day. Shuffle volume is
    * windowDays × |key-days| — the exact formulation's floor. For
    * spans where exactness can yield (dashboards at 10⁹ keys),
    * [[Sketches.hllRegisters]] per day max-merged across the window
    * is the constant-state path (register merge == union by
    * construction); SketchesSpec's merge law plus the q114 error
    * envelope make the two interchangeable, and BehaviorSpec
    * cross-checks them on a planted span.
    */
  def slidingDistinct(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val keyDay = events.select(
        floor(unix_millis(col(tsCol)) / lit(86400000L)).cast("long")
          .as("__d"),
        col(keyCol))
      .distinct()
    val bounds = keyDay.agg(min(col("__d")).as("__lo"),
      max(col("__d")).as("__hi"))
    keyDay
      .select(explode(sequence(col("__d"),
        col("__d") + lit(windowDays - 1))).as("win_day"), col(keyCol))
      .crossJoin(broadcast(bounds))
      .where(col("win_day").between(col("__lo"), col("__hi")))
      .groupBy(col("win_day"))
      .agg(count_distinct(col(keyCol)).as("n_keys"))
  }

  /** Batch sessionization — the gap-based complement of the q40
    * STREAMING session window: a new session starts where the gap to
    * the previous event exceeds `gapMs`; the session id is the
    * running count of such starts. Output: one row per session with
    * (key, sess, n_events, start_ms, end_ms, dur_ms).
    *
    * Scale shape: ONE key shuffle total — the gap lag, the running
    * sum (both over the same (key, order) window), and the final
    * per-session aggregate (clustered by a superset key that the
    * key partitioning already satisfies) all reuse it; asserted in
    * BehaviorSpec.
    */
  def sessionize(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val ms = unix_millis(col(tsCol))
    val newSess = when(lag(ms, 1).over(w).isNull ||
      ms - lag(ms, 1).over(w) > gapMs, 1L).otherwise(0L)
    events
      .select(col(keyCol), col(tsCol), col(tieCol))
      .withColumn("sess",
        sum(newSess).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        min(ms).as("start_ms"), max(ms).as("end_ms"),
        (max(ms) - min(ms)).as("dur_ms"))
  }

  /** Gap-based session ids attached to every event — the shared
    * assignment under [[sessionize]], [[sessionPaths]] and
    * [[basketRules]]: one key-partitioned sort carries the lag gap
    * check and the running session counter. Output columns:
    * (keyCol, tsCol, tieCol, __t0 = typeCol, __sess).
    */
  private def withSessionIds(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val ms = unix_millis(col(tsCol))
    val newSess = when(lag(ms, 1).over(w).isNull ||
      ms - lag(ms, 1).over(w) > gapMs, 1L).otherwise(0L)
    events
      .select(col(keyCol), col(tsCol), col(tieCol),
        col(typeCol).as("__t0"))
      .withColumn("__sess",
        sum(newSess).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Association rules over session baskets (the Agrawal & Srikant
    * 1994 market-basket surface, with [[sessionize]]'s gap semantics
    * defining the basket): for every DIRECTED event-type pair
    * a → b co-occurring in at least `minSessions` sessions,
    *
    *   support    = n_ab / n_sessions
    *   confidence = n_ab / n_a
    *   lift       = (n_ab · n_sessions) / (n_a · n_b)
    *
    * (lift > 1 = the pair co-occurs more than independence predicts —
    * the signal behind "users who X also Y").
    *
    * Scale shape: session assignment is ONE key sort; baskets reduce
    * to DISTINCT (key, sess, type) rows, so the pair join is bounded
    * by Σ types-per-session² (types vocabulary, not events) and every
    * count is a map-side-combinable aggregate. Output:
    * (antecedent, consequent, n_ab, support6, confidence6, lift6).
    */
  def basketRules(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      gapMs: Long,
      minSessions: Long): DataFrame = {
    require(minSessions >= 1, s"minSessions must be >= 1, got $minSessions")
    val items = withSessionIds(events, keyCol, tsCol, tieCol, typeCol, gapMs)
      .select(col(keyCol).as("__k"), col("__sess"), col("__t0").as("__t"))
      .distinct()
    val nS = items.select(col("__k"), col("__sess")).distinct()
      .agg(count(lit(1)).as("__ns"))
    val nT = items.groupBy(col("__t")).agg(count(lit(1)).as("__nt"))
    val ab = items.alias("a")
      .join(items.alias("b"),
        col("a.__k") === col("b.__k") && col("a.__sess") === col("b.__sess")
          && col("a.__t") =!= col("b.__t"))
      .groupBy(col("a.__t").as("antecedent"), col("b.__t").as("consequent"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSessions)
    def pr6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    ab
      .join(nT.select(col("__t").as("antecedent"), col("__nt").as("__na")),
        Seq("antecedent"))
      .join(nT.select(col("__t").as("consequent"), col("__nt").as("__nb")),
        Seq("consequent"))
      .crossJoin(nS)
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        pr6(col("n_ab").cast("double") / col("__ns").cast("double"))
          .as("support6"),
        pr6(col("n_ab").cast("double") / col("__na").cast("double"))
          .as("confidence6"),
        pr6((col("n_ab") * col("__ns")).cast("double")
          / (col("__na") * col("__nb")).cast("double")).as("lift6"))
  }

  /** Frequent session paths: the top-k event-type n-grams over
    * SESSION-CONTIGUOUS event sequences (the "what do users actually
    * do" sequence-mining step over [[sessionize]]'s gap semantics —
    * a path never crosses a session boundary, so idle gaps don't
    * fabricate transitions the way a raw per-user n-gram would).
    *
    * One key-partitioned sort carries BOTH the session counter and
    * the n−1 lead columns (the leads check the LEAD ROW'S session id
    * instead of re-windowing by (key, sess) — same result, one
    * exchange, plan-asserted); the count is a map-side-combinable
    * aggregate over the path vocabulary and the final rank a
    * vocabulary-sized top-k.
    *
    * Output: (rn, path, cnt), path = ">"-joined event types, ranked
    * (cnt DESC, path).
    */
  def sessionPaths(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      gapMs: Long,
      n: Int,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 2, s"paths need n >= 2, got $n")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val sessed = withSessionIds(events, keyCol, tsCol, tieCol, typeCol, gapMs)
    val withLeads = (1 until n).foldLeft(sessed) { (df, i) =>
      df.withColumn(s"__t$i", lead(col("__t0"), i).over(w))
        .withColumn(s"__s$i", lead(col("__sess"), i).over(w))
    }
    val sameSession = (1 until n)
      .map(i => col(s"__s$i") === col("__sess"))
      .reduce(_ && _)
    val rk = Window.orderBy(col("cnt").desc, col("path"))
    withLeads
      // __t0 included: a null CURRENT type would make concat_ws emit a
      // truncated (n-1)-gram posing as an n-gram
      .filter((0 until n).map(i => col(s"__t$i").isNotNull).reduce(_ && _))
      .filter(sameSession)
      .select(concat_ws(">", (0 until n).map(i => col(s"__t$i")): _*)
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(rk))
      .filter(col("rn") <= topK)
      .select(col("rn"), col("path"), col("cnt"))
  }

  /** Two-variant A/B test on a unit-grain conversion: the pooled
    * two-proportion z statistic (and its χ² = z² twin for the 2×2
    * table) — the readout every experimentation pipeline computes
    * before believing a lift. A unit (user) converts if ANY of its
    * rows converts; a unit appearing under BOTH variants is a broken
    * assignment and fails loudly (silently dropping contaminated
    * units would bias exactly the statistic being reported).
    *
    * Determinism: all counts are exact integer aggregates; the only
    * floats are the final ONE-ROW rate/z/χ² chain, 6dp-rounded, and
    * `significant` thresholds the ROUNDED z (both engines compare
    * the same number — the q85 `pred` discipline).
    *
    * Scale shape: one (unit → variant, converted) hash aggregate
    * (map-side combined), one 2-group aggregate over the unit frame,
    * one distinct-variant metadata action (2 rows). No windows, no
    * joins.
    *
    * Output: ONE row (variant_a, variant_b, n_a, conv_a, n_b,
    * conv_b, rate_a6, rate_b6, lift6, z6, chi2_6, significant) —
    * variant_a < variant_b by value; lift = rate_b − rate_a; z > 0
    * means b converts more; NULL z/χ²/significant when the pooled
    * variance degenerates (all or none convert, or an empty side).
    */
  def abTest(
      df: DataFrame,
      unitCol: String,
      variantCol: String,
      conversionCol: String): DataFrame = {
    val units = df
      .filter(col(variantCol).isNotNull)
      .groupBy(col(unitCol).as("__u"))
      .agg(min(col(variantCol)).as("__va"), max(col(variantCol)).as("__vb"),
        max(col(conversionCol).cast("boolean").cast("long")).as("__c"))
      .localCheckpoint(true) // read by the guard count + both aggregates
    val nMixed = units.filter(col("__va") =!= col("__vb")).count()
    require(nMixed == 0,
      s"abTest: $nMixed unit(s) assigned to BOTH variants — broken split")
    val variants = units.select(col("__va")).distinct()
      .orderBy(col("__va")).collect().map(_.get(0))
    require(variants.length == 2,
      s"abTest needs exactly 2 variants, got ${variants.length}")
    val (a, b) = (variants(0), variants(1))
    def pr6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val s = units.agg(
      sum(when(col("__va") === a, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__va") === a, col("__c")).otherwise(0L)).as("conv_a"),
      sum(when(col("__va") === b, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__va") === b, col("__c")).otherwise(0L)).as("conv_b"))
    val nad = col("n_a").cast("double")
    val nbd = col("n_b").cast("double")
    val pa = col("conv_a").cast("double") / nad
    val pb = col("conv_b").cast("double") / nbd
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se2 = pp * (lit(1e0) - pp) * (lit(1e0) / nad + lit(1e0) / nbd)
    val zRaw = (pb - pa) / sqrt(se2)
    val ok = col("n_a") > 0 && col("n_b") > 0 && se2 > 0
    s.select(lit(a).as("variant_a"), lit(b).as("variant_b"),
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      pr6(pa).as("rate_a6"), pr6(pb).as("rate_b6"),
      pr6(pb - pa).as("lift6"),
      when(ok, pr6(zRaw)).otherwise(lit(null).cast("double")).as("z6"),
      when(ok, pr6(zRaw * zRaw)).otherwise(lit(null).cast("double"))
        .as("chi2_6"),
      when(ok, abs(pr6(zRaw)) >= 1.96)
        .otherwise(lit(null).cast("boolean")).as("significant"))
  }

  /** Last-touch revenue attribution: each conversion is credited to
    * the LATEST touch (click/impression) by the same key at or
    * before the conversion, provided it falls inside `windowMs`;
    * conversions with no in-window touch land in the NULL-campaign
    * row (reported, never silently dropped — unattributed spend is
    * the number marketing actually argues about).
    *
    * Inputs are integer-ms/micro-unit frames (the q124 epoch-ms
    * discipline): `conversions` carries (keyCol, convTsMsCol,
    * valueMicroCol — revenue pre-snapped to 1e-6 integer units so
    * the attribution sums are exact in any partition order);
    * `touches` carries (keyCol, touchTsMsCol, campaignCol). Ties:
    * several touches on the same millisecond resolve to the GREATEST
    * campaign value ([[AsOfJoin.floorJoin]]'s documented equal-ts
    * payload convention).
    *
    * Scale shape: ONE key shuffle (the floor join's union-tagged
    * window — never a time-range join blowup), then a
    * campaign-vocabulary-sized aggregate (map-side combined).
    *
    * Output: (campaign, n_conversions, revenue6), NULL campaign =
    * unattributed.
    */
  def lastTouchAttribution(
      conversions: DataFrame,
      touches: DataFrame,
      keyCol: String,
      convTsMsCol: String,
      touchTsMsCol: String,
      valueMicroCol: String,
      campaignCol: String,
      windowMs: Long): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    require(convTsMsCol != touchTsMsCol,
      "conversion and touch ts columns must have distinct names " +
        "(the floor join attaches the touch ts under its own name)")
    val joined = AsOfJoin.floorJoin(
      conversions, touches.select(col(keyCol), col(touchTsMsCol),
        col(campaignCol)),
      keys = Seq(keyCol), probeTs = convTsMsCol, buildTs = touchTsMsCol,
      payload = Seq(touchTsMsCol, campaignCol))
    joined
      .withColumn("__camp",
        when(col(touchTsMsCol).isNotNull &&
          col(touchTsMsCol) >= col(convTsMsCol) - lit(windowMs),
          col(campaignCol)))
      .groupBy(col("__camp").as("campaign"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueMicroCol)).as("__rm"))
      .select(col("campaign"), col("n_conversions"),
        (col("__rm").cast("double") / lit(1e6)).as("revenue6"))
  }

  /** Kaplan–Meier survival curve over integer event days: each
    * subject in `starts` either dies at its first `deaths` event at
    * or after its start, or is right-censored at `horizonMs` (the
    * end of observation) — the time-to-event readout (signup →
    * first purchase, onboarding → churn) that a plain conversion
    * rate misrepresents whenever observation windows differ.
    *
    *   S(t) = Π_{tᵢ ≤ t, event days} (1 − dᵢ/nᵢ)
    *
    * with the standard convention that subjects censored on an event
    * day count as at-risk on that day and leave after.
    *
    * Determinism: day arithmetic is integer ms→day division; the
    * product is carried as the CUMULATIVE INTEGER-MICRO SUM of
    * ln((n−d)/n) terms (each term snapped before summing — the q163
    * discipline — so S(t) = exp(Σ/1e6) is identical in any engine),
    * and a day with d = n drives S to EXACT 0 from that day on via a
    * cumulative flag instead of ln(0).
    *
    * Scale shape: one key-shuffle join (first death per subject),
    * one subject-grain aggregate, then all remaining work on the
    * DAY-STAT frame, which is calendar-bounded (one row per distinct
    * duration day — horizon-days rows at most, never subject-count
    * rows), where the cumulative windows run single-task by design
    * (the Tokenize vocab-rank bounded-frame precedent).
    *
    * Output: (day, n_at_risk, n_events, n_censored, survival6) for
    * event days, day ascending.
    */
  def kaplanMeier(
      starts: DataFrame,
      deaths: DataFrame,
      keyCol: String,
      startMsCol: String,
      eventMsCol: String,
      horizonMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayMs = 86400000L
    val firstDeath = starts
      .select(col(keyCol).as("__k"), col(startMsCol).as("__s"))
      .join(deaths.select(col(keyCol).as("__k"),
        col(eventMsCol).as("__e")), Seq("__k"), "left")
      .groupBy(col("__k"), col("__s"))
      .agg(min(when(col("__e") >= col("__s"), col("__e"))).as("__d"))
    val subjects = firstDeath
      .select(
        // INTEGRAL division (ms → day): `/` on longs is DOUBLE
        // division in Spark, and truncating it can disagree with the
        // oracle's integer `//` by one at exact-multiple boundaries
        when(col("__d").isNotNull, col("__d") - col("__s"))
          .otherwise(lit(horizonMs) - col("__s")).as("__dur"),
        col("__d").isNotNull.as("__died"))
      .select(expr(s"__dur div ${dayMs}L").as("day"), col("__died"))
    val dayStats = subjects.groupBy(col("day"))
      .agg(sum(when(col("__died"), 1L).otherwise(0L)).as("__d"),
        sum(when(col("__died"), 0L).otherwise(1L)).as("__w"))
    val tot = subjects.agg(count(lit(1)).as("__n"))
    val wBefore = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val atRisk = dayStats.crossJoin(broadcast(tot))
      .withColumn("__atrisk", col("__n") -
        coalesce(sum(col("__d") + col("__w")).over(wBefore), lit(0L)))
      .filter(col("__d") > 0)
      .withColumn("__tm", when(col("__d") < col("__atrisk"),
        floor(log((col("__atrisk") - col("__d")).cast("double") /
          col("__atrisk").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long")).otherwise(0L))
      .withColumn("__zf", when(col("__d") >= col("__atrisk"), 1L)
        .otherwise(0L))
    val wIncl = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    atRisk
      .withColumn("__ct", sum(col("__tm")).over(wIncl))
      .withColumn("__cz", sum(col("__zf")).over(wIncl))
      .select(col("day"), col("__atrisk").as("n_at_risk"),
        col("__d").as("n_events"), col("__w").as("n_censored"),
        when(col("__cz") > 0, lit(0e0))
          .otherwise(floor(exp(col("__ct").cast("double") / lit(1e6)) *
            lit(1e6) + lit(0.5)) / lit(1e6)).as("survival6"))
  }

  /** RFM segmentation: per-key Recency (days since last purchase at
    * `horizonMs`), Frequency (purchase count) and Monetary (revenue,
    * integer micro-units), each quartile-scored 1–4 with 4 best —
    * the classic customer-value grid (Hughes 1994) every CRM export
    * carries.
    *
    * Scores are INTEGER rank-quartiles under a TOTAL order
    * (metric, key) — `score = rank·4 div n` flipped for recency
    * where smaller is better — the q183 equal-count binning
    * discipline: no percentile floats, ties broken by key
    * identically in both engines.
    *
    * Scale shape: one key aggregate, then three range-partitioned
    * prefix-sum rankings over the KEY-sized frame (one per metric —
    * different total orders genuinely need different sorts), one
    * metadata count. No corpus-sized window.
    *
    * Output: (keyCol, recency_days, frequency, monetary6, r_score,
    * f_score, m_score, rfm), rfm = r·100 + f·10 + m.
    */
  def rfmScores(
      purchases: DataFrame,
      keyCol: String,
      tsMsCol: String,
      valueMicroCol: String,
      horizonMs: Long): DataFrame = {
    val per = purchases
      .groupBy(col(keyCol))
      .agg(max(col(tsMsCol)).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col(valueMicroCol)).as("__mon"))
      .select(col(keyCol),
        expr(s"(${horizonMs}L - __last) div 86400000L").as("recency_days"),
        col("frequency"), col("__mon"))
    val n = per.count()
    require(n > 0, "rfmScores needs at least one purchaser")
    def binned(df: DataFrame, metric: String, name: String): DataFrame =
      ScaleOps.prefixSumByRange(df, Seq(metric, keyCol), lit(1L), "__r0")
        .withColumn(name, expr(s"(__r0 * 4L) div ${n}L + 1L"))
        .drop("__r0")
    val scored = binned(binned(binned(
      per, "recency_days", "__rr"), "frequency", "f_score"),
      "__mon", "m_score")
      // recency: SMALLER is better → flip the ascending quartile
      .withColumn("r_score", lit(5L) - col("__rr"))
    scored.select(col(keyCol), col("recency_days"), col("frequency"),
      (col("__mon").cast("double") / lit(1e6)).as("monetary6"),
      col("r_score"), col("f_score"), col("m_score"),
      (col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
        .as("rfm"))
  }

  /** Cohort LTV curve: users cohorted by first-seen epoch day
    * ([[cohortRetention]]'s grid), revenue accumulated per integer
    * week offset — the cumulative value-per-user readout that tells
    * whether later cohorts monetize faster, the revenue twin of the
    * retention matrix.
    *
    * Input is row-grain: (keyCol, tsMsCol, revMicroCol) where
    * revMicro is the row's revenue in integer micro-units (0 for
    * non-revenue events — non-revenue rows still define cohort entry
    * and activity weeks). Weeks with no cohort activity emit no row;
    * the cumulative is unaffected (a silent week adds 0).
    *
    * All revenue stays integer micro-units through the cumulative
    * (partition add order can never move it); the two per-user
    * ratios divide once, at the end, per output row.
    *
    * Scale shape: one user-grain aggregate (cohort day), one
    * (cohort, week) aggregate, and a per-cohort cumulative window —
    * frames bounded by the week count, keys by the cohort-day
    * calendar (the q125 grid).
    *
    * Output: (cohort_epoch_day, week_offset, cohort_size, n_active,
    * week_revenue6, cum_revenue6, ltv_per_user6), ordered grid.
    */
  def ltvCurve(
      events: DataFrame,
      keyCol: String,
      tsMsCol: String,
      revMicroCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = events.select(col(keyCol).as("__u"),
      expr(s"${tsMsCol} div 86400000L").as("__d"),
      col(revMicroCol).as("__r"))
    val cohort = rows.groupBy(col("__u"))
      .agg(min(col("__d")).as("__c"))
    val sizes = cohort.groupBy(col("__c"))
      .agg(count(lit(1)).as("cohort_size"))
    val wk = rows.join(cohort, Seq("__u"))
      .select(col("__c"), col("__u"),
        expr("(__d - __c) div 7L").as("week_offset"), col("__r"))
    val cells = wk.groupBy(col("__c"), col("week_offset"))
      .agg(count_distinct(col("__u")).as("n_active"),
        sum(col("__r")).as("__wr"))
    val wCum = Window.partitionBy(col("__c")).orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("__cum", sum(col("__wr")).over(wCum))
      .join(sizes, Seq("__c"))
      .select(col("__c").as("cohort_epoch_day"), col("week_offset"),
        col("cohort_size"), col("n_active"),
        (col("__wr").cast("double") / lit(1e6)).as("week_revenue6"),
        (col("__cum").cast("double") / lit(1e6)).as("cum_revenue6"),
        // cum/size is micro-units per user: rounding on the micro
        // scale == 6dp rounding of the unit-scale LTV
        (floor(col("__cum").cast("double") /
          col("cohort_size").cast("double") + lit(0.5)) / lit(1e6))
          .as("ltv_per_user6"))
  }

  /** Gaps-and-islands interval merge: per key, coalesce overlapping
    * or touching [start, end) intervals into maximal islands — the
    * coverage operator behind "how much wall-clock did this user
    * actually occupy" (vs [[sessionize]], which gaps POINT events;
    * here the inputs carry durations and merging is set semantics).
    *
    * Pure integer-ms arithmetic, and the island partition is a
    * function of the interval SET: a row starts a new island iff its
    * start exceeds the running max end of everything sorted before
    * it under the (start, end) order — tied rows can swap without
    * moving any island boundary, so the result is deterministic at
    * any partition layout.
    *
    * Scale shape: ONE key exchange carries everything — both windows
    * (running max end, running island count) ride the same
    * (key, start, end) sort, and the final rollup groups on the same
    * key (the [[RankStats.robustOutliers]] discipline). Per-key
    * state never leaves the executor; keys are independent, so skew
    * is bounded by the hottest key's row count.
    *
    * Output: (keyCol, start_ms, end_ms, n_events) — one row per
    * island; callers order.
    */
  def mergeIntervals(
      df: DataFrame,
      keyCol: String,
      startMsCol: String,
      endMsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__u")).orderBy(col("__s"), col("__e"))
    val base = df.select(col(keyCol).as("__u"),
      col(startMsCol).cast("long").as("__s"),
      col(endMsCol).cast("long").as("__e"))
    val prevEnd = max(col("__e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = base.withColumn("__nf",
      when(prevEnd.isNull || col("__s") > prevEnd, 1L).otherwise(0L))
    val islands = flagged.withColumn("__isl",
      sum(col("__nf")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy(col("__u"), col("__isl"))
      .agg(min(col("__s")).as("start_ms"), max(col("__e")).as("end_ms"),
        count(lit(1)).as("n_events"))
      .select(col("__u").as(keyCol), col("start_ms"), col("end_ms"),
        col("n_events"))
  }
}
