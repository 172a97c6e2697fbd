package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextFns}

/** Fixed-memory frequency sketching (Cormode & Muthukrishnan's
  * Count-Min, 2005) over the token stream — the 100 TB alternative to
  * an exact token `groupBy`: the exact count shuffles every distinct
  * token through an exchange (vocabulary-sized state), while the
  * sketch is a `lanes × width` counter TABLE whose shuffle volume is
  * `tasks × lanes × width` REGARDLESS of corpus or vocabulary size —
  * map-side combine collapses each task's contribution to at most one
  * row per counter before anything moves.
  *
  * Relational formulation, no UDAF: a token occurrence contributes
  * one row per lane keyed (lane, bucket = (aᵢ·h + bᵢ) mod P mod
  * width) with h the oracle-portable md5-derived 60-bit hash
  * ([[PortableHash]] — the q97 Bloom filter's lane family, same
  * coefficients discipline: generated on the driver, shipped as
  * literals into both the plan and the oracle SQL).
  *
  * Estimates carry the standard one-sided guarantee: est(t) ≥
  * count(t) always (collisions only ADD), and with width w the
  * overestimate exceeds ε·N with probability ≤ (1/w·ε)^lanes — so a
  * heavy-hitter report (`est ≥ minCount`) has NO false negatives
  * (spec-asserted against exact counts).
  */
object Sketches {

  /** The Count-Min counter table: (lane, bucket, c) — lanes × width
    * rows at most, regardless of input size.
    */
  def countMinTable(
      docs: DataFrame,
      textCol: String,
      lanes: Int,
      width: Int): DataFrame = {
    require(lanes > 0 && width > 0, "count-min needs positive lanes and width")
    val (a, b) = PortableHash.laneCoeffs(lanes)
    val p = PortableHash.P
    docs
      .select(explode(TextFns.tokens(col(textCol))).as("__t"))
      .select((PortableHash.md5Long60(col("__t")) % lit(p)).as("__h"))
      .select(posexplode(array((0 until lanes).map(i =>
        (((lit(a(i)) * col("__h") + lit(b(i))) % lit(p)) % lit(width.toLong))
          .cast("long")): _*)).as(Seq("lane", "bucket")))
      .groupBy(col("lane"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Heavy hitters by sketch estimate: every candidate token (the
    * corpus's distinct tokens) whose Count-Min estimate
    * `min over lanes of c(lane, bucket(t))` reaches `minCount`.
    * Output: (token, est), est ≥ the token's exact count. The sketch
    * side broadcasts (lanes × width rows by construction); the
    * candidate side is one distinct over tokens — the only
    * vocabulary-sized term, and the one any candidate-set source
    * (e.g. yesterday's report) can replace.
    */
  def heavyHitters(
      docs: DataFrame,
      textCol: String,
      lanes: Int,
      width: Int,
      minCount: Long): DataFrame = {
    require(minCount >= 1, "minCount must be positive")
    val (a, b) = PortableHash.laneCoeffs(lanes)
    val p = PortableHash.P
    val cm = countMinTable(docs, textCol, lanes, width)
    val cand = docs
      .select(explode(TextFns.tokens(col(textCol))).as("token"))
      .distinct()
      .select(col("token"),
        (PortableHash.md5Long60(col("token")) % lit(p)).as("__h"))
    val candLanes = cand.select(col("token"),
      posexplode(array((0 until lanes).map(i =>
        (((lit(a(i)) * col("__h") + lit(b(i))) % lit(p)) % lit(width.toLong))
          .cast("long")): _*)).as(Seq("lane", "bucket")))
    // a candidate's buckets each hold at least its own occurrences, so
    // the join is total over candidates (inner join loses nothing)
    candLanes.join(broadcast(cm), Seq("lane", "bucket"))
      .groupBy(col("token"))
      .agg(min(col("c")).as("est"))
      .filter(col("est") >= minCount)
  }
}
