package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Streaming twin of [[graft.operators.Sketches.heavyHitters]]
  * (q103): the live frequent-token monitor. Two running streaming
  * aggregations carry everything:
  *
  *   - the Count-Min counter grid ([[cmCounts]]) — lanes × width
  *     rows however long the stream runs, maintained by Spark's
  *     streaming aggregation over the SAME lane projection the batch
  *     sketch uses ([[Sketches.countMinFromTokens]]);
  *   - the candidate vocabulary ([[vocab]]) — distinct tokens seen,
  *     the one vocabulary-sized term (exactly the term the batch
  *     operator also pays in its `distinct`; a deployment that
  *     already knows its watchlist replaces this aggregate with the
  *     static list and the state drops to the grid alone).
  *
  * The heavy-hitter readout is a pure function of any snapshot of
  * the two ([[Sketches.heavyHittersFrom]] — the batch operator's
  * exact math), so stream == batch holds by construction at every
  * micro-batch boundary; the spec drives prefix equality anyway.
  * A foreachBatch consumer alerts on new heavy tokens mid-ingest
  * instead of at the nightly batch report.
  */
object StreamingHeavyHitters {

  /** One observation: a single token occurrence. */
  case class Tok(token: String)

  /** The running Count-Min counter table as a streaming aggregation
    * — write with Update/Complete mode; state = the lanes × width
    * grid, never the corpus.
    */
  def cmCounts(toks: Dataset[Tok], lanes: Int, width: Int): DataFrame =
    Sketches.countMinFromTokens(
      toks.toDF().select(col("token").as("__t")), lanes, width)

  /** The running candidate vocabulary (distinct tokens + exact
    * counts — the count column doubles as ground truth for accuracy
    * audits).
    */
  def vocab(toks: Dataset[Tok]): DataFrame =
    toks.toDF().groupBy(col("token")).agg(count(lit(1)).as("n"))

  /** Heavy-hitter readout over snapshots of [[cmCounts]] and
    * [[vocab]] — the batch operator's exact math on the streaming
    * state.
    */
  def heavyOf(
      counts: DataFrame,
      candidates: DataFrame,
      lanes: Int,
      width: Int,
      minCount: Long): DataFrame =
    Sketches.heavyHittersFrom(counts, candidates.select("token"),
      lanes, width, minCount)
}
