package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Audit

/** Streaming twin of [[graft.operators.Audit.psiDrift]] (q203): the
  * live distribution-shift monitor. The running state is the
  * (group, bin) COUNT aggregate — grid-sized (groups × nBins)
  * however long the stream runs, maintained by Spark's streaming
  * aggregation with no custom state code — and the PSI readout is a
  * pure function of any snapshot of it, computed by the SAME
  * [[Audit.psiFromCounts]] the batch operator calls. Stream == batch
  * therefore holds by construction at every micro-batch boundary;
  * the spec drives it through prefix equality anyway.
  *
  * Bin assignment is [[Audit.psiBin]] — row-local, so the stream
  * side needs no shuffle before the aggregate's own exchange. A
  * foreachBatch consumer calls [[psiOf]] on the running table and
  * alerts on `drifted` flips mid-ingest, instead of discovering a
  * drifted source at the nightly batch readout.
  */
object StreamingPsi {

  /** One observation: a document's group (source) + numeric feature
    * (e.g. n_chars).
    */
  case class Obs(group: String, value: Long)

  /** The running (group, bin) counts as a streaming aggregation —
    * write with Update/Complete mode; the state is the grid, never
    * the corpus.
    */
  def binCounts(
      obs: Dataset[Obs],
      binWidth: Long,
      nBins: Int): DataFrame =
    obs.toDF()
      .select(col("group").as("__g"),
        Audit.psiBin(col("value"), binWidth, nBins).as("__bin"))
      .groupBy(col("__g"), col("__bin"))
      .agg(count(lit(1)).as("__c"))

  /** PSI readout over a snapshot of [[binCounts]]'s table — the
    * batch operator's exact math on the streaming state.
    */
  def psiOf(
      counts: DataFrame,
      baseline: String,
      nBins: Int): DataFrame =
    Audit.psiFromCounts(counts, baseline, nBins)
      .withColumnRenamed("__g", "group")
}
