package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** U-1/U-2 escape-hatch surface (SURVEY §2B). Everything else in the
  * engine is built from codegen'd `functions._` expressions; these
  * exist for the cases a built-in genuinely can't express — and the
  * suite asserts they agree with the expression-based formulations
  * where both exist.
  */
object Udfs {

  /** U-1: scalar UDF fallback for cosine similarity. Prefer
    * [[VectorFns.cosine]] (codegen); this exists for SQL-text callers
    * (`SELECT cosine_udf(a, b)`) and as the documented escape hatch.
    */
  val cosineUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Register SQL-visible functions on a session. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("cosine_udf", cosineUdf)
    spark.udf.register("sparse_sampler", udaf(SparseSamplerAgg))
  }
}

/** One offset-map observation for the sparse sampler. */
case class OffsetSample(
    tsMillis: Long, srcLedger: Long, srcEntry: Long,
    dstLedger: Long, dstEntry: Long)

/** Aggregator buffer: minute bucket → earliest sample in the bucket.
  * (Product wrapper so Encoders.product derives the map encoder.)
  */
case class SamplerBuf(m: Map[Long, OffsetSample])

/** U-2: typed Aggregator reproducing the reference's sparse offset
  * sampler (A16, `PulsarPartitionSyncWorker.java:236-239`): keep at
  * most one mapping per minute per group — the FIRST one, with
  * (tsMillis, srcLedger, srcEntry) as the deterministic "first" rule
  * (same rule as [[graft.streaming.OffsetIndex.sparseSample]], which
  * the suite cross-checks). Buffer is bounded by the number of active
  * minutes, so the partial aggregate stays small at any scale.
  */
object SparseSamplerAgg extends Aggregator[OffsetSample, SamplerBuf, SamplerOut] {

  private def first(a: OffsetSample, b: OffsetSample): OffsetSample = {
    val ka = (a.tsMillis, a.srcLedger, a.srcEntry)
    val kb = (b.tsMillis, b.srcLedger, b.srcEntry)
    if (Ordering[(Long, Long, Long)].lteq(ka, kb)) a else b
  }

  override def zero: SamplerBuf = SamplerBuf(Map.empty)

  override def reduce(b: SamplerBuf, a: OffsetSample): SamplerBuf = {
    val minute = a.tsMillis / 60000L
    SamplerBuf(b.m.updated(minute, b.m.get(minute).map(first(_, a)).getOrElse(a)))
  }

  override def merge(x: SamplerBuf, y: SamplerBuf): SamplerBuf =
    SamplerBuf((x.m.keySet ++ y.m.keySet).map { k =>
      (x.m.get(k), y.m.get(k)) match {
        case (Some(a), Some(b)) => k -> first(a, b)
        case (Some(a), None) => k -> a
        case (None, Some(b)) => k -> b
        case _ => throw new IllegalStateException("unreachable")
      }
    }.toMap)

  override def finish(b: SamplerBuf): SamplerOut =
    SamplerOut(b.m.toSeq.sortBy(_._1).map(_._2))

  override def bufferEncoder: Encoder[SamplerBuf] = Encoders.product[SamplerBuf]
  override def outputEncoder: Encoder[SamplerOut] = Encoders.product[SamplerOut]
}

/** Output wrapper (Seq needs a product shell for Encoders.product). */
case class SamplerOut(samples: Seq[OffsetSample])
