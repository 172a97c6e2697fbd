package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator

/** Aggregation buffer: current per-permutation minima. */
case class MinHashBuf(mins: Array[Long])

/** Output wrapper (array column needs a product shell). */
case class MinHashOut(sig: Seq[Long])

/** Single-pass MinHash signature aggregator: folds each shingle's base
  * hash `h0 = xxhash64(shingle)` into all `k` per-permutation minima
  * in one pass — `min_i xxhash64(i, h0)` per permutation, computed
  * with the SAME mixing as the SQL `xxhash64(i, h0)` expression
  * (seed-42 XXH64: `hashLong(h0, hashInt(i, 42))`), so signatures are
  * bit-identical to the round-1 explode-based formulation.
  *
  * Why: the explode form multiplied every (doc, shingle) row by k=32
  * before its first groupBy — ~32x the shuffle-input rows and two
  * shuffles. This aggregator shuffles only the (doc, h0) rows once,
  * with a map-side partial whose buffer is k longs.
  */
class MinHashAgg(k: Int) extends Aggregator[Long, MinHashBuf, MinHashOut] {

  // per-permutation seeds, hashInt(i, 42) — the prefix state of the
  // SQL xxhash64(i, h0) fold; recomputed per executor
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashInt(i, 42L))

  override def zero: MinHashBuf = MinHashBuf(Array.fill(k)(Long.MaxValue))

  override def reduce(b: MinHashBuf, h0: Long): MinHashBuf = {
    val m = b.mins
    var i = 0
    while (i < k) {
      val h = XXH64.hashLong(h0, seeds(i))
      if (h < m(i)) m(i) = h
      i += 1
    }
    b
  }

  override def merge(x: MinHashBuf, y: MinHashBuf): MinHashBuf = {
    val a = x.mins
    val b = y.mins
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    x
  }

  override def finish(b: MinHashBuf): MinHashOut = MinHashOut(b.mins.toSeq)

  override def bufferEncoder: Encoder[MinHashBuf] = Encoders.product[MinHashBuf]
  override def outputEncoder: Encoder[MinHashOut] = Encoders.product[MinHashOut]
}

/** Oracle-portable variant of [[MinHashAgg]]: same single-pass /
  * map-side-partial shape, but the per-permutation hash is the
  * universal family `(a_i * h + b_i) mod p` over a base hash
  * `h = h0 mod p` ([[PortableHash]]) — arithmetic DuckDB reproduces
  * exactly, unlike XXH64's 64-bit overflow mixing. Used only by the
  * oracle-gated q34; the xxhash64 default stays the fast path.
  */
class PortableMinHashAgg(k: Int) extends Aggregator[Long, MinHashBuf, MinHashOut] {

  @transient private lazy val coeffs: (Array[Long], Array[Long]) =
    PortableHash.laneCoeffs(k)

  override def zero: MinHashBuf = MinHashBuf(Array.fill(k)(Long.MaxValue))

  override def reduce(b: MinHashBuf, h0: Long): MinHashBuf = {
    val (as, bs) = coeffs
    val hp = h0 % PortableHash.P // h0 is a 60-bit non-negative value
    val m = b.mins
    var i = 0
    while (i < k) {
      val h = (as(i) * hp + bs(i)) % PortableHash.P
      if (h < m(i)) m(i) = h
      i += 1
    }
    b
  }

  override def merge(x: MinHashBuf, y: MinHashBuf): MinHashBuf = {
    val a = x.mins
    val b = y.mins
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    x
  }

  override def finish(b: MinHashBuf): MinHashOut = MinHashOut(b.mins.toSeq)

  override def bufferEncoder: Encoder[MinHashBuf] = Encoders.product[MinHashBuf]
  override def outputEncoder: Encoder[MinHashOut] = Encoders.product[MinHashOut]
}
