package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-portable hashing for the oracle-checked sketch paths
  * (SURVEY §2B R-19). DuckDB has no `xxhash64`, so the gated MinHash /
  * SimHash queries derive their hash bits from `md5` — which Spark and
  * DuckDB compute bit-identically — and do all onward mixing with
  * integer arithmetic both engines evaluate exactly:
  *
  *   - [[md5Long60]]: the first 15 hex chars of `md5(x)` parsed as a
  *     60-bit integer. Spark: `conv(substr(md5(x),1,15),16,10)`;
  *     DuckDB: `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`.
  *   - lane hashes: the classic universal family
  *     `h_i = (a_i * h + b_i) mod p`, `p = 2^31-1`, with `h < p` —
  *     every intermediate stays below 2^62, so no engine overflows
  *     (DuckDB raises on int64 overflow; Spark ANSI mode would too).
  *
  * The fast default paths keep `xxhash64` (one instruction-level hash
  * vs an md5 digest); only the oracle-gated queries pay the md5.
  */
object PortableHash {

  /** 2^31 - 1 (Mersenne prime) — the universal-hash modulus. */
  val P: Long = 2147483647L

  /** splitmix64 — public-domain finalizer, used only at coefficient
    * GENERATION time (driver side, embedded as literals in the oracle
    * SQL), never in per-row engine arithmetic.
    */
  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Per-permutation universal-hash coefficients: `a_i ∈ [1, p-1]`,
    * `b_i ∈ [0, p-1]`, deterministic in `i` — the same arrays are
    * embedded as list literals in the DuckDB oracle SQL.
    */
  def laneCoeffs(k: Int): (Array[Long], Array[Long]) = {
    val a = Array.tabulate(k)(i =>
      1L + java.lang.Long.remainderUnsigned(splitmix64(2L * i), P - 1))
    val b = Array.tabulate(k)(i =>
      java.lang.Long.remainderUnsigned(splitmix64(2L * i + 1), P))
    (a, b)
  }

  /** 60-bit integer from the md5 hex prefix (column form — all
    * codegen'd built-ins).
    */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private val md5Digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** JVM twin of [[md5Long60]] for expressions/aggregators: the first
    * 15 hex chars are bytes 0..6 plus the high nibble of byte 7.
    */
  def md5Long60Jvm(bytes: Array[Byte]): Long = {
    val d = md5Digest.get().digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }
}
