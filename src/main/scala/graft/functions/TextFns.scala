package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operator surface
  * (SURVEY §2B R-19/R-21): tokenization, shingling, MinHash, SimHash,
  * fingerprinting, quality features. All pure Column expressions —
  * codegen-friendly, no UDFs; hashes are `xxhash64` with deterministic
  * per-permutation salts.
  */
object TextFns {

  /** Whitespace tokenizer (lowercased). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** BPE-ish token-count estimate: a word of length L costs ceil(L/6)
    * tokens — a deterministic, cheap stand-in for a real tokenizer's
    * count (long words cost proportionally more, mirroring subword
    * splitting).
    */
  def tokenCountEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / lit(6.0)).cast("long"))

  /** n-word shingles from a token array; empty array when there are
    * fewer than n tokens (Spark's `sequence(1, 0)` would count DOWN —
    * guarded here; DuckDB's generate_series is empty).
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array())

  /** MinHash signature as a single expression: k permutations
    * simulated as `xxhash64(i, shingle)`, min per permutation. NOTE:
    * nested higher-order functions run interpreted — for whole-table
    * signature computation use the explode-based
    * `graft.operators.Dedup.minhashSignatures` (same hash, ~50x
    * faster); this form is for small/ad-hoc use.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, s))))

  /** Fraction of equal components between two MinHash signatures — the
    * unbiased Jaccard estimate.
    */
  def minhashSimilarity(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") /
      size(sigA).cast("double")

  /** 64-bit SimHash of a token array: per-token xxhash64, each bit
    * votes ±1, sign of the vote sets the output bit.
    */
  /** splitmix64 finalizer — a public-domain 64-bit mixer; gives each
    * token a well-distributed deterministic hash from its UTF-8 bytes.
    */
  private def tokenHash64(t: String): Long = {
    var h = 1125899906842597L
    var i = 0
    val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val simhashUdf = udf { toks: Seq[String] =>
    val votes = new Array[Int](64)
    toks.foreach { t =>
      val h = tokenHash64(t)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) >= 0) out |= (1L << j); j += 1 }
    out
  }

  /** 64-bit SimHash of a token array: per-token hash, each bit votes
    * ±1, sign of the vote sets the output bit. Implemented as a
    * tight-loop UDF — the pure-expression formulation (64-wide
    * zip_with votes) runs interpreted and benched ~10x slower.
    */
  def simhash64(toks: Column): Column = simhashUdf(toks)

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column =
    call_function("bit_count", a bitwiseXOR b)

  /** Document fingerprint: md5 of the lowercased text (portable across
    * engines, unlike xxhash64).
    */
  def fingerprint(text: Column): Column = md5(lower(text))

  /** Stopword ratio over a token array. */
  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column = {
    val isStop = (t: Column) =>
      stopwords.map(t === _).reduce(_ || _)
    size(filter(toks, isStop)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }
}
