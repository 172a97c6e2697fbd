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

  /** BPE-ish token-count estimate: whitespace words + extra splits on
    * digit/letter boundaries and long words (a word of length L costs
    * ceil(L/6) tokens) — a deterministic, cheap stand-in for a real
    * tokenizer's count.
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

  /** MinHash signature: k permutations simulated as
    * `xxhash64(concat(i, '#', shingle))`, min per permutation.
    * Null entries when the shingle set is empty.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles,
        s => xxhash64(concat(i.cast("string"), lit("#"), s)))))

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
  def simhash64(toks: Column): Column = {
    // shiftleft/shiftright's Scala overloads only take literal shift
    // amounts; call_function reaches the SQL variants that accept a
    // column (the lambda variable j).
    val shr = (h: Column, j: Column) => call_function("shiftright", h, j.cast("int"))
    val shl = (o: Column, j: Column) => call_function("shiftleft", o, j.cast("int"))
    val bitIdx = sequence(lit(0), lit(63))
    val votes = aggregate(
      transform(toks, t => xxhash64(t)),
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, bitIdx,
        (a, j) => a + when((shr(h, j) bitwiseAND lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L))))
    aggregate(
      zip_with(votes, bitIdx,
        (v, j) => when(v >= 0, shl(lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc bitwiseOR x)
  }

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
