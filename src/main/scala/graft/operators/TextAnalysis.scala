package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-level text analysis (SURVEY §2B R-21 + north star):
  * term stats, quality features, corpus-trained language-ID.
  */
object TextAnalysis {

  /** Per-block (e.g. language) top-k terms by frequency; deterministic
    * tie-break (count desc, word asc).
    */
  def topTerms(docs: DataFrame, textCol: String, blockCol: String, k: Int): DataFrame = {
    val counts = docs
      .select(col(blockCol).as("blk"),
        explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy(col("blk"), col("word"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("blk")).orderBy(col("cnt").desc, col("word"))
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Quality features per document: token count, average word length,
    * stopword ratio, digit ratio, md5 fingerprint.
    */
  def qualityFeatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String]): DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    docs.select(col(idCol),
      size(toks).as("n_tokens"),
      // mean token length (not a whitespace-arithmetic shortcut, which
      // breaks on multi-space/mixed-case text)
      (aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / greatest(size(toks), lit(1)).cast("double")).as("avg_word_len"),
      TextFns.stopwordRatio(toks, stopwords).as("stopword_ratio"),
      (length(regexp_replace(col(textCol), "[^0-9]", "")).cast("double")
        / length(col(textCol)).cast("double")).as("digit_ratio"),
      TextFns.fingerprint(col(textCol)).as("fingerprint"))
  }

  /** Corpus-trained language ID: build per-language profiles (top
    * `profileSize` terms by frequency), score each document by how
    * many of its distinct tokens hit each profile, pick the
    * highest-scoring language (ties → lexicographically smallest).
    * Returns (doc id, guessed_lang, score).
    *
    * The profile build is a small aggregate (langs × profileSize rows)
    * → broadcast join against the exploded corpus at scale.
    */
  def languageId(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      profileSize: Int): DataFrame = {
    val prof = topTerms(docs, textCol, langCol, profileSize)
      .select(col("blk").as("plang"), col("word"))
    val docTokens = docs
      .select(col(idCol).as("doc"), explode(TextFns.tokens(col(textCol))).as("word"))
      .distinct()
    val scores = docTokens.join(broadcast(prof), "word")
      .groupBy(col("doc"), col("plang"))
      .agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col("doc")).orderBy(col("score").desc, col("plang"))
    scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc"), col("plang").as("guessed_lang"), col("score"))
  }
}
