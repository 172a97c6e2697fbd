package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** PII scrub pass (training-data hygiene): replace email addresses
    * and phone-like number runs with redaction tags, and report how
    * many of each were removed. Patterns are deliberately restricted
    * to syntax Java regex and RE2 (DuckDB) interpret identically, so
    * the pass is oracle-checkable; a production deployment extends
    * the pattern list, not the plan shape (one codegen'd
    * regexp_replace chain, row-parallel, no shuffle).
    */
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val phonePattern = "\\+?[0-9][0-9 -]{7,}[0-9]"

  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val noEmail = regexp_replace(col(textCol), emailPattern, "[EMAIL]")
    docs.select(col(idCol),
      regexp_replace(noEmail, phonePattern, "[PHONE]").as("redacted"),
      regexp_count(col(textCol), lit(emailPattern)).as("n_emails"),
      // phones counted AFTER email removal so an address's digits are
      // never double-counted (mirrored in the oracle)
      regexp_count(noEmail, lit(phonePattern)).as("n_phones"))
  }

  /** Within-document duplicate-shingle fraction
    * (1 − |distinct n-grams| / |n-grams|) — the repetition signal of
    * published training-data quality rules (Rae et al.'s Gopher
    * filters): boilerplate and looping generations repeat n-grams.
    * 0 for documents with fewer than n tokens. Row-parallel; the
    * per-row array_distinct is a once-per-row HOF (fine off the
    * codegen path).
    */
  def repetitionRatio(text: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val sh = TextFns.textShingles(text, n)
    val total = size(sh)
    when(total > 0,
      lit(1.0) - size(array_distinct(sh)).cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** [[repetitionRatio]] over a precomputed [[graft.plans
    * .TextStatsExpr]] struct — same arithmetic, zero extra passes.
    */
  private def repetitionFromStats(stats: org.apache.spark.sql.Column) =
    when(stats.getField("total_shingles") > 0,
      lit(1.0) - stats.getField("distinct_shingles").cast("double")
        / stats.getField("total_shingles").cast("double"))
      .otherwise(lit(0.0))

  /** CROSS-document boilerplate fraction (the CCNet/site-template
    * signal [[repetitionRatio]] cannot see): the share of a document's
    * n-gram OCCURRENCES whose n-gram appears in >= minDf distinct
    * documents of the same block (site templates, license headers,
    * navigation chrome repeat across a source's documents, not within
    * one). Per-doc output: (id, block, total, n_boiler, boiler_frac6);
    * frac is 0 for documents with fewer than n tokens, matching
    * [[repetitionRatio]]'s empty-shingle convention.
    *
    * Scale shape: the document-frequency map is one distinct
    * (block, doc, shingle) pass + a hash aggregate, and ONLY the
    * flagged (df >= minDf) shingles — a small fraction of the shingle
    * vocabulary by construction — join back, as a semi-join against
    * the occurrence multiset on (block, shingle). No all-pairs
    * comparison anywhere; everything is shingle-keyed equi-join or
    * aggregate, the same shape as the MinHash band join.
    */
  def boilerplateFraction(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int, minDf: Long): DataFrame = {
    require(n >= 1, s"shingle order must be >= 1, got $n")
    require(minDf >= 2, s"minDf must be >= 2 (df >= 1 is every shingle), got $minDf")
    val occ = docs.select(col(idCol), col(blockCol),
        explode(TextFns.textShingles(col(textCol), n)).as("__sh"))
    val flagged = occ.select(col(blockCol), col(idCol), col("__sh")).distinct()
      .groupBy(col(blockCol), col("__sh"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col(blockCol), col("__sh"))
    val boiler = occ.join(flagged, Seq(blockCol, "__sh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_boiler"))
    docs.select(col(idCol), col(blockCol),
        size(TextFns.textShingles(col(textCol), n)).as("total"))
      .join(boiler, Seq(idCol), "left")
      .select(col(idCol), col(blockCol), col("total"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        when(col("total") > 0,
          floor(coalesce(col("n_boiler"), lit(0L)).cast("double") /
            col("total").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
          .otherwise(lit(0.0)).as("boiler_frac6"))
  }

  /** The published Gopher repetition-signal FAMILY (Rae et al. 2021,
    * Table A1) as per-document character fractions — what
    * [[repetitionRatio]]'s single count ratio summarizes:
    *   - top-{2,3,4}-gram fraction: characters covered by the single
    *     MOST FREQUENT n-gram's occurrences / total token characters
    *     (ties break to the lexicographically smallest gram — a
    *     deterministic convention both engines replay);
    *   - duplicate-{5,10}-gram fraction: characters covered by all
    *     n-grams occurring more than once.
    * Character mass of one occurrence = the gram's token characters
    * (separators excluded); overlapping occurrences each count, per
    * the published definition, so a pathological loop can exceed 1.
    * Documents with fewer than n tokens read 0 for that signal;
    * zero-character documents read 0 everywhere.
    *
    * Scale shape: one explode per gram order, ONE hash aggregate on
    * (doc, n, gram) — within-doc duplicates collapse map-side since a
    * document's rows are partition-local — then doc-sized aggregates
    * and a conditional-sum pivot. No windows, no per-doc O(m²) HOF
    * scans; cost is linear in corpus tokens × the 5 gram orders.
    *
    * Output: (id, total_chars, top2_frac6, top3_frac6, top4_frac6,
    * dup5_frac6, dup10_frac6).
    */
  def gopherRepetitionSignals(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val totals = docs.select(col(idCol),
      coalesce(aggregate(transform(TextFns.tokens(col(textCol)),
          t => length(t).cast("long")), lit(0L), (a, x) => a + x), lit(0L))
        .as("total_chars"))
    val orders = Seq(2, 3, 4, 5, 10)
    val grams = orders.map { n =>
      docs.select(col(idCol), lit(n).as("__n"),
        explode(TextFns.textShingles(col(textCol), n)).as("__g"))
    }.reduce(_ unionByName _)
    val cnt = grams.groupBy(col(idCol), col("__n"), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__chars",
        (length(col("__g")) - (col("__n") - lit(1))).cast("long"))
    // min over (-count, gram) = the most frequent gram, smallest on
    // ties; its char mass is recovered row-locally from the struct
    val per = cnt.groupBy(col(idCol), col("__n"))
      .agg(min(struct((-col("__c")).as("nc"), col("__g").as("g")))
          .as("__top"),
        sum(when(col("__c") > 1, col("__c") * col("__chars")))
          .as("__dup"))
      .select(col(idCol), col("__n"),
        ((-col("__top").getField("nc")) *
          (length(col("__top").getField("g")) - (col("__n") - lit(1)))
            .cast("long")).as("__topmass"),
        coalesce(col("__dup"), lit(0L)).as("__dupmass"))
    def pick(n: Int, c: String) =
      coalesce(sum(when(col("__n") === n, col(c))), lit(0L))
    val wide = per.groupBy(col(idCol)).agg(
      pick(2, "__topmass").as("__t2"), pick(3, "__topmass").as("__t3"),
      pick(4, "__topmass").as("__t4"), pick(5, "__dupmass").as("__d5"),
      pick(10, "__dupmass").as("__d10"))
    def frac(mass: org.apache.spark.sql.Column) =
      when(col("total_chars") > 0,
        floor(mass.cast("double") / col("total_chars").cast("double")
          * lit(1e6) + lit(0.5)) / lit(1e6))
        .otherwise(lit(0.0))
    totals.join(wide, Seq(idCol), "left")
      .select(col(idCol), col("total_chars"),
        frac(coalesce(col("__t2"), lit(0L))).as("top2_frac6"),
        frac(coalesce(col("__t3"), lit(0L))).as("top3_frac6"),
        frac(coalesce(col("__t4"), lit(0L))).as("top4_frac6"),
        frac(coalesce(col("__d5"), lit(0L))).as("dup5_frac6"),
        frac(coalesce(col("__d10"), lit(0L))).as("dup10_frac6"))
  }

  /** Composite quality verdict (Gopher-style): per-signal booleans +
    * the AND. Bounds are constructor-level policy, not magic inside
    * the plan; every signal is exact rational arithmetic both engines
    * reproduce, so the verdict is oracle-checkable.
    */
  def qualityFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String],
      minTokens: Int = 5,
      maxTokens: Int = 10000,
      minAvgWordLen: Double = 2.0,
      maxAvgWordLen: Double = 12.0,
      maxDigitRatio: Double = 0.2,
      maxRepetition: Double = 0.3): DataFrame = {
    // ALL signals in one projection over one scan — every signal is a
    // row-local expression, so there is nothing to join (a self-join
    // on idCol here would shuffle two corpus-sized frames for no
    // semantic gain). The integer inputs come from ONE codegen'd
    // TextStatsExpr pass (the interpreted HOF chains for the same
    // numbers were ~40% of this query's bench cost).
    val feats = docs.select(
      (featureCols(docs, idCol, textCol, stopwords) :+
        repetitionFromStats(
          graft.plans.TextStatsExpr.textStats(docs.sparkSession,
            col(textCol), 3, stopwords)).as("rep_ratio")): _*)
    feats.select(col(idCol),
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens).as("ok_len"),
        (col("avg_word_len") >= minAvgWordLen
          && col("avg_word_len") <= maxAvgWordLen).as("ok_word_len"),
        (col("stopword_ratio") > 0.0).as("ok_stopwords"),
        (col("digit_ratio") < maxDigitRatio).as("ok_digits"),
        (col("rep_ratio") < maxRepetition).as("ok_repetition"))
      .withColumn("keep",
        col("ok_len") && col("ok_word_len") && col("ok_stopwords")
          && col("ok_digits") && col("ok_repetition"))
  }

  /** The shared signal projection of [[qualityFeatures]] and
    * [[qualityFilter]] — row-local expressions only. The token-level
    * integers (count, summed lengths, stopword hits) come from one
    * codegen'd [[graft.plans.TextStatsExpr]] pass; the ratios are the
    * SAME arithmetic the interpreted HOF forms computed
    * (bit-identity asserted in SketchExprSpec), so q31/q58's oracle
    * hashes are unchanged.
    */
  private def featureCols(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String]): Seq[org.apache.spark.sql.Column] = {
    // n = 0: these columns never read the shingle fields, so the
    // stats pass skips building them (qualityFilter's repetition
    // signal evaluates its OWN n=3 stats expression)
    val stats = graft.plans.TextStatsExpr.textStats(docs.sparkSession,
      col(textCol), 0, stopwords)
    val nTok = stats.getField("n_tokens")
    Seq(col(idCol),
      nTok.as("n_tokens"),
      // mean token length (not a whitespace-arithmetic shortcut, which
      // breaks on multi-space/mixed-case text)
      (stats.getField("sum_word_len").cast("double")
        / greatest(nTok, lit(1)).cast("double")).as("avg_word_len"),
      (stats.getField("stopword_cnt").cast("double")
        / greatest(nTok, lit(1)).cast("double")).as("stopword_ratio"),
      (length(regexp_replace(col(textCol), "[^0-9]", "")).cast("double")
        / length(col(textCol)).cast("double")).as("digit_ratio"))
  }

  /** Quality features per document: token count, average word length,
    * stopword ratio, digit ratio, md5 fingerprint.
    */
  def qualityFeatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String]): DataFrame =
    docs.select((featureCols(docs, idCol, textCol, stopwords) :+
      TextFns.fingerprint(col(textCol)).as("fingerprint")): _*)

  /** Per-document TF-IDF keyword extraction: score = tf × ln(N/df),
    * top `k` terms per document (ties → lexicographically smallest
    * word), scores rounded to 6 decimals BEFORE ranking so the order
    * is engine-portable. Shapes: one explode feeding both the
    * (doc, word) tf aggregate and the per-word df aggregate; the df
    * table is vocabulary-sized — the word equi-join is the only
    * corpus-scale shuffle beyond the aggregates.
    */
  /** Winnowing document fingerprints (MOSS, SIGMOD'03): the rolling-
    * hash fingerprinting step of a training-data pipeline — each doc
    * gets the sorted distinct window-minima of its k-gram shingle
    * hashes ([[graft.plans.WinnowExpr]]; md5-derived hashes so the
    * DuckDB oracle reproduces them bit-identically). Two docs sharing
    * a run of >= windowSize+k-1 tokens share a fingerprint, at a
    * stored density of ~2/(windowSize+1) per shingle — the property
    * that makes a corpus-scale containment index tractable where
    * storing every shingle hash is not. One codegen'd row-local scan;
    * no shuffle.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, windowSize: Int): DataFrame =
    docs.select(col(idCol),
      graft.plans.WinnowExpr.winnow(docs.sparkSession,
        graft.functions.TextFns.textShingles(col(textCol), k), windowSize)
        .as("fingerprints"))

  /** Containment/plagiarism candidate pairs from winnowing
    * fingerprints: docs sharing at least `minShared` fingerprints.
    * The join key is the fingerprint hash — an equi-shuffle exactly
    * like the shingle-Jaccard miner, but over the winnowed ~2/(w+1)
    * density instead of every shingle, which is the point: the same
    * pair evidence at a fraction of the exchange traffic. Composes
    * with [[graft.operators.Dedup.stageWith]] as a pair miner.
    *
    * `maxFingerprintDocFreq` drops fingerprints shared by more than
    * that many docs (a boilerplate run every doc contains emits
    * ~df²/2 candidate rows from one hot key — same skew guard as the
    * Jaccard miner's shingle-DF cap; ubiquitous fingerprints carry no
    * containment signal).
    */
  def winnowOverlapPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, windowSize: Int, minShared: Int,
      maxFingerprintDocFreq: Int = 1000): DataFrame = {
    val fp = winnowFingerprints(
        docs.filter(col(idCol).isNotNull), idCol, textCol, k, windowSize)
      .select(col(idCol).as("doc"), explode(col("fingerprints")).as("fp"))
    val hot = fp.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxFingerprintDocFreq)
      .select(col("fp"))
    val surviving = fp.join(hot, Seq("fp"), "left_anti")
    val a = surviving.alias("a")
    val b = surviving.alias("b")
    a.join(b, col("a.fp") === col("b.fp") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Context-window chunking: split each document into token chunks
    * of at most `maxTokens` with `overlap` tokens carried between
    * consecutive chunks — the step that fits documents into a model's
    * context window while preserving boundary context. Chunk k starts
    * at token k*(maxTokens-overlap); the final chunk may be shorter
    * (and, for tails shorter than the overlap, fully contained in the
    * previous chunk — emitted anyway so the mapping doc→chunks is a
    * pure function of (n_tokens, maxTokens, overlap)). Zero-token
    * docs yield no chunks. Row-local explode — embarrassingly
    * parallel, no shuffle.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < maxTokens,
      "need 0 <= overlap < maxTokens")
    val stride = maxTokens - overlap
    docs
      .select(col(idCol), graft.functions.TextFns.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), posexplode(transform(
        sequence(lit(1), size(col("__toks")), lit(stride)),
        s => struct(
          concat_ws(" ", slice(col("__toks"), s, lit(maxTokens))).as("chunk_text"),
          least(lit(maxTokens), size(col("__toks")) - s + 1).as("n_chunk_tokens")))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        col("col.chunk_text").as("chunk_text"),
        col("col.n_chunk_tokens").as("n_chunk_tokens"))
  }

  /** Scan-based sequence packing: documents (in `idCol` order) are
    * assigned to fixed-token-budget packs by their running prefix sum
    * — `pack_id = floor(prefix_before / budget)`, the streaming
    * packing rule (a pack may exceed the budget by at most one
    * document's tail; the trade every scan packer makes to avoid a
    * sequential dependency). Deterministic: prefix sums are exact
    * integer arithmetic independent of partitioning.
    *
    * Scale shape: the prefix sum runs through
    * [[ScaleOps.prefixSumByRange]] — range-partition on the id, ONE
    * per-partition aggregate collected to the driver (numParts longs),
    * then a partition-local cumulative sum plus the partition's
    * offset — not a single-partition global window, which would
    * funnel the corpus through one task at 100 TB. The helper owns
    * the pid-stability persist and releases it before returning.
    */
  def packScan(docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long, numParts: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    ScaleOps.prefixSumByRange(
        docs.select(col(idCol), col(tokenCol)),
        Seq(idCol), col(tokenCol).cast("long"), "__before", numParts)
      .select(col(idCol), col(tokenCol),
        // integral `div`, not double division: a double quotient can
        // misround exactly at a pack boundary once prefix sums exceed
        // 2^53
        expr(s"__before div $budget").as("pack_id"))
  }

  /** Perplexity-style quality scoring: a bigram language model with
    * add-k smoothing, trained on the corpus itself and used to score
    * every document — the CCNet-style "LM filter" stage of a training
    * pipeline (documents whose token sequences the corpus LM finds
    * improbable are boilerplate/garble candidates; the downstream
    * filter thresholds on the per-bigram average).
    *
    *   score(doc) = Σ log2((c(w_{i-1}, w_i) + k) / (c(w_{i-1}) + k·V))
    *
    * over the doc's bigrams, emitted with the per-bigram average;
    * counts are corpus-wide integers, V = unigram vocabulary size, and
    * the result is 6-dp floor-rounded (the q51 tfidf discipline, so
    * the DuckDB oracle reproduces it despite libm differences).
    * Documents with fewer than two tokens have no bigrams and produce
    * no row.
    *
    * Scale shape: one explode for the corpus counts (two hash
    * aggregates), one explode for the doc bigrams, then two
    * equi-joins against the count tables (corpus-sized, shuffled on
    * the bigram/unigram key — broadcast is wrong here: the bigram
    * table grows with the corpus) and a per-doc partial-aggregated
    * sum. The only driver scalar is V.
    */
  def bigramLmScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Double = 0.5): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      TextFns.tokens(col(textCol)).as("l"))
    val pairs = toks
      .filter(size(col("l")) >= 2)
      .select(col("doc"),
        explode(transform(sequence(lit(1), size(col("l")) - 1),
          i => struct(element_at(col("l"), i).as("w1"),
            element_at(col("l"), i + 1).as("w2")))).as("p"))
      .select(col("doc"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = toks.select(explode(col("l")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val v = uni.count() // vocabulary size: one scalar
    val big = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val scored = pairs
      .join(big, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(log2((col("cb") + lit(k)) / (col("cu") + lit(k * v))))
          .as("__raw"))
    scored.select(col("doc"),
      col("n_bigrams"),
      (floor(col("__raw") * lit(1e6) + lit(0.5)) / lit(1e6)).as("logprob"),
      (floor(col("__raw") / col("n_bigrams") * lit(1e6) + lit(0.5)) / lit(1e6))
        .as("avg_logprob"))
  }

  /** Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    * smoothing CCNet-class perplexity filters actually ship, next to
    * [[bigramLmScore]]'s add-k baseline): per seen bigram
    *
    *   P(w2|w1) = (c(w1,w2) − D)/c(w1)
    *            + D · T(w1)/c(w1) · N1+(·,w2)/B
    *
    * with D = 0.75, T(w1) = distinct continuations of w1, N1+(·,w2) =
    * distinct predecessors of w2 (the CONTINUATION count — how many
    * contexts a word completes, the insight that "francisco" is
    * frequent but only ever follows "san"), and B = distinct bigram
    * total. Trained on the corpus it scores, every doc bigram has
    * c ≥ 1, so c − D > 0 and the log is always defined.
    *
    * Scale shape = [[bigramLmScore]]'s: three vocabulary-sized count
    * aggregates (map-side combinable), equi-joined back onto the
    * bigram stream, one per-doc aggregate. The only driver value is
    * the scalar B. All counts are integers; the per-bigram expression
    * is a fixed left-associative IEEE chain the oracle replays, the
    * per-doc sum rounds at 6dp (q81 discipline).
    *
    * Output: (doc, n_bigrams, kn_logprob, avg_kn_logprob).
    */
  def knBigramScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0,1), got $discount")
    val toks = docs.select(col(idCol).as("doc"),
      TextFns.tokens(col(textCol)).as("l"))
    val pairs = toks
      .filter(size(col("l")) >= 2)
      .select(col("doc"),
        explode(transform(sequence(lit(1), size(col("l")) - 1),
          i => struct(element_at(col("l"), i).as("w1"),
            element_at(col("l"), i + 1).as("w2")))).as("p"))
      .select(col("doc"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = toks.select(explode(col("l")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val big = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val t1 = big.groupBy(col("w1")).agg(count(lit(1)).as("t1"))
    val pc = big.groupBy(col("w2")).agg(count(lit(1)).as("pcn"))
    val b = big.count() // scalar: distinct bigram total
    val p = (col("cb") - lit(discount)) / col("cu") +
      lit(discount) * col("t1") / col("cu") *
        (col("pcn").cast("double") / lit(b.toDouble))
    val scored = pairs
      .join(big, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .join(t1, Seq("w1"))
      .join(pc, Seq("w2"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_bigrams"), sum(log2(p)).as("__raw"))
    scored.select(col("doc"),
      col("n_bigrams"),
      (floor(col("__raw") * lit(1e6) + lit(0.5)) / lit(1e6))
        .as("kn_logprob"),
      (floor(col("__raw") / col("n_bigrams") * lit(1e6) + lit(0.5)) / lit(1e6))
        .as("avg_kn_logprob"))
  }

  /** Per-document character-level Shannon entropy — the gibberish /
    * noise signal (low entropy = repetitive filler, high = random
    * byte salad; natural text sits in a band). One codegen'd
    * O(len)-per-row scan through [[graft.plans.CharEntropyExpr]]:
    * no explode, no shuffle, no aggregate — unlike the (doc, char)
    * explode formulation whose shuffle is corpus-text-sized, and 13×
    * the interpreted HOF chain this replaced (5.4 s → 0.42 s at
    * sf0.1; the HOF form was O(distinct × len) per row).
    * Entropy uses the count identity H = log2(n) − Σ c·log2(c) / n
    * over the expression's one-pass stats, 6-dp floor-rounded; empty
    * documents emit 0. Bit-identity of the expression against the
    * HOF/oracle formulation (code-point chars, first-appearance sum
    * order, Math.log arithmetic) is spec-asserted.
    */
  def charEntropy(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val st = graft.plans.CharEntropyExpr.charStats(docs.sparkSession,
      col(textCol))
    val n = col("__st").getField("n_chars").cast("double")
    val s = col("__st").getField("s")
    val h = when(n > 0, log2(n) - s / n).otherwise(lit(0.0))
    docs.select(col(idCol).as("doc"), st.as("__st"))
      .select(col("doc"),
        col("__st").getField("n_chars").as("n_chars"),
        col("__st").getField("n_distinct").as("n_distinct_chars"),
        (floor(h * lit(1e6) + lit(0.5)) / lit(1e6)).as("entropy"))
  }

  /** Per-source token-distribution drift: KL(source ‖ corpus) in bits
    * over unigram distributions — the data-card monitoring number
    * that flags a source whose language diverges from the corpus mix
    * (a drifted crawler, a mislabeled dump). No smoothing is needed:
    * every source token occurs in the global distribution by
    * construction, so q > 0 wherever p > 0.
    *
    * Scale shape: one explode, a (group, token) hash aggregate
    * (map-side combined), the global-token marginal derived FROM that
    * aggregate (vocabulary-sized, not a second corpus pass), one
    * token equi-join, and a per-group sum. Group totals join back on
    * the group key (catalog-sized). 6-dp floor-rounded (q51/q81
    * discipline).
    */
  def sourceDivergence(
      docs: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val pairs = docs.select(col(groupCol).as("grp"),
      explode(TextFns.tokens(col(textCol))).as("token"))
    val cst = pairs.groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // feeds three aggregates below
    val totals = cst.groupBy(col("grp")).agg(sum(col("c")).as("t"))
    val global = cst.groupBy(col("token")).agg(sum(col("c")).as("cg"))
    val grand = cst.agg(sum(col("c"))).collect()(0).getLong(0)
    val p = col("c").cast("double") / col("t")
    val q = col("cg").cast("double") / lit(grand.toDouble)
    cst.join(global, Seq("token"))
      .join(totals, Seq("grp"))
      .groupBy(col("grp"))
      .agg(sum(p * log2(p / q)).as("__kl"), first(col("t")).as("__t"))
      .select(col("grp"), col("__t").as("n_tokens"),
        (floor(col("__kl") * lit(1e6) + lit(0.5)) / lit(1e6)).as("kl"))
  }

  def tfidfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val n = docs.count() // corpus size: one scalar, computed once
    val t = docs.select(col(idCol).as("doc"),
      explode(TextFns.tokens(col(textCol))).as("word"))
    val tf = t.groupBy(col("doc"), col("word")).agg(count(lit(1)).as("tf"))
    val df = t.groupBy(col("word"))
      .agg(countDistinct(col("doc")).as("df"))
    val score6 = {
      val raw = col("tf") * log(lit(n) * lit(1.0) / col("df"))
      floor(raw * lit(1e6) + lit(0.5)) / lit(1e6)
    }
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("score").desc, col("word"))
    tf.join(df, "word")
      .select(col("doc"), col("word"), score6.as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc"), col("rn"), col("word"), col("score"))
  }

  /** Sparse TF-IDF document-to-document top-k similarity — the
    * INVERTED-INDEX retrieval path next to the dense ANN family
    * (q36–q38/q98) and the literal-query BM25 (q115): "find the k
    * most similar documents to each probe document" over tf·idf
    * weighted cosine, candidates generated by the shared-term
    * equi-join, never an all-pairs product.
    *
    * DF cap: terms held by more than `dfCap` documents are dropped
    * from the vector space entirely (weights AND norms — the space
    * stays consistent) — the hot-shingle discipline
    * ([[Dedup.ngramJaccardPairs]]): a stop-word-grade term would
    * contribute candidate fanout quadratic in its df while carrying
    * near-zero idf weight. With the cap, per-term join fanout is
    * ≤ dfCap·|probes ∩ term|.
    *
    * Scale shape: tf/df are map-side-combined aggregates; the probe
    * side's weight rows BROADCAST into the term join (probes are a
    * query set, not a corpus); the (probe, cand) partial dot products
    * partial-aggregate before their shuffle. idf = ln(N/df) follows
    * the q51 convention; cosines round at 6dp before ranking.
    *
    * Output: (probe_id, rnk, neighbor_id, cos) — probes = rows
    * matching `probePred` (a predicate over the `doc` id column);
    * candidates are all other documents.
    */
  def sparseTfIdfTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      probePred: org.apache.spark.sql.Column,
      k: Int,
      dfCap: Long,
      termN: Int = 1): DataFrame = {
    require(k >= 1 && dfCap >= 1 && termN >= 1, "bad sparse-knn params")
    val n = docs.count()
    // termN > 1 swaps unigram terms for word n-grams — the selective
    // choice when the unigram vocabulary is tiny/hot (the fixture has
    // 31 words at df >= 25; its 2-gram space has 900+ terms)
    val termExpr =
      if (termN == 1) TextFns.tokens(col(textCol))
      else TextFns.textShingles(col(textCol), termN)
    val t = docs.select(col(idCol).as("doc"),
      explode(termExpr).as("word"))
    val tf = t.groupBy(col("doc"), col("word")).agg(count(lit(1)).as("tf"))
    val df = t.groupBy(col("word"))
      .agg(countDistinct(col("doc")).as("df"))
      .filter(col("df") <= dfCap)
    val w = tf.join(df, "word")
      .select(col("doc"), col("word"),
        (col("tf") * log(lit(n) * lit(1.0) / col("df"))).as("w"))
    val nrm = w.groupBy(col("doc"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nr"))
    val pw = broadcast(w.filter(probePred)
      .select(col("doc").as("probe_id"), col("word"), col("w").as("wp")))
    val cand = w.filter(!probePred)
      .select(col("doc").as("neighbor_id"), col("word"), col("w").as("wc"))
    val dots = cand.join(pw, "word")
      .groupBy(col("probe_id"), col("neighbor_id"))
      .agg(sum(col("wp") * col("wc")).as("dp"))
    val cos = dots
      .join(nrm.select(col("doc").as("probe_id"), col("nr").as("np")), "probe_id")
      .join(nrm.select(col("doc").as("neighbor_id"), col("nr").as("nc")),
        "neighbor_id")
      .select(col("probe_id"), col("neighbor_id"),
        (floor(col("dp") / (col("np") * col("nc")) * lit(1e6) + lit(0.5))
          / lit(1e6)).as("cos"))
    Similarity.ranked(cos, k)
  }

  /** Corpus-trained language ID: build per-language profiles (top
    * `profileSize` terms by frequency), score each document by how
    * many of its distinct tokens hit each profile, pick the
    * highest-scoring language (ties → lexicographically smallest).
    * Returns (doc id, guessed_lang, score); documents hitting no
    * profile at all emit no row.
    *
    * Scale shape: the profile is tiny (langs × profileSize rows), so
    * it is collected and shipped back as array LITERALS — scoring is
    * then ONE codegen'd scan of `docs` (`array_intersect` per
    * language + a greatest/argmax), with no second explode, no
    * (doc, word) distinct shuffle, and no join. Round 1 exploded the
    * corpus twice and shuffled the distinct doc-token pairs; at 100 TB
    * that second explode+shuffle dwarfed the profile build this reuses.
    */
  def languageId(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      profileSize: Int): DataFrame = {
    val profiles: Seq[(String, Seq[String])] =
      topTerms(docs, textCol, langCol, profileSize)
        .select(col("blk"), col("word")).collect()
        .groupBy(_.getString(0))
        .map { case (l, rows) => (l, rows.map(_.getString(1)).toSeq.sorted) }
        .toSeq.sortBy(_._1)
    require(profiles.nonEmpty, "languageId needs at least one language profile")
    val toksDistinct = array_distinct(TextFns.tokens(col(textCol)))
    // score columns are named by INDEX, never by the language value —
    // a lang like "pt.br" or a case-colliding "en"/"EN" pair must stay
    // data, not column syntax
    val scoreCols = profiles.zipWithIndex.map { case ((_, words), i) =>
      size(array_intersect(toksDistinct, typedlit(words))).as(s"__s_$i")
    }
    val scoreRefs = profiles.indices.map(i => col(s"__s_$i"))
    val maxScore =
      if (scoreRefs.size == 1) scoreRefs.head else greatest(scoreRefs: _*)
    // ties resolve to the lexicographically smallest language because
    // `profiles` is sorted and coalesce picks the first hit
    val best = coalesce(profiles.zipWithIndex.map { case ((l, _), i) =>
      when(col(s"__s_$i") === col("__max"), lit(l))
    }: _*)
    docs.select(col(idCol).as("doc") +: scoreCols: _*)
      .withColumn("__max", maxScore)
      .filter(col("__max") > 0)
      .select(col("doc"), best.as("guessed_lang"),
        col("__max").cast("long").as("score"))
  }

  /** BM25 retrieval scoring (q115; Robertson-Spärck Jones, the Lucene
    * `k1=1.2, b=0.75` parameterization with the `+1` idf floor) — the
    * sparse-retrieval pass next to the dense ANN family: score every
    * document against a literal query-token set and return the top-k.
    *
    * Constants are written as the LITERALS 1.2 / 0.75 / 0.25 / 2.2
    * (never `k1 + 1` arithmetic: `1.2 + 1.0` in double is not the
    * same bit pattern as parsing `2.2`, and the oracle parses). The
    * per-(doc, term) contribution is one fixed-order IEEE chain both
    * engines run verbatim; `ln` follows the q51/q85 precedent (libm
    * agreement at 6-dp rounding).
    *
    * Scale shape: one doc-keyed length aggregate, one (doc, term)
    * aggregate FILTERED to the query tokens before the shuffle (the
    * shuffled frame is |docs containing a query token| × |query|, not
    * the corpus token stream), a broadcast-sized df frame, scalar
    * (N, avgdl) literals, and a TakeOrdered top-k.
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTokens: Seq[String],
      topK: Int): DataFrame = {
    require(queryTokens.nonEmpty, "bm25 needs at least one query token")
    val toks = docs.select(col(idCol).as("__doc"),
      explode(TextFns.tokens(col(textCol))).as("w"))
    val dls = toks.groupBy(col("__doc")).agg(count(lit(1)).as("dl"))
      .localCheckpoint(true)
    val n = docs.count()
    val mm = dls.agg(sum(col("dl")), count(lit(1))).collect()(0)
    require(!mm.isNullAt(0) && mm.getLong(1) > 0,
      "bm25 needs at least one document with a non-empty token stream")
    val avgdl = mm.getLong(0).toDouble * 1.0 / mm.getLong(1).toDouble
    val tf = toks.filter(col("w").isin(queryTokens: _*))
      .groupBy(col("__doc"), col("w")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val term = log((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
        + lit(1.0)) *
      ((col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) *
          (lit(0.25) + lit(0.75) * (col("dl") / lit(avgdl)))))
    tf.join(broadcast(df), "w")
      .join(dls, "__doc")
      .select(col("__doc"), term.as("t"))
      .groupBy(col("__doc"))
      .agg((floor(sum(col("t")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("score"))
      .select(col("__doc").as(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Per-term BM25 ranked lists: the multi-QUERY evaluation shape of
    * [[bm25]] — each query token becomes its own ranked top-k list in
    * ONE corpus pass (shared dls/df aggregates, one per-query window
    * whose partial top-k runs pre-shuffle as WindowGroupLimit),
    * where calling [[bm25]] per query would re-scan the corpus per
    * term. Scores carry the single-term BM25 value, 6dp-snapped with
    * the q115 literal discipline.
    *
    * Output: (query, idCol, score, rank) with rank 1..topK per
    * query; callers order.
    */
  def bm25PerTerm(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTokens: Seq[String],
      topK: Int): DataFrame = {
    require(queryTokens.nonEmpty, "bm25PerTerm needs at least one query token")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("__doc"),
      explode(TextFns.tokens(col(textCol))).as("w"))
    val dls = toks.groupBy(col("__doc")).agg(count(lit(1)).as("dl"))
      .localCheckpoint(true)
    val n = docs.count()
    val mm = dls.agg(sum(col("dl")), count(lit(1))).collect()(0)
    require(!mm.isNullAt(0) && mm.getLong(1) > 0,
      "bm25PerTerm needs at least one document with a non-empty token stream")
    val avgdl = mm.getLong(0).toDouble * 1.0 / mm.getLong(1).toDouble
    val tf = toks.filter(col("w").isin(queryTokens: _*))
      .groupBy(col("__doc"), col("w")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val term = log((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
        + lit(1.0)) *
      ((col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) *
          (lit(0.25) + lit(0.75) * (col("dl") / lit(avgdl)))))
    val scored = tf.join(broadcast(df), "w")
      .join(dls, "__doc")
      .select(col("w").as("query"), col("__doc"),
        (floor(term * lit(1e6) + lit(0.5)) / lit(1e6)).as("score"))
    val wnd = Window.partitionBy(col("query"))
      .orderBy(col("score").desc, col("__doc"))
    scored.withColumn("rank", row_number().over(wnd))
      .filter(col("rank") <= topK)
      .select(col("query"), col("__doc").as(idCol), col("score"),
        col("rank"))
  }

  /** PMI collocation mining (q107): the top-k adjacent word pairs by
    * pointwise-mutual-information LIFT, `p(w1 w2) / (p(w1) p(w2))` —
    * the corpus-analysis pass behind multi-word-token vocabulary
    * building and tokenizer merge auditing. The lift is PMI without
    * the log (log is monotone, so the ranking is identical) — kept
    * log-free because `ln` is a libm call whose last-ulp behavior the
    * DuckDB oracle need not share, while this fixed-order chain of
    * IEEE mul/div is bit-identical on both engines:
    * `((((c12 / T) * U) / c1) * U) / c2`.
    *
    * Scale shape: one token-level and one bigram-level hash aggregate
    * over the corpus (map-side partials do the heavy lifting), then
    * two vocabulary-sized equi-joins and a broadcast of the two
    * scalar totals; the final top-k is a TakeOrdered, never a
    * single-task global window.
    */
  def pmiCollocations(
      docs: DataFrame,
      textCol: String,
      minCount: Long,
      topK: Int): DataFrame = {
    val uni = docs
      .select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
    val bi = docs
      .select(explode(TextFns.textShingles(col(textCol), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val totals = broadcast(
      uni.agg(sum(col("c")).as("u_total"))
        .crossJoin(bi.agg(sum(col("c12")).as("t_total"))))
    val w1c = uni.select(col("word").as("w1"), col("c").as("c1"))
    val w2c = uni.select(col("word").as("w2"), col("c").as("c2"))
    bi.filter(col("c12") >= minCount)
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(w1c, "w1").join(w2c, "w2")
      .crossJoin(totals)
      .withColumn("lift", {
        val s = math.pow(10, 6)
        val raw = col("c12").cast("double") / col("t_total") *
          col("u_total") / col("c1") * col("u_total") / col("c2")
        floor(raw * lit(s) + lit(0.5)) / lit(s)
      })
      .select(col("w1"), col("w2"), col("c12"), col("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** N-gram novelty against a reference corpus: per document, the
    * fraction of its DISTINCT word n-grams absent from the
    * reference's n-gram set — the standard memorization/contamination
    * complement to the q64/q97 decontamination family (novelty ~ 0
    * means the doc is assembled from reference text; ~1 means unseen
    * content). Documents with fewer than n tokens produce no row
    * (no grams — the q128 zero-token convention).
    *
    * Scale shape: the reference set is a DISTINCT gram frame (gram-
    * vocab-sized, one combinable aggregate); membership is one
    * gram-keyed equi-join; per-doc stats are one aggregate. Nothing
    * is all-pairs and the reference never re-scans per doc.
    */
  def noveltyScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      reference: DataFrame,
      refTextCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    def grams(c: Column) = TextFns.wordShingles(TextFns.tokens(c), n)
    val refSet = reference
      .select(explode(grams(col(refTextCol))).as("g"))
      .distinct()
      .withColumn("__seen", lit(1))
    docs
      .select(col(idCol), explode(grams(col(textCol))).as("g"))
      .distinct()
      .join(refSet, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty6",
        floor(col("n_novel").cast("double") / col("n_grams") * lit(1e6) +
          lit(0.5)) / lit(1e6))
  }

  /** Hashing-trick bag-of-words featurization (Weinberger et al.
    * 2009): token → bucket = portable-md5(token) mod `dim`, per-doc
    * bucket counts as a sparse vector ("b:c" csv, bucket-ordered) —
    * the fixed-dimension text featurizer that needs NO vocabulary
    * pass (the property that matters at 100 TB: no vocab table to
    * build, broadcast, or keep consistent across runs; collisions are
    * the accepted trade, bounded by dim).
    *
    * One doc-keyed aggregate chain: explode → (doc, bucket) count →
    * per-doc sorted assembly. The md5 bucket is the q97/q103
    * oracle-portable hash family, so the oracle replays the exact
    * bits.
    */
  def featureHash(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int): DataFrame = {
    require(dim >= 2, "dim must be >= 2")
    docs
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("__w"))
      .select(col(idCol),
        (graft.functions.PortableHash.md5Long60(col("__w")) % lit(dim.toLong))
          .as("__b"))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("nnz"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("__b"), col("__c")))),
          x => concat(x.getField("__b").cast("string"), lit(":"),
            x.getField("__c").cast("string")))).as("vec_csv"))
  }

  /** Exact phrase search over the positional token index — the
    * anchor-alignment formulation: an occurrence of phrase word i at
    * token position p votes for anchor p − i, and a document position
    * matches the phrase iff ALL k phrase words vote for the same
    * anchor (equal anchors ⇒ consecutive positions, by
    * construction). Output: (idCol, n_matches) for documents with at
    * least one match.
    *
    * Scale shape: the positional index is filtered to the k phrase
    * words BEFORE anything shuffles (the q115 pre-exchange filter
    * discipline — at 100 TB that is the difference between shuffling
    * the corpus's positions and shuffling only the phrase words'
    * occurrences), the phrase table broadcasts, and matching is ONE
    * (doc, anchor) aggregate — no k−1 positional self-joins.
    * Duplicate words in the phrase are handled by the distinct-i
    * count (an occurrence votes once per phrase slot its word fills).
    */
  def phraseSearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val spark = docs.sparkSession
    import spark.implicits._
    val k = phrase.length
    val ptab = phrase.zipWithIndex.toDF("__w", "__i")
    docs
      .select(col(idCol),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("__pos", "__w")))
      .where(col("__w").isin(phrase.distinct: _*))
      .join(broadcast(ptab), Seq("__w"))
      .groupBy(col(idCol), (col("__pos") - col("__i")).as("__anchor"))
      .agg(count_distinct(col("__i")).as("__hits"))
      .where(col("__hits") === k)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Zipf-law fit over the corpus token-frequency distribution: OLS
    * of ln(freq) on ln(rank) across the `topK` most frequent tokens
    * (rank ties broken by token text — a total order, so the ranking
    * is deterministic). A healthy natural-language corpus reads a
    * slope near −1 (Zipf 1949); a much flatter or steeper slope is
    * the corpus-health smell (template/boilerplate floods, truncated
    * vocabularies) this audit exists to catch.
    *
    * Float discipline: both logs are snapped to integer MICRO-UNITS
    * (`⌊ln(·)·1e6 + 0.5⌋`) before any cross-row sum, so all five OLS
    * moments are exact int64 sums (order-independent; topK ≤ ~1e4
    * keeps every moment far inside int64) and the slope/intercept/R²
    * divisions are row-local double arithmetic on exact integers,
    * 6dp-rounded.
    *
    * Scale shape: one corpus token aggregate (map-side combined) →
    * one global top-K (TakeOrderedAndProject — K rows cross the
    * wire, never the vocabulary) → a K-row bounded-frame rank window
    * (the Tokenize.scala:121 vocab-rank precedent) → one K-row
    * aggregate.
    *
    * Output: ONE row (n_terms, slope6, intercept6, r2_6) — intercept
    * in ln-frequency units; R² NULL if either log column is constant
    * (degenerate K=1 or all-equal frequencies).
    */
  def zipfFit(
      docs: DataFrame,
      textCol: String,
      topK: Int = 256): DataFrame = {
    require(topK >= 2, "zipfFit needs topK >= 2")
    val freq = docs
      .select(explode(TextFns.tokens(col(textCol))).as("__token"))
      .groupBy(col("__token")).agg(count(lit(1)).as("__freq"))
      .orderBy(col("__freq").desc, col("__token"))
      .limit(topK)
    val w = Window.orderBy(col("__freq").desc, col("__token"))
    val m = freq
      .withColumn("__r", row_number().over(w))
      .select(
        floor(log(col("__r").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("__lr"),
        floor(log(col("__freq").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("__lf"))
    val s = m.agg(count(lit(1)).as("__k"),
      sum(col("__lr")).as("__sl"), sum(col("__lf")).as("__sf"),
      sum(col("__lr") * col("__lr")).as("__sll"),
      sum(col("__lr") * col("__lf")).as("__slf"),
      sum(col("__lf") * col("__lf")).as("__sff"))
    def pr6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val kd = col("__k").cast("double")
    val sl = col("__sl").cast("double")
    val sf = col("__sf").cast("double")
    val varL = kd * col("__sll").cast("double") - sl * sl
    val varF = kd * col("__sff").cast("double") - sf * sf
    val cov = kd * col("__slf").cast("double") - sl * sf
    val slopeRaw = cov / varL
    s.select(col("__k").as("n_terms"),
      pr6(slopeRaw).as("slope6"),
      pr6((sf - slopeRaw * sl) / kd / lit(1e6)).as("intercept6"),
      when(varL > 0 && varF > 0, pr6(cov * cov / (varL * varF)))
        .otherwise(lit(null).cast("double")).as("r2_6"))
  }

  /** Hill tail-index estimate over the top-k order statistics of a
    * positive size column (Hill 1975):
    *
    *   γ̂ = (1/k) Σ_{i=1..k} (ln x₍ᵢ₎ − ln x₍ₖ₊₁₎),   α̂ = 1/γ̂
    *
    * — does the document-length (or group-size) distribution have a
    * power-law tail, and how heavy: α̂ ≤ 2 means infinite variance,
    * the regime where mean-based capacity planning (chunk budgets,
    * packing bins) silently lies. The quantitative companion to the
    * [[zipfFit]]/Gini shape audits.
    *
    * Float discipline: each ln snaps to integer micro-units before
    * the sum (k+1-row frame, exact int64), γ̂/α̂ are one-row double
    * chains. The top-(k+1) is a global TakeOrderedAndProject under
    * the (x desc, tie) total order — k+1 rows cross the wire.
    *
    * Output: ONE row (k, x_kplus1, gamma6, alpha6); alpha NULL when
    * γ̂ = 0 (top-k all equal — no tail to measure).
    */
  def hillTailIndex(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"hill needs k >= 2, got $k")
    val top = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(col(valueCol).cast("long").as("__x"), col(tieCol).as("__t"))
      .orderBy(col("__x").desc, col("__t"))
      .limit(k + 1)
    val w = Window.orderBy(col("__x").desc, col("__t"))
    val ranked = top.withColumn("__rn", row_number().over(w))
    val kp1 = ranked.filter(col("__rn") === k + 1)
      .select(col("__x").as("__xmin"))
    val s = ranked.filter(col("__rn") <= k)
      .crossJoin(broadcast(kp1))
      .select(floor((log(col("__x").cast("double")) -
        log(col("__xmin").cast("double"))) * lit(1e6) + lit(0.5))
        .cast("long").as("__lm"), col("__xmin"))
      .groupBy(col("__xmin"))
      .agg(count(lit(1)).as("__k"), sum(col("__lm")).as("__sl"))
    def pr6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val gamma = col("__sl").cast("double") / col("__k").cast("double") /
      lit(1e6)
    s.select(col("__k").as("k"), col("__xmin").as("x_kplus1"),
      pr6(gamma).as("gamma6"),
      when(col("__sl") > 0, pr6(lit(1e0) / gamma))
        .otherwise(lit(null).cast("double")).as("alpha6"))
  }

  /** Heaps'-law fit of vocabulary growth: V(N) ≈ k·N^β over corpus
    * PREFIXES — the companion of the Zipf fit (q187) that answers
    * the planning question "how much NEW vocabulary does the next
    * 10× of corpus buy" (β ≈ 0.5 for natural text; β near 1 flags
    * id-like token pollution, β near 0 a saturated/templated
    * corpus).
    *
    * Prefixes are deterministic doc_id-order checkpoints at
    * i/`checkpoints` of the corpus (ranks from ONE range-partitioned
    * prefix sum; thresholds in integer ceil arithmetic). V_i counts
    * tokens whose FIRST-occurrence rank falls inside prefix i — one
    * token-grain aggregate, no per-checkpoint corpus pass; N_i sums
    * per-doc token counts the same way. The log-log OLS runs over
    * `checkpoints` points whose ln terms nano-snap before the
    * 4-moment sums, so the fit is partition-order free.
    *
    * Output per checkpoint: (chk, n_docs_prefix, n_tokens, vocab,
    * beta6, logk6 — the fit repeated on every row; NULL when the
    * x-variance is 0, i.e. degenerate equal-N checkpoints).
    */
  def heapsLaw(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      checkpoints: Int = 10): DataFrame = {
    require(checkpoints >= 2, "need at least 2 checkpoints")
    val spark = docs.sparkSession
    val ids = docs.select(col(idCol).as("__id"))
    val ranked = ScaleOps.prefixSumByRange(ids, Seq("__id"), lit(1L),
      "__rk") // 0-based doc rank in id order
    val nDocs = ids.agg(count(lit(1)).as("__nd"))
    val cps = spark.range(1, checkpoints + 1L)
      .select(col("id").cast("long").as("chk"))
      .crossJoin(broadcast(nDocs))
      .select(col("chk"),
        floor((col("__nd") * col("chk") + lit(checkpoints - 1L)) /
          lit(checkpoints.toLong)).cast("long").as("__thr"))
      .localCheckpoint(true) // checkpoint-count-sized, reused 3×
    val toks = docs
      .select(col(idCol).as("__id"),
        explode(TextFns.tokens(col(textCol))).as("__tok"))
      .join(ranked, Seq("__id"))
    val docCnt = toks.groupBy(col("__rk")).agg(count(lit(1)).as("__c"))
    val nAt = docCnt.crossJoin(broadcast(cps))
      .filter(col("__rk") < col("__thr"))
      .groupBy(col("chk"))
      .agg(sum(col("__c")).as("n_tokens"), max(col("__thr"))
        .as("n_docs_prefix"))
    val firstAt = toks.groupBy(col("__tok")).agg(min(col("__rk"))
        .as("__fr"))
      .crossJoin(broadcast(cps))
      .filter(col("__fr") < col("__thr"))
      .groupBy(col("chk")).agg(count(lit(1)).as("vocab"))
    val pts = nAt.join(firstAt, Seq("chk"))
      .localCheckpoint(true) // checkpoint-sized; feeds fit + output
    def nano(c: Column): Column =
      floor(c * lit(1e9) + lit(0.5)).cast("long")
    val x = log(col("n_tokens").cast("double"))
    val y = log(col("vocab").cast("double"))
    val fit = pts.select(nano(x).as("__x9"), nano(y).as("__y9"),
        nano(x * y).as("__xy9"), nano(x * x).as("__xx9"))
      .agg(count(lit(1)).as("__k"), sum(col("__x9")).as("__sx9"),
        sum(col("__y9")).as("__sy9"), sum(col("__xy9")).as("__sxy9"),
        sum(col("__xx9")).as("__sxx9"))
    val kD = col("__k").cast("double")
    val sx = col("__sx9").cast("double") / lit(1e9)
    val sy = col("__sy9").cast("double") / lit(1e9)
    val sxy = col("__sxy9").cast("double") / lit(1e9)
    val sxx = col("__sxx9").cast("double") / lit(1e9)
    val den = sxx - sx * sx / kD
    val beta = (sxy - sx * sy / kD) / den
    val logk = sy / kD - beta * (sx / kD)
    def pr6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val fitted = fit.select(
      when(den > 0, pr6(beta)).otherwise(lit(null).cast("double"))
        .as("beta6"),
      when(den > 0, pr6(logk)).otherwise(lit(null).cast("double"))
        .as("logk6"))
    pts.crossJoin(broadcast(fitted))
      .select(col("chk"), col("n_docs_prefix"), col("n_tokens"),
        col("vocab"), col("beta6"), col("logk6"))
  }

  /** Pairwise Jensen–Shannon divergence between the unigram
    * distributions of every group PAIR — the symmetric, bounded
    * ([0, ln 2] nats) companion of [[sourceDivergence]]'s
    * KL(source ‖ corpus): "which two sources are interchangeable
    * and which pair is a different language entirely", the full
    * drift MATRIX a mixture designer reads before merging sources.
    *
    * The distribution support is the TOP-`profileK` global tokens
    * (distributed top-k — `TakeOrderedAndProject`, never a
    * vocab-wide window; ties close deterministically on
    * (count desc, token)) plus ONE rest-bucket carrying all other
    * mass, so the pair grid is bounded at G²·(K+1) whatever the
    * corpus vocabulary does — the profile is the scale knob, and
    * a fatter corpus only sharpens the same K-token profile.
    *
    * Determinism: bucket counts are exact integers over the
    * zero-filled group×bucket grid; each bucket's JSD term
    * ½·[p·ln(2p/(p+q)) + q·ln(2q/(p+q))] (0 where the numerator
    * mass is 0) nano-snaps to integer 1e-9 units before the
    * per-pair sum.
    *
    * Scale shape: one explode + (group, token) hash aggregate
    * (map-side combined), a broadcast profile join to bucket the
    * tail, then grid-sized arithmetic: the G×(K+1) frame self-joins
    * on bucket into G(G−1)/2 · (K+1) rows.
    *
    * Output per pair (groupCol asc): (group_a, group_b, n_tokens_a,
    * n_tokens_b, jsd6), ordered.
    */
  def jsdProfilePairs(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      profileK: Int): DataFrame = {
    require(profileK >= 1, "profileK must be >= 1")
    val rest = " __rest__"
    val cst = docs
      .select(col(groupCol).as("__g"),
        explode(TextFns.tokens(col(textCol))).as("__tok"))
      .groupBy(col("__g"), col("__tok")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // feeds profile + buckets below
    val profile = cst.groupBy(col("__tok")).agg(sum(col("__c")).as("__cg"))
      .orderBy(col("__cg").desc, col("__tok"))
      .limit(profileK) // distributed top-k, not a vocab window
      .select(col("__tok"), lit(true).as("__in_profile"))
    val bucketed = cst
      .join(broadcast(profile), Seq("__tok"), "left")
      .select(col("__g"),
        when(col("__in_profile"), col("__tok")).otherwise(lit(rest))
          .as("__b"),
        col("__c"))
      .groupBy(col("__g"), col("__b")).agg(sum(col("__c")).as("__c"))
    val buckets = profile.select(col("__tok").as("__b"))
      .unionByName(
        profile.sparkSession.range(1).select(lit(rest).as("__b")))
    val grid = bucketed.select(col("__g")).distinct()
      .crossJoin(broadcast(buckets))
      .join(bucketed, Seq("__g", "__b"), "left")
      .select(col("__g"), col("__b"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val totals = grid.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    val withP = grid.join(totals, Seq("__g"))
      .select(col("__g"), col("__b"), col("__n"),
        (col("__c").cast("double") / col("__n").cast("double")).as("__p"))
      .localCheckpoint(true) // both sides of the pair self-join
    val a = withP.select(col("__g").as("group_a"), col("__b"),
      col("__n").as("n_tokens_a"), col("__p").as("__pa"))
    val b = withP.select(col("__g").as("group_b"), col("__b"),
      col("__n").as("n_tokens_b"), col("__p").as("__pb"))
    val half = lit(0.5)
    val termA = when(col("__pa") > 0,
      half * col("__pa") *
        log(lit(2.0) * col("__pa") / (col("__pa") + col("__pb"))))
      .otherwise(lit(0.0))
    val termB = when(col("__pb") > 0,
      half * col("__pb") *
        log(lit(2.0) * col("__pb") / (col("__pa") + col("__pb"))))
      .otherwise(lit(0.0))
    a.join(b, Seq("__b"))
      .filter(col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        col("n_tokens_a"), col("n_tokens_b"),
        floor((termA + termB) * lit(1e9) + lit(0.5)).cast("long")
          .as("__t9"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(max(col("n_tokens_a")).as("n_tokens_a"),
        max(col("n_tokens_b")).as("n_tokens_b"),
        sum(col("__t9")).as("__s9"))
      .select(col("group_a"), col("group_b"),
        col("n_tokens_a"), col("n_tokens_b"),
        (floor(col("__s9").cast("double") / lit(1e9) * lit(1e6) + lit(0.5))
          / lit(1e6)).as("jsd6"))
  }

  /** Good–Turing frequency-of-frequencies readout (Good 1953) — the
    * vocabulary-mass companion to Heaps' law (q220) and the Zipf fit
    * (q187): N_c = number of DISTINCT terms seen exactly c times,
    * the unseen-mass estimate P₀ = N₁/N (the probability the NEXT
    * token is a never-seen term — "how much vocabulary is this corpus
    * still missing"), and the smoothed count r* = (r+1)·N_{r+1}/N_r
    * for r = 1..maxR (the Good–Turing discount the KN smoother q168
    * builds on, here surfaced as a corpus diagnostic).
    *
    * Exactness: term counts and counts-of-counts are exact int64
    * aggregates; r* and P₀ are row-local double chains in fixed
    * operand order, 6dp-snapped; a frequency class with N_r = 0 or
    * N_{r+1} = 0 reads NULL r* (grid rows zero-fill — the q190
    * convention).
    *
    * Scale shape: one (term) hash aggregate (the corpus exchange),
    * one count-of-counts aggregate over the vocabulary-sized frame,
    * then a maxR-row grid join. Nothing quadratic, no windows.
    *
    * Output: maxR rows (r, n_r, n_r1, rstar6, n_tokens, n_1, p0_6 —
    * the last three replicated), r ascending via callers.
    */
  def goodTuring(
      docs: DataFrame,
      textCol: String,
      maxR: Int = 5): DataFrame = {
    require(maxR >= 1 && maxR <= 64, s"maxR must be in [1,64], got $maxR")
    val spark = docs.sparkSession
    val toks = docs.select(
      explode(graft.functions.TextFns.tokens(col(textCol))).as("__w"))
    val tc = toks.groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    val cc = tc.groupBy(col("__c")).agg(count(lit(1)).as("__n_c"))
      .localCheckpoint(true) // probed three times (grid ×2 + N1)
    val tot = toks.agg(count(lit(1)).as("n_tokens"))
    val n1 = cc.filter(col("__c") === 1L)
      .agg(coalesce(sum(col("__n_c")), lit(0L)).as("n_1"))
    val grid = spark.range(1, maxR + 1).select(col("id").as("r"))
    val p6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    grid
      .join(cc.select(col("__c").as("r"), col("__n_c").as("__nr")),
        Seq("r"), "left")
      .join(cc.select((col("__c") - lit(1L)).as("r"),
        col("__n_c").as("__nr1")), Seq("r"), "left")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(n1))
      .select(col("r"),
        coalesce(col("__nr"), lit(0L)).as("n_r"),
        coalesce(col("__nr1"), lit(0L)).as("n_r1"),
        when(coalesce(col("__nr"), lit(0L)) > 0 &&
            coalesce(col("__nr1"), lit(0L)) > 0,
          p6((col("r") + lit(1L)).cast("double") *
            col("__nr1").cast("double") / col("__nr").cast("double")))
          .otherwise(lit(null).cast("double")).as("rstar6"),
        col("n_tokens"), col("n_1"),
        when(col("n_tokens") > 0,
          p6(col("n_1").cast("double") / col("n_tokens").cast("double")))
          .otherwise(lit(null).cast("double")).as("p0_6"))
  }
}
