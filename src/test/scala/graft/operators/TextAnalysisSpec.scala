package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** Corpus-analysis operators: PMI collocation mining. */
class TextAnalysisSpec extends SparkSuiteBase {

  test("PMI collocations: a planted always-together pair outranks independent pairs") {
    import spark.implicits._
    // "new york" only ever occur as a pair; filler words pair freely.
    // p(new york) = p(new) = p(york)  =>  lift = 1/p(new) (maximal);
    // filler bigrams approach lift ~ 1.
    val filler = Seq("a", "b", "c", "d")
    val rnd = new scala.util.Random(3)
    val docs = (0 until 60).map { i =>
      val words = (0 until 20).map(_ => filler(rnd.nextInt(4)))
      val withPair = words.take(10) ++ Seq("new", "york") ++ words.drop(10)
      (i.toLong, withPair.mkString(" "))
    }.toDF("doc_id", "text")
    val top = TextAnalysis.pmiCollocations(docs, "text", minCount = 5L, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
    assert(top.head._1 == ("new", "york"), s"top was ${top.head}")
    // and its lift strictly dominates every filler pair
    val pairLift = top.head._2
    top.tail.foreach { case (p, l) =>
      assert(l < pairLift, s"$p lift $l not below planted $pairLift") }
    // deterministic: a second run returns the identical ranking
    val again = TextAnalysis.pmiCollocations(docs, "text", 5L, 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
    assert(top.toSeq == again.toSeq)
  }

  test("BM25: term frequency, rarity, and length normalization rank as published") {
    import spark.implicits._
    val docs = Seq(
      // matches all query terms, short -> should rank top
      (1L, "spark join stream spark"),
      // same matches but diluted by length -> below doc 1
      (2L, "spark join stream " + Seq.fill(40)("filler").mkString(" ")),
      // one common term only
      (3L, "spark alone here"),
      // rare term: 'stream' appears in fewer docs than 'spark'
      (4L, "stream only doc"),
      (5L, "spark something else"),
      (6L, "no query terms at all")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("spark", "join", "stream"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val rank = out.map(_._1)
    val score = out.toMap
    assert(rank.head == 1L, s"got $rank")
    assert(score(1L) > score(2L), "length normalization must demote doc 2")
    assert(!score.contains(6L), "no-match docs carry no score rows")
    // rarity: 'stream' (df=2) outweighs 'spark' (df=4) at equal tf/dl
    assert(score(4L) > score(5L),
      s"rare-term doc ${score(4L)} vs common-term doc ${score(5L)}")
    // deterministic
    val again = TextAnalysis.bm25(docs, "doc_id", "text",
      Seq("spark", "join", "stream"), 10).collect().map(r => r.getLong(0))
    assert(rank.toSeq == again.toSeq)
  }

  test("PMI collocations: minCount gates rare pairs, output is rank-deterministic under ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y x y x y x y"), // x y appears 5x
      (2L, "p q")                  // p q appears once
    ).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 5L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.exists(t => t._1 == "x" && t._2 == "y"))
    assert(!out.exists(t => t._1 == "p"), "rare pair must be gated")
  }

  test("adversarial inputs: null/empty text and degenerate corpora don't crash or lie") {
    import spark.implicits._
    val docs = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, ""),
      (3L, "   "),
      (4L, "one"),
      (5L, "spark join stream spark join stream")).toDF("doc_id", "text")
    // PMI: only doc 5 contributes bigrams; null/empty rows vanish
    val pmi = TextAnalysis.pmiCollocations(docs, "text", 1L, 50).collect()
    assert(pmi.nonEmpty && pmi.forall(r => r.getLong(2) >= 1))
    // BM25: null/empty docs carry no score rows, scored rows are finite
    val bm = TextAnalysis.bm25(docs, "doc_id", "text", Seq("spark"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bm.keySet == Set(5L) && !bm(5L).isNaN && !bm(5L).isInfinite)
    // chunk dedup: output stays TOTAL over the input, null text -> ""
    val cd = Dedup.chunkDedup(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cd.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(cd(1L) == "" && cd(2L) == "" && cd(3L) == "" && cd(4L) == "one")
    // a single-doc corpus: BM25 idf floor keeps the score positive
    val solo = TextAnalysis.bm25(
      Seq((9L, "spark")).toDF("doc_id", "text"), "doc_id", "text",
      Seq("spark"), 5).collect()
    assert(solo.length == 1 && solo(0).getDouble(1) > 0)
  }

  test("phrase search: consecutive only, overlaps counted, duplicate words") {
    import spark.implicits._
    val docs = Seq(
      (1L, "big data spark join fast"),     // one match
      (2L, "spark join spark join"),        // two matches
      (3L, "join spark"),                   // reversed -> none
      (4L, "spark big join"),               // gap -> none
      (5L, "spark join spark"),             // one match
      (6L, "nothing here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.phraseSearch(docs, "doc_id", "text",
        Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 5L -> 1L))
    // duplicate-word phrase: "a a" must need two CONSECUTIVE a's
    val dup = TextAnalysis.phraseSearch(Seq(
        (1L, "a b a"), (2L, "a a b"), (3L, "b a a a")
      ).toDF("doc_id", "text"), "doc_id", "text", Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dup === Map(2L -> 1L, 3L -> 2L))
  }

  test("phrase search plan: phrase table broadcasts, index filters pre-shuffle") {
    import spark.implicits._
    val docs = Seq((1L, "spark join")).toDF("doc_id", "text")
    val plan = TextAnalysis.phraseSearch(docs, "doc_id", "text",
      Seq("spark", "join")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"phrase table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no corpus merge join:\n$plan")
  }

  test("novelty score: planted overlap fractions, short docs emit no row") {
    import spark.implicits._
    val ref = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c d"),        // grams abc, bcd - both in ref -> 0
      (3L, "x y z w"),        // xyz, yzw - none in ref -> 1
      (5L, "a b c x y z"),    // abc seen; bcx, cxy, xyz novel -> 3/4
      (7L, "a b")             // no 3-grams -> no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyScore(docs, "doc_id", "text",
        ref, "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === Set(1L, 3L, 5L))
    assert(got(1L) === ((2L, 0L, 0.0)))
    assert(got(3L) === ((2L, 2L, 1.0)))
    assert(got(5L) === ((4L, 3L, 0.75)))
  }

  test("feature hash: fixed dim bound, exact counts, determinism") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c a b"), (2L, "z"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.featureHash(docs, "doc_id", "text", dim = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // doc 3 has no tokens -> no row; nnz bounded by dim
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L)._1 <= 8)
    // total count across buckets = token count (6 for doc 1)
    val total = out(1L)._2.split(",").map(_.split(":")(1).toLong).sum
    assert(total === 6L)
    // bucket ids replay the JVM md5 hash exactly
    val aB = graft.functions.PortableHash.md5Long60Jvm(
      "a".getBytes("UTF-8")) % 8
    assert(out(1L)._2.split(",").exists(_.startsWith(s"$aB:3")))
    val again = TextAnalysis.featureHash(docs.repartition(4), "doc_id",
      "text", 8).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(again(1L) === out(1L)._2)
  }

  test("Kneser-Ney: continuation counts break the add-k tie") {
    import spark.implicits._
    // (u,p) and (v,q) have identical bigram/unigram counts; p completes
    // TWO contexts (u,z), q completes one. KN scores (u,p) strictly
    // higher — add-k smoothing cannot see the difference.
    val docs = Seq((1L, "u p"), (2L, "v q"), (3L, "z p"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.knBigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // P(p|u) = 0.25/1 + 0.75*1*(2/3) = 0.75; P(q|v) = 0.25 + 0.75/3 = 0.5
    assert(got(1L) === math.floor(math.log(0.75) / math.log(2) * 1e6 + 0.5) / 1e6)
    assert(got(2L) === -1.0)
    assert(got(1L) > got(2L))
  }

  test("Kneser-Ney: seen-continuation mass sums to 1; deterministic under repartition") {
    import spark.implicits._
    // every continuation of m in the corpus is {a, b}: the interpolated
    // model's mass over them is exactly 1
    val docs = Seq((1L, "m a"), (2L, "m b"), (3L, "m a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.knBigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val mass = math.pow(2, got(1L)) + math.pow(2, got(2L))
    assert(math.abs(mass - 1.0) < 1e-5, s"mass $mass")
    assert(got(1L) === got(3L), "identical docs must score identically")
    val again = TextAnalysis.knBigramScore(docs.repartition(5),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again === got)
  }

  test("hillTailIndex: geometric top values, flat tail, short corpus") {
    import spark.implicits._
    // top-3 = [1000e², 1000e, 1000]: ln ratios ≈ [2, 1] → γ ≈ 1.5
    val df = (Seq((1L, 7389L), (2L, 2718L), (3L, 1000L)) ++
      (4L to 20L).map(i => (i, 10L))).toDF("id", "x")
    val r = TextAnalysis.hillTailIndex(df, "x", "id", k = 2).head()
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("x_kplus1") == 1000L)
    assert(math.abs(r.getAs[Double]("gamma6") - 1.5) < 1e-3)
    assert(math.abs(r.getAs[Double]("alpha6") - 2.0 / 3.0) < 1e-3)

    // all-equal top: no tail to measure → γ 0, α NULL
    val flat = (1L to 10L).map(i => (i, 500L)).toDF("id", "x")
    val rf = TextAnalysis.hillTailIndex(flat, "x", "id", k = 4).head()
    assert(rf.getAs[Double]("gamma6") == 0.0)
    assert(rf.isNullAt(rf.fieldIndex("alpha6")))

    // fewer than k+1 positive rows: no (k+1)-th order statistic →
    // empty result, never a fabricated xmin
    assert(TextAnalysis.hillTailIndex(flat, "x", "id", k = 64).isEmpty)
  }

  test("jsdProfilePairs: identical sources 0, disjoint ln2, symmetric") {
    import spark.implicits._
    val docs = Seq(
      ("a", "x x y"), ("a", "y z"),
      ("b", "x x y y z"),         // same distribution as a: 2/5 2/5 1/5
      ("c", "p q p q p")          // disjoint vocabulary
    ).toDF("source", "text")
    val out = TextAnalysis.jsdProfilePairs(docs, "source", "text",
        profileK = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("jsd6")).toMap
    assert(out(("a", "b")) == 0.0, "identical unigram mix")
    // fully disjoint supports: JSD = ln 2 = 0.693147
    assert(out(("a", "c")) == 0.693147)
    assert(out(("b", "c")) == 0.693147)
    // ordering convention: pairs come out (min, max) only
    assert(!out.contains(("b", "a")))
  }

  test("jsdProfilePairs: tail mass folds into one rest bucket") {
    import spark.implicits._
    // profileK = 1 keeps only the global top token ("x", count 5,
    // ties impossible); everything else buckets as rest. a: x=2 of 3;
    // b: x=3 of 5 — rest carries 1/3 vs 2/5
    val docs = Seq(("a", "x x q"), ("b", "x r x s x"))
      .toDF("source", "text")
    val r = TextAnalysis.jsdProfilePairs(docs, "source", "text",
      profileK = 1).head()
    assert(r.getAs[Long]("n_tokens_a") == 3L)
    assert(r.getAs[Long]("n_tokens_b") == 5L)
    // hand JSD over {x: 2/3 vs 3/5, rest: 1/3 vs 2/5}
    val p = Seq(2.0 / 3, 1.0 / 3); val q = Seq(3.0 / 5, 2.0 / 5)
    val jsd = (p, q).zipped.map { (pi, qi) =>
      0.5 * pi * math.log(2 * pi / (pi + qi)) +
        0.5 * qi * math.log(2 * qi / (pi + qi))
    }.sum
    assert(math.abs(r.getAs[Double]("jsd6") - jsd) < 2e-6)
  }

  test("goodTuring: hand-built counts-of-counts, unseen mass, empty-class NULLs") {
    import spark.implicits._
    // corpus: a a a b b c d e  -> N=8 tokens, counts: a=3, b=2, c=d=e=1
    // N_1=3, N_2=1, N_3=1, N_4..=0; P0 = 3/8 = 0.375
    // r*=1: 2*N2/N1 = 2/3; r*=2: 3*N3/N2 = 3; r*=3: N4=0 -> NULL
    val docs = Seq("a a a b b", "c d e").toDF("text")
    val got = TextAnalysis.goodTuring(docs, "text", maxR = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 1L,
      Some(math.floor(2.0 * 1 / 3 * 1e6 + 0.5) / 1e6))))
    assert(got(2L) == ((1L, 1L, Some(3.0))))
    assert(got(3L) == ((1L, 0L, None)), "N_4 = 0 reads NULL r*")
    assert(got(4L) == ((0L, 0L, None)), "empty class zero-fills")
    val one = TextAnalysis.goodTuring(docs, "text", maxR = 4).head()
    assert(one.getAs[Long]("n_tokens") == 8L)
    assert(one.getAs[Long]("n_1") == 3L)
    assert(one.getAs[Double]("p0_6") == 0.375)
  }

  test("gopherRepetitionSignals: hand-computed fractions, smallest-gram ties, short docs") {
    import spark.implicits._
    val docs = Seq(
      // 1: "a b" x3 of 2-char mass over 6 chars -> top2 = 1.0;
      //    3-gram tie ("a b a" / "b a b" both x2) -> smallest wins,
      //    2*3/6 = 1.0; top4 "a b a b" x2 -> 8/6; no dup 5-grams
      (1L, "a b a b a b"),
      // 2: repeated 5-gram "x y z w v" x2 -> dup5 = 2*5/10 = 1.0;
      //    2-gram ties at count 2 -> smallest "w v", 4/10 = 0.4
      (2L, "x y z w v x y z w v"),
      // 3: one token -> no grams anywhere, fractions all 0
      (3L, "solo"),
      // 4: all distinct tokens -> top masses but zero dup mass
      (4L, "p q r s t u")).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRepetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def f6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val r1 = got(1L)
    assert(r1.getAs[Long]("total_chars") == 6L)
    assert(r1.getAs[Double]("top2_frac6") == 1.0)
    assert(r1.getAs[Double]("top3_frac6") == 1.0)
    assert(r1.getAs[Double]("top4_frac6") == f6(8.0 / 6))
    assert(r1.getAs[Double]("dup5_frac6") == 0.0)
    assert(r1.getAs[Double]("dup10_frac6") == 0.0)
    val r2 = got(2L)
    assert(r2.getAs[Double]("dup5_frac6") == 1.0)
    assert(r2.getAs[Double]("top2_frac6") == 0.4,
      "tie at count 2 must pick the lexicographically smallest gram")
    val r3 = got(3L)
    assert(r3.getAs[Long]("total_chars") == 4L)
    assert(Seq("top2_frac6", "top3_frac6", "top4_frac6", "dup5_frac6",
      "dup10_frac6").forall(c => r3.getAs[Double](c) == 0.0))
    val r4 = got(4L)
    assert(r4.getAs[Double]("top2_frac6") == f6(2.0 / 6))
    assert(r4.getAs[Double]("dup5_frac6") == 0.0)
  }
}
