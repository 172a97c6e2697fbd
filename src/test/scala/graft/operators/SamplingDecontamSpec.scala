package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** Round-12 curation additions: multinomial weighted draws must honor
  * exact integer intervals, and fuzzy decontamination must catch the
  * paraphrased near-dup the exact checks miss.
  */
class SamplingDecontamSpec extends SparkSuiteBase {

  import spark.implicits._

  test("multinomial draws partition [0, W): every draw hits exactly one doc") {
    val docs = Seq((1L, 10L), (2L, 0L), (3L, 5L), (4L, 85L))
      .toDF("doc_id", "n_chars")
    val out = Curation.multinomialSample(docs, "doc_id", "n_chars", draws = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 50, "one row per draw, always")
    assert(out.map(_._1).distinct.length == 50)
    // zero-weight doc owns an empty interval — never drawn
    assert(!out.exists(_._2 == 2L))
    // the interval containment is exact: u < 10 → doc 1, 10 <= u < 15
    // → doc 3, 15 <= u → doc 4
    out.foreach { case (_, doc, u) =>
      val expect = if (u < 10) 1L else if (u < 15) 3L else 4L
      assert(doc == expect, s"draw at u=$u landed on $doc, want $expect")
    }
    // heavy doc dominates roughly proportionally (85% of mass)
    val heavy = out.count(_._2 == 4L)
    assert(heavy > 30, s"85%-weight doc drew only $heavy/50")
  }

  test("multinomial sampling is deterministic and rejects negative weights") {
    val docs = Seq((1L, 7L), (2L, 3L)).toDF("doc_id", "n_chars")
    val a = Curation.multinomialSample(docs, "doc_id", "n_chars", 20)
      .orderBy("draw").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Curation.multinomialSample(docs.repartition(5), "doc_id",
      "n_chars", 20).orderBy("draw").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
    val neg = Seq((1L, -5L)).toDF("doc_id", "n_chars")
    intercept[IllegalArgumentException] {
      Curation.multinomialSample(neg, "doc_id", "n_chars", 1)
    }
  }

  test("sparse tf-idf knn: a planted near-copy ranks first; hot terms leave the space") {
    val probe = "alpha beta gamma delta epsilon zeta eta theta"
    val nearCopy = "alpha beta gamma delta epsilon zeta eta iota"
    val unrelated = "one two three four five six seven eight"
    // 'common common' bigram appears in every doc — at dfCap 3 it is
    // dropped from weights AND norms, so it cannot inflate similarity
    val docs = Seq(
      (1L, probe + " common common"),
      (10L, nearCopy + " common common"),
      (11L, unrelated + " common common"),
      (12L, "alpha beta nine ten eleven twelve thirteen fourteen common common")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.sparseTfIdfTopK(docs, "doc_id", "text",
        probePred = col("doc") < 10, k = 3, dfCap = 3L, termN = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.head == ((1L, 1, 10L)),
      s"near-copy must rank first: ${out.toSeq}")
    // the all-common doc shares ONLY the capped bigram -> no candidate row
    assert(!out.exists(_._3 == 11L), s"capped-term-only overlap must not pair: ${out.toSeq}")
    // plan: the probe weight side broadcasts into the term join
    val plan = TextAnalysis.sparseTfIdfTopK(docs, "doc_id", "text",
      col("doc") < 10, 3, 3L, 2).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"probe side must broadcast:\n$plan")
  }

  test("fuzzy decontamination flags the paraphrase the exact check misses") {
    val evalDoc =
      "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    // paraphrase: one token changed — shingle overlap is high but the
    // doc is NOT an exact eval member
    val paraphrase =
      "the quick brown fox leaps over the lazy dog near the quiet river bank today"
    val unrelated =
      "completely different text about spark joins and stream processing engines"
    val train = Seq((100L, paraphrase), (101L, unrelated))
      .toDF("doc_id", "text")
    val eval = Seq((1L, evalDoc)).toDF("doc_id", "text")
    val out = Dedup.decontaminateFuzzy(train, eval, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, estThreshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(100L)._3, s"paraphrase must flag: ${out(100L)}")
    assert(out(100L)._2 > 0.5 && out(100L)._2 < 1.0,
      s"paraphrase est should be high but below 1: ${out(100L)}")
    assert(!out(101L)._3, s"unrelated doc must not flag: ${out(101L)}")
    // an exact copy estimates 1.0
    val exact = Dedup.decontaminateFuzzy(
        Seq((200L, evalDoc)).toDF("doc_id", "text"), eval,
        "doc_id", "text", 3, 32, 8, 0.5)
      .collect()(0)
    assert(exact.getDouble(3) == 1.0 && exact.getBoolean(4))
  }

  test("fuzzy decontamination returns every train row; identical shingle sets hit 1.0 in both families") {
    val docs = graft.Tables.documents(spark, sfDir)
    val train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val eval = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val fast = Dedup.decontaminateFuzzy(train, eval, "doc_id", "text",
      3, 32, 8, 0.5)
    assert(fast.count() == train.count())
    // IDENTICAL shingle sets guarantee est 1.0 under ANY hash family
    // (the reverse is not true — a 1.0 estimate is still an estimate,
    // and which near-identical pairs saturate all 32 lanes is
    // family-dependent). Plant an exact eval copy and check both
    // families agree on it.
    val evalText = eval.select("text").head().getString(0)
    val planted = train.select("doc_id", "text")
      .union(Seq((999999L, evalText)).toDF("doc_id", "text"))
    Seq(false, true).foreach { portable =>
      val r = Dedup.decontaminateFuzzy(planted, eval, "doc_id", "text",
          3, 32, 8, 0.5, portable)
        .filter(col("doc_id") === 999999L).collect()(0)
      assert(r.getDouble(3) == 1.0 && r.getBoolean(4),
        s"portable=$portable must flag the exact copy at 1.0, got $r")
    }
  }

  test("cell-balanced sample: equal quota per cell, small cells give all members") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val got = Curation.cellBalancedSample(emb, "vec_id", "embedding",
      numCells = 8, budget = 40).collect()
    val perCell = got.groupBy(_.getInt(0)).view.mapValues(_.length).toMap
    assert(perCell.values.forall(_ <= 5), s"quota 5 violated: $perCell")
    assert(got.map(_.getLong(2)).distinct.length === got.length,
      "a vector must be sampled at most once")
    // ranks are 1..n_c contiguous within each cell
    got.groupBy(_.getInt(0)).foreach { case (c, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to rows.length),
        s"ranks not contiguous in cell $c")
    }
    // deterministic under repartitioning
    val again = Curation.cellBalancedSample(emb.repartition(7), "vec_id",
      "embedding", numCells = 8, budget = 40).collect()
    assert(got.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet ===
      again.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet)
  }

  test("dispersion allocation: spread strata win budget; constant strata fall back even") {
    import spark.implicits._
    // stratum A: high variance; B: low variance; C: constant
    val docs = (
      Seq((1L, "A", 0L), (2L, "A", 100L), (3L, "A", 0L), (4L, "A", 100L)) ++
      Seq((11L, "B", 50L), (12L, "B", 52L), (13L, "B", 50L), (14L, "B", 52L)) ++
      Seq((21L, "C", 70L), (22L, "C", 70L))).toDF("doc_id", "lang", "n_chars")
    val got = Curation.dispersionAllocatedSample(docs, "doc_id", "lang",
      "n_chars", budget = 6).collect()
    val quotas = got.map(r => r.getString(0) -> r.getLong(1)).toMap
    // V_A = 4*20000 - 200^2 = 40000; V_B = 4*10408 - 204^2 = 16;
    // V_C = 0. Sum 40016 -> quota_A = 6*40000//40016 = 5 (capped by
    // membership at collect time? no — quota is the allocation),
    // quota_B = max(1, 6*16//40016) = 1, quota_C = max(1, 0) = 1
    assert(quotas("A") === 5L && quotas("B") === 1L && quotas("C") === 1L)
    // kept rows never exceed quota or stratum size, ranks contiguous
    got.groupBy(_.getString(0)).foreach { case (g, rows) =>
      assert(rows.length <= quotas(g))
      assert(rows.map(_.getLong(2)).sorted.toSeq ===
        (1L to rows.length.toLong))
    }
    // all-constant strata: even split
    val const = Seq((1L, "A", 5L), (2L, "A", 5L), (3L, "B", 9L),
      (4L, "B", 9L)).toDF("doc_id", "lang", "n_chars")
    val ev = Curation.dispersionAllocatedSample(const, "doc_id", "lang",
      "n_chars", budget = 4).collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(ev("A") === 2L && ev("B") === 2L)
  }

  test("cell-balanced sample plan: row-local assignment, WindowGroupLimit quota") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val p = Curation.cellBalancedSample(emb, "vec_id", "embedding",
        numCells = 8, budget = 40)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank<=quota must push into WindowGroupLimit:\n$p")
    assert(!p.contains("Join"),
      s"assignment must be row-local (literal centroids, no join):\n$p")
  }

  test("stratifiedKFold: exhaustive, exclusive, balanced-per-cell, stable") {
    import spark.implicits._
    val docs = (1L to 103L).map(i =>
      (i, if (i % 3 == 0) "web" else "book")).toDF("doc_id", "source")
    val f = Curation.stratifiedKFold(docs, "doc_id", "source", k = 5)
    val rows = f.collect()
    // exhaustive + exclusive: one row per input doc, fold in [0,5)
    assert(rows.length == 103)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 103)
    assert(rows.forall(r => r.getAs[Long]("fold") >= 0 &&
      r.getAs[Long]("fold") < 5))
    // balance: every (stratum, fold) cell within 1 of the stratum mean
    val cells = rows.groupBy(r => (r.getAs[String]("source"),
      r.getAs[Long]("fold"))).view.mapValues(_.length)
    Seq("web", "book").foreach { s =>
      val sizes = (0L until 5L).map(k => cells.getOrElse((s, k), 0))
      assert(sizes.max - sizes.min <= 1, s"$s cells: $sizes")
    }
    // reshuffle-stable: the assignment is a pure function of the ids
    val again = Curation.stratifiedKFold(docs.repartition(7),
        "doc_id", "source", k = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fold"))
      .toMap
    rows.foreach(r => assert(
      again(r.getAs[Long]("doc_id")) == r.getAs[Long]("fold")))
  }

  test("contaminationSpans: per-eval-doc counts, first position, clean docs absent") {
    import spark.implicits._
    // train 1 contains eval 100's opening 3-gram at positions 2 and 5
    // (first = 2, distinct -> counted once) plus eval 101's gram at 1;
    // train 2 is clean
    val train = Seq(
      (1L, "z q w e r q w e x"), // 3-grams: zqw qwe wer erq rqw qwe(5) wex
      (2L, "totally clean text here")).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "q w e r t y"),     // shares "q w e" and "w e r"
      (101L, "z q w only")).toDF("doc_id", "text")
    val got = Dedup.contaminationSpans(train, eval, "doc_id", "text", n = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_id"))
        -> (r.getAs[Long]("n_shared"), r.getAs[Long]("first_pos"))).toMap
    assert(got((1L, 100L)) == ((2L, 2L)),
      "q-w-e (first at 2, dup at 5 counted once) + w-e-r at 3")
    assert(got((1L, 101L)) == ((1L, 1L)), "z-q-w at position 1")
    assert(got.keySet == Set((1L, 100L), (1L, 101L)),
      "clean train docs and unhit eval docs produce no rows")
    // eval side must broadcast (benchmark-sized by contract)
    val plan = Dedup.contaminationSpans(train, eval, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
