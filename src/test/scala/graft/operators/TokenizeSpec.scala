package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** BPE determinism on hand-checkable corpora: known merge sequences,
  * greedy-pass semantics, id stability, and the reconstruction
  * property (concatenating a word's symbols gives the word back —
  * merges only ever concatenate adjacent symbols).
  */
class TokenizeSpec extends SparkSuiteBase {

  test("learns the classic merge sequence on a skewed corpus") {
    import spark.implicits._
    // "ab" dominates: 'a'+'b' adjacency count = 5 (3x "abab" has 2
    // each? no: "abab" = a,b,a,b → (a,b) twice, (b,a) once) — work it
    // out: 3 docs "abab" + 1 doc "ab": (a,b): 3*2 + 1 = 7; (b,a): 3.
    // Round 1 must merge (a,b). Round 2 state: "abab"→[ab,ab],
    // "ab"→[ab]; pairs: (ab,ab): 3 → merges (ab,ab).
    val docs = (Seq.fill(3)("abab") :+ "ab").toDF("text")
    val trained = Tokenize.train(docs, "text", numMerges = 2)
    assert(trained.merges.map(m => (m._1, m._2)) ==
      Seq(("a", "b"), ("ab", "ab")))
    assert(trained.merges.map(_._3) == Seq(7L, 3L))
  }

  test("tie-break is lexicographic on (left, right)") {
    import spark.implicits._
    // "xy" and "ab" both appear twice — counts tie at 2; (a,b) < (x,y)
    val docs = Seq("xy ab", "ab xy").toDF("text")
    val trained = Tokenize.train(docs, "text", numMerges = 1)
    assert(trained.merges.head._1 == "a" && trained.merges.head._2 == "b")
  }

  test("greedy pass merges runs left to right (aaaa -> [aa, aa])") {
    import spark.implicits._
    val docs = Seq("aaaa aaa").toDF("text")
    val trained = Tokenize.train(docs, "text", numMerges = 1)
    assert(trained.merges.head._1 == "a" && trained.merges.head._2 == "a")
    val syms = trained.wordSyms.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(syms("aaaa") == List("aa", "aa"))
    assert(syms("aaa") == List("aa", "a"))
  }

  test("encode reconstructs words and ids are the lexicographic ranks") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat"), (2L, "the bat"), (3L, "   "))
      .toDF("doc_id", "text")
    val trained = Tokenize.train(docs, "text", numMerges = 3)
    // reconstruction: concatenating each word's symbols gives the word
    trained.wordSyms.collect().foreach { r =>
      assert(r.getSeq[String](1).mkString == r.getString(0))
    }
    // vocab ids are dense 0-based lexicographic ranks
    val vocab = trained.vocab.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sorted = vocab.keys.toSeq.sorted
    sorted.zipWithIndex.foreach { case (sym, i) =>
      assert(vocab(sym) == i.toLong, s"id of '$sym'")
    }
    val enc = Tokenize.encode(docs, "doc_id", "text", trained)
    // doc 3 has no tokens → no row
    assert(enc.count() == 2)
    // decoding through the vocab gives back the document's words
    val inv = vocab.map(_.swap)
    val row1 = enc.filter(col("doc_id") === 1L)
      .select("ids").collect()(0).getSeq[Long](0)
    assert(row1.map(inv).mkString == "thecatsat")
    // n_ids is the id count
    val n = enc.filter(col("doc_id") === 1L)
      .select("n_ids").collect()(0).getInt(0)
    assert(n == row1.size)
  }

  test("training and encoding are partitioning-invariant") {
    import spark.implicits._
    // random-ish corpus with plenty of count ties — the adversarial
    // case for determinism: if any round's argmax depended on
    // aggregation or partition order instead of the lexicographic
    // tie-break, the merge tables would diverge and every later round
    // would compound the difference
    val rnd = new scala.util.Random(11)
    val words = Seq("banana", "bandana", "cabana", "abba", "baobab", "ananas")
    val docs = (1L to 60L).map(i =>
        (i, Seq.fill(5)(words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val a = Tokenize.train(docs.repartition(1), "text", numMerges = 6)
    val b = Tokenize.train(docs.repartition(13), "text", numMerges = 6)
    assert(a.merges == b.merges, "merge table depends on partitioning")
    val ea = Tokenize.encode(docs.repartition(3), "doc_id", "text", a)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    val eb = Tokenize.encode(docs.repartition(7), "doc_id", "text", b)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(ea == eb, "id arrays depend on partitioning")
  }

  test("a frozen tokenizer encodes foreign text losing zero tokens") {
    import spark.implicits._
    // train on a corpus where (a,b) then (ab,ab) merge; encode a
    // DISJOINT corpus — every input symbol must survive to the output
    val trainDocs = (Seq.fill(3)("abab") :+ "ab").toDF("text")
    val trained = Tokenize.train(trainDocs, "text", numMerges = 2)
    assert(trained.merges.map(m => (m._1, m._2)) ==
      Seq(("a", "b"), ("ab", "ab")))
    val vocab = trained.vocab.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "abab" is in-vocab; "ababab" and "ba" are OOV but all-known
    // chars; "qq" is OOV with chars outside the trained alphabet
    val foreign = Seq((1L, "ababab ba"), (2L, "qq abab")).toDF("doc_id", "text")
    val enc = Tokenize.encode(foreign, "doc_id", "text", trained)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toList).toMap
    // merge replay on "ababab": (a,b) pass → [ab,ab,ab]; (ab,ab) pass
    // (greedy left-to-right) → [abab, ab]. "ba" replays to [b, a],
    // and the bare chars are NOT in the trained vocabulary (only "ab"
    // and "abab" survived training) → UNK, but still two symbols
    assert(enc(1L) == List(vocab("abab"), vocab("ab"), -1L, -1L),
      "OOV words must replay the trained merges in rank order")
    // unknown chars map to UNK -1, one per char — nothing is dropped
    assert(enc(2L) == List(-1L, -1L, vocab("abab")))
  }

  test("training stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq("ab ab ab").toDF("text")
    // round 1 merges (a,b); afterwards every word is one symbol — no
    // pairs left, so rounds 2+ must stop instead of failing
    val trained = Tokenize.train(docs, "text", numMerges = 5)
    assert(trained.merges.size == 1)
    assert(trained.merges.head._1 == "a")
  }
}
