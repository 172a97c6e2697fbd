package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** The prefix-filtered edit-distance join must be EXACT — identical
  * to the brute-force cross join — while never materializing the
  * all-pairs space for long strings.
  */
class FuzzyJoinSpec extends SparkSuiteBase {

  import spark.implicits._

  /** Deterministic typo-laden vocabulary: base words plus derived
    * variants (char drop, adjacent swap, substitution) keyed off the
    * word index — no RNG, reproducible pair structure.
    */
  private def vocab(): Seq[String] = {
    val bases = Seq("gradient", "token", "shuffle", "partition", "vector",
      "stream", "window", "catalog", "parquet", "broadcast", "encoder",
      "pipeline", "sampling", "quantile", "checkpoint", "watermark")
    bases.zipWithIndex.flatMap { case (w, i) =>
      val drop = w.substring(0, i % w.length) + w.substring(i % w.length + 1)
      val p = i % (w.length - 1)
      val swap = w.substring(0, p) + w.charAt(p + 1) + w.charAt(p) +
        w.substring(p + 2)
      val sub = w.substring(0, p) + "z" + w.substring(p + 1)
      Seq(w, drop, swap, sub, w + "s")
    }.distinct
  }

  private def brute(strs: Seq[String], d: Int): Set[(String, String, Int)] = {
    val df = strs.toDF("s")
    df.as("a").crossJoin(df.as("b"))
      .where(col("a.s") < col("b.s"))
      .select(col("a.s"), col("b.s"),
        levenshtein(col("a.s"), col("b.s")).as("dist"))
      .where(col("dist") <= d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
  }

  private def mined(strs: Seq[String], d: Int, q: Int = 2)
      : Set[(String, String, Int)] =
    FuzzyJoin.editDistancePairs(strs.toDF("s"), "s", d, q)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("exact vs brute force at d=2, q=2 on the typo vocabulary") {
    val v = vocab()
    assert(v.size > 60)
    val expect = brute(v, 2)
    assert(expect.nonEmpty, "fixture must contain near pairs")
    assert(mined(v, 2) === expect)
  }

  test("exact vs brute force at d=1 and at q=3") {
    val v = vocab()
    assert(mined(v, 1) === brute(v, 1))
    assert(mined(v, 2, q = 3) === brute(v, 2))
  }

  test("short-string blind spot routes through the bounded bucket") {
    val v = Seq("ab", "ba", "abcdef", "x", "xy")
    val got = mined(v, 2)
    // "ab"/"ba" share NO 2-gram yet are within d=2 — the prefix join
    // alone would miss them
    assert(got.contains(("ab", "ba", 2)))
    assert(got.contains(("x", "xy", 1)))
    assert(!got.exists { case (a, b, _) => a == "ab" && b == "abcdef" })
    assert(got === brute(v, 2))
  }

  test("repeated grams: occurrence tags keep multiset semantics") {
    val v = Seq("aaaaaa", "aaaaab", "aaabaa", "bbbbbb")
    assert(mined(v, 2) === brute(v, 2))
  }

  test("plan: no cartesian product; one bounded broadcast loop at most") {
    val plan = FuzzyJoin
      .editDistancePairs(vocab().toDF("s"), "s", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "long-side candidates must come from the gram equi-join")
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnl <= 1, s"only the short bucket may nested-loop, saw $bnl")
  }

  test("adversarial: null and empty strings don't crash, empty pairs with tiny") {
    val v = Seq(Some(""), Some("a"), Some("ab"), None, Some("abcdef"))
    val df = v.toDF("s")
    val got = FuzzyJoin.editDistancePairs(df, "s", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // nulls vanish; "" pairs with "a" (d=1) and "ab" (d=2) via the
    // short bucket; nothing pairs with the long outlier
    assert(got === Set(("", "a", 1), ("", "ab", 2), ("a", "ab", 1)))
  }

  test("entity resolution composition: transitive chains share one canonical") {
    // chain aaaaaa ~ aaaaab ~ aaaabb ~ aaabbb: adjacent distances <= 2
    // but endpoints differ by 3 — transitivity must still merge them
    val chain = Seq("aaaaaa", "aaaaab", "aaaabb", "aaabbb")
    val lone = Seq("zzzzzz")
    val df = (chain ++ lone).toDF("s")
    val pairs = FuzzyJoin.editDistancePairs(df, "s", 2)
      .select(col("name_a").as("id_a"), col("name_b").as("id_b"))
    val comp = Dedup.clusters(df.select(col("s")), "s", pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    chain.foreach(n => assert(comp(n) === "aaaaaa",
      s"$n must resolve to the chain minimum"))
    assert(comp("zzzzzz") === "zzzzzz")
  }
}
