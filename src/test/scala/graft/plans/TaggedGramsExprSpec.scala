package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** The codegen tagged-q-gram kernel must be BIT-IDENTICAL to the
  * nested-HOF spelling it replaced in [[graft.operators.FuzzyJoin]] —
  * same grams, same occurrence tags, same order — or the prefix
  * filter's no-false-negative theorem silently breaks.
  */
class TaggedGramsExprSpec extends SparkSuiteBase {

  import spark.implicits._

  /** The exact expression FuzzyJoin used before the kernel. */
  private def hofTagged(q: Int) = expr(
    s"""transform(
       |  transform(sequence(0, length(s) - $q), i -> substring(s, i + 1, $q)),
       |  (g, i) -> concat(g, '#', cast(size(filter(
       |      slice(transform(sequence(0, length(s) - $q),
       |                      j -> substring(s, j + 1, $q)), 1, i),
       |      x -> x = g)) as string)))""".stripMargin)

  private val strings = Seq(
    "banana", "abcabcabc", "aaaa", "ab", "abc",
    "mississippi", "tokenization", "zzzzzzzz",
    "a b a b", "x#y#x#y", // '#' in the input must not confuse tags
    "café crème", "日本語の文",
    "😀ab😀ab") // supplementary chars (surrogate pairs)

  test("bit-identical to the nested-HOF expression for q=2 and q=3") {
    for (q <- Seq(2, 3)) {
      val df = strings.toDF("s").where(length(col("s")) >= q)
      val got = df.select(col("s"),
          TaggedGramsExpr.taggedGrams(spark, col("s"), q).as("tg"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      val want = df.select(col("s"), hofTagged(q).as("tg"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      assert(got == want, s"mismatch at q=$q")
    }
  }

  test("occurrence tags count prior equal grams") {
    val out = Seq("banana").toDF("s")
      .select(TaggedGramsExpr.taggedGrams(spark, col("s"), 2))
      .as[Seq[String]].head()
    assert(out == Seq("ba#0", "an#0", "na#0", "an#1", "na#1"))
  }

  test("string shorter than q yields the empty set; null stays null") {
    val out = Seq(Some("a"), None).toDF("s")
      .select(TaggedGramsExpr.taggedGrams(spark, col("s"), 2))
      .as[Option[Seq[String]]].collect()
    assert(out(0).contains(Seq.empty))
    assert(out(1).isEmpty)
  }
}
