package graft.operators

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** Hand-computed Dawid–Skene fixtures: the EM round must OVERRIDE a
  * wrong majority where the reliable labeler disagrees with two
  * noisy ones (the whole point of the model vs plain voting), the
  * confusion estimates must match exact smoothed ratios, and
  * degenerate unanimous input must stay stable.
  */
class WeakLabelsSpec extends SparkSuiteBase {

  private def fixture = {
    // items 1..20, truth: 1..10 → 1, 11..20 → 0; labeler A perfect,
    // B wrong on {1..5}, C wrong on {5..9} — on item 5 BOTH noisy
    // labelers outvote A, so majority init is wrong exactly there
    val wrongB = Set(1, 2, 3, 4, 5)
    val wrongC = Set(5, 6, 7, 8, 9)
    for {
      i <- 1 to 20
      g = if (i <= 10) 1L else 0L
      (l, v) <- Seq(
        ("A", g),
        ("B", if (wrongB(i)) 1L - g else g),
        ("C", if (wrongC(i)) 1L - g else g))
    } yield (i.toLong, l, v)
  }

  test("dawidSkene: EM overrides the wrong majority on item 5") {
    import spark.implicits._
    val out = WeakLabels.dawidSkene(
        fixture.toDF("item", "labeler", "v"), "item", "labeler", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    // smoothed confusion from the majority init (z0 wrong only on 5):
    // A: sens 10/11, spec 11/13; B/C: sens 6/11, spec 12/13
    assert(out("A").getAs[Double]("sens6") == 0.909091)
    assert(out("A").getAs[Double]("spec6") == 0.846154)
    assert(out("B").getAs[Double]("sens6") == 0.545455)
    assert(out("B").getAs[Double]("spec6") == 0.923077)
    assert(out("C").getAs[Double]("spec6") == 0.923077)
    // the E-step relabels item 5 to A's vote (truth): A now agrees
    // with the consensus everywhere, B/C only off their wrong items
    // — a plain majority would leave A at 0.95 and B at 0.8
    assert(out("A").getAs[Double]("final_agree6") == 1.0)
    assert(out("B").getAs[Double]("final_agree6") == 0.75)
    assert(out("C").getAs[Double]("final_agree6") == 0.75)
    assert(out("A").getAs[Long]("n_votes") == 20L)
  }

  test("dawidSkene: unanimous votes are a fixed point") {
    import spark.implicits._
    val votes = for {
      i <- 1L to 10L
      l <- Seq("A", "B", "C")
    } yield (i, l, if (i <= 4) 1L else 0L)
    val out = WeakLabels.dawidSkene(
        votes.toDF("item", "labeler", "v"), "item", "labeler", "v")
      .collect()
    // consensus = the unanimous vote; everyone agrees with it
    assert(out.forall(_.getAs[Double]("final_agree6") == 1.0))
    // smoothed rates: sens (4+1)/(4+2), spec (6+1)/(6+2)
    assert(out.forall(_.getAs[Double]("sens6") == 0.833333))
    assert(out.forall(_.getAs[Double]("spec6") == 0.875))
  }

  test("cohensKappa: textbook 2x2 reads kappa 0.4") {
    import spark.implicits._
    // cells: (1,1)=20 (1,0)=5 (0,1)=10 (0,0)=15 → po=0.7,
    // pe=(25*30 + 25*20)/2500=0.5, kappa=(0.7-0.5)/0.5=0.4
    val rows = Seq.fill(20)((1L, 1L)) ++ Seq.fill(5)((1L, 0L)) ++
      Seq.fill(10)((0L, 1L)) ++ Seq.fill(15)((0L, 0L))
    val r = WeakLabels.cohensKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Long]("n") == 50L && r.getAs[Long]("agree") == 35L)
    assert(r.getAs[Long]("pe_num") == 1250L)
    assert(r.getAs[Double]("po6") == 0.7)
    assert(r.getAs[Double]("pe6") == 0.5)
    assert(r.getAs[Double]("kappa6") == 0.4)
  }

  test("cohensKappa: multi-class perfect agreement is 1, constant raters NULL") {
    import spark.implicits._
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z"), ("x", "x"))
      .toDF("a", "b")
    assert(WeakLabels.cohensKappa(perfect, "a", "b").head()
      .getAs[Double]("kappa6") == 1.0)
    // both raters constant: pe = 1 → zero denominator → NULL kappa
    val const = Seq((1L, 1L), (1L, 1L)).toDF("a", "b")
    val r = WeakLabels.cohensKappa(const, "a", "b").head()
    assert(r.getAs[Double]("po6") == 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa6")), "pe=1 must read NULL")
    // chance-level: independent raters with balanced marginals → ~0
    val chance = Seq((1L, 1L), (1L, 0L), (0L, 1L), (0L, 0L)).toDF("a", "b")
    assert(WeakLabels.cohensKappa(chance, "a", "b").head()
      .getAs[Double]("kappa6") == 0.0)
  }
}
