package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuiteBase, Tables}

/** DSIR importance weighting must rank target-looking documents above
  * raw-looking ones, keep its state bounded at the bucket count, and
  * make a deterministic without-replacement selection.
  */
class ImportanceSpec extends SparkSuiteBase {

  import spark.implicits._

  // a planted corpus where the target slice is all-"alpha" and the raw
  // slice is mostly-"beta": any correct ratio model must score an
  // alpha-heavy raw doc above a beta-heavy one. Buckets = 256, where
  // md5(alpha/beta/gamma) land in distinct buckets — at 64,
  // md5(alpha) % 64 == md5(gamma) % 64 and the hashing trick merges
  // their evidence (expected feature-hashing behavior, but it would
  // make this fixture assert the wrong thing)
  private def planted = Seq(
    (1L, "alpha alpha alpha alpha"), // target
    (2L, "alpha alpha alpha beta"), // target
    (10L, "alpha alpha alpha alpha alpha"), // raw, target-looking
    (11L, "beta beta beta beta beta"), // raw, raw-looking
    (12L, "alpha beta beta beta beta"), // raw, in between
    (13L, "gamma gamma gamma gamma gamma") // raw, out of model
  ).toDF("doc_id", "text")

  private def weights = {
    val target = planted.filter(col("doc_id") < 10)
    val raw = planted.filter(col("doc_id") >= 10)
    Importance.logWeights(raw, "doc_id", "text", target, raw, buckets = 256)
  }

  test("target-looking documents out-rank raw-looking ones") {
    val w = weights.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(10L) > w(12L), s"alpha doc must beat mixed doc: $w")
    assert(w(12L) > w(11L), s"mixed doc must beat beta doc: $w")
    // per-token evidence accumulates: the all-alpha doc's logw is
    // positive (likelier under target), the all-beta doc's negative
    assert(w(10L) > 0, s"alpha-heavy logw should be positive: $w")
    assert(w(11L) < 0, s"beta-heavy logw should be negative: $w")
  }

  test("the ratio table is bounded by the bucket count, whatever the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val target = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val raw = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val (ratios, _) = Importance.logRatios(target, raw, "text", buckets = 32)
    assert(ratios.count() <= 32)
    // and a duplicated corpus yields the same table SIZE (counts
    // scale, state does not) with identical ratios: p_t/p_r is
    // invariant under duplicating both sides
    val (r2, _) = Importance.logRatios(
      target.union(target), raw.union(raw), "text", buckets = 32)
    assert(r2.count() == ratios.count())
  }

  test("scoring only touches the model via a broadcast join") {
    val docs = Tables.documents(spark, sfDir)
    val target = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val raw = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val w = Importance.logWeights(raw, "doc_id", "text", target, raw, 512)
    val plan = w.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"ratio join must broadcast, got:\n$plan")
  }

  test("gumbel top-k is a without-replacement deterministic selection") {
    val w = weights
    val k2 = Importance.gumbelTopK(w, "doc_id", "logw", k = 2)
      .collect().map(_.getLong(0))
    assert(k2.length == 2 && k2.distinct.length == 2)
    // determinism across re-runs and re-partitionings
    val again = Importance.gumbelTopK(w.repartition(7), "doc_id", "logw", 2)
      .collect().map(_.getLong(0))
    assert(k2.toSeq == again.toSeq, "selection must be deterministic")
    // k >= n degenerates to 'everything, ordered by key'
    val all = Importance.gumbelTopK(w, "doc_id", "logw", 100).collect()
    assert(all.length == w.count())
  }

  test("documents from outside both corpora fall back to the unseen ratio") {
    val target = planted.filter(col("doc_id") < 10)
    val raw = planted.filter(col("doc_id") >= 10 && col("doc_id") < 13)
    val (ratios, unseen) = Importance.logRatios(target, raw, "text", 256)
    // doc 13 is all-gamma — no gamma in either corpus, so its logw is
    // exactly n_tokens * unseenLr
    val scored = Importance.logWeightsWith(
      planted.filter(col("doc_id") === 13), "doc_id", "text",
      ratios, 256, unseen).collect()
    assert(scored.length == 1)
    val r = scored(0)
    val expect = math.floor(r.getLong(1) * unseen * 1e6 + 0.5) / 1e6
    assert(math.abs(r.getDouble(2) - expect) < 1e-9,
      s"unseen fallback: got ${r.getDouble(2)}, want $expect")
  }

  test("effectiveSampleSize: uniform = n, dominated ~ 1, shift-invariant") {
    import spark.implicits._
    // uniform weights: ESS = n exactly (all wm = 1e6)
    val uni = (1 to 8).map(i => (i.toLong, 2.5)).toDF("doc_id", "logw")
    val ru = Importance.effectiveSampleSize(uni, "logw").head()
    assert(ru.getAs[Long]("n_docs") == 8L)
    assert(ru.getAs[Double]("ess6") == 8.0)
    assert(ru.getAs[Double]("ess_ratio6") == 1.0)
    // one huge weight dominates: ESS -> 1
    val dom = ((1 to 99).map(i => (i.toLong, 0.0)) :+ (100L, 20.0))
      .toDF("doc_id", "logw")
    val rd = Importance.effectiveSampleSize(dom, "logw").head()
    assert(rd.getAs[Double]("ess6") < 1.01,
      s"dominated ESS should approach 1, got ${rd.getAs[Double]("ess6")}")
    // ESS is scale-invariant: a constant log-shift changes nothing
    val mixed = Seq((1L, 0.0), (2L, 0.5), (3L, 1.0), (4L, 1.5))
      .toDF("doc_id", "logw")
    val shifted = mixed.select(col("doc_id"),
      (col("logw") + lit(7.25)).as("logw"))
    assert(Importance.effectiveSampleSize(mixed, "logw").head()
        .getAs[Double]("ess6") ==
      Importance.effectiveSampleSize(shifted, "logw").head()
        .getAs[Double]("ess6"))
  }
}
