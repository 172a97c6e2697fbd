package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weak-supervision label aggregation: one EM round of the
  * Dawid–Skene (1979) annotator model over a (item, labeler, vote)
  * frame — majority-vote initialization, per-labeler confusion
  * estimation (the M-step), then a Naive-Bayes re-label of every
  * item weighting each labeler by its estimated reliability (the
  * E-step). The aggregation layer a labeling pipeline runs over
  * redundant crowd/model annotations before trusting any of them:
  * majority vote treats a 55%-accurate labeler and a 95%-accurate
  * one identically; one EM round already re-weights them.
  *
  * Determinism discipline: confusion counts are exact integer
  * aggregates with Laplace +1/+2 smoothing (no 0/1 rates → no
  * infinite log-weights, and the smoothing is integer arithmetic);
  * each labeler's two log-likelihood-ratio weights and the class
  * prior's log-odds snap to integer MICRO-units at the
  * LABELER/PRIOR grain (3 + 1 rows), so the per-item E-step sum is
  * pure int64 and the relabel threshold (> 0) compares exact
  * integers — partition order can never flip a label.
  *
  * Scale shape: one item-grain aggregate (majority), one
  * labeler-grain aggregate (confusion, labeler-count-sized), one
  * broadcast join of the 3-row weight table back onto the votes,
  * one item-grain integer sum, one labeler-grain agreement
  * aggregate. Nothing quadratic, no driver-side data.
  *
  * Output per labeler: (labelerCol, n_votes, sens6, spec6,
  * final_agree6 — the labeler's agreement rate with the EM-round
  * consensus), ordered by labeler.
  */
object WeakLabels {

  private def pr6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  private def micro(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)).cast("long")

  def dawidSkene(
      votes: DataFrame,
      itemCol: String,
      labelerCol: String,
      voteCol: String): DataFrame = {
    val v = votes.select(col(itemCol).as("__it"),
      col(labelerCol).as("__lab"),
      col(voteCol).cast("long").as("__v"))
      .localCheckpoint(true) // read by init, M-step, E-step, agreement
    // init: strict-majority consensus (2·Σv > n — a tie reads 0)
    val z0 = v.groupBy(col("__it"))
      .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__c"))
      .select(col("__it"),
        (lit(2L) * col("__s") > col("__c")).cast("long").as("__z"))
    // M-step: smoothed per-labeler confusion + integer micro weights
    val m = v.join(z0, Seq("__it"))
      .groupBy(col("__lab"))
      .agg(count(lit(1)).as("n_votes"),
        sum(when(col("__z") === 1L && col("__v") === 1L, 1L)
          .otherwise(0L)).as("__cp"),
        sum(when(col("__z") === 1L, 1L).otherwise(0L)).as("__np"),
        sum(when(col("__z") === 0L && col("__v") === 0L, 1L)
          .otherwise(0L)).as("__cn"),
        sum(when(col("__z") === 0L, 1L).otherwise(0L)).as("__nn"))
    val sens = (col("__cp") + lit(1L)).cast("double") /
      (col("__np") + lit(2L)).cast("double")
    val spec = (col("__cn") + lit(1L)).cast("double") /
      (col("__nn") + lit(2L)).cast("double")
    val weights = m.select(col("__lab"), col("n_votes"),
      pr6(sens).as("sens6"), pr6(spec).as("spec6"),
      micro(log(sens / (lit(1.0) - spec))).as("__w1"),
      micro(log((lit(1.0) - sens) / spec)).as("__w0"))
      .localCheckpoint(true) // broadcast into E-step + final output
    // smoothed class prior log-odds, one snapped row
    val prior = z0.agg(sum(col("__z")).as("__n1"), count(lit(1)).as("__n"))
      .select(micro(log(
        ((col("__n1") + lit(1L)).cast("double") /
          (col("__n") + lit(2L)).cast("double")) /
        (lit(1.0) - (col("__n1") + lit(1L)).cast("double") /
          (col("__n") + lit(2L)).cast("double")))).as("__pm"))
    // E-step: per-item integer log-odds sum, relabel on exact > 0
    val z1 = v.join(broadcast(weights.select(col("__lab"), col("__w1"),
        col("__w0"))), Seq("__lab"))
      .groupBy(col("__it"))
      .agg(sum(when(col("__v") === 1L, col("__w1"))
        .otherwise(col("__w0"))).as("__sw"))
      .crossJoin(broadcast(prior))
      .select(col("__it"),
        (col("__sw") + col("__pm") > 0L).cast("long").as("__z1"))
    val agree = v.join(z1, Seq("__it"))
      .groupBy(col("__lab"))
      .agg(sum(when(col("__v") === col("__z1"), 1L).otherwise(0L))
        .as("__ag"), count(lit(1)).as("__cnt"))
      .select(col("__lab"),
        pr6(col("__ag").cast("double") / col("__cnt").cast("double"))
          .as("final_agree6"))
    weights.join(agree, Seq("__lab"))
      .select(col("__lab").as(labelerCol), col("n_votes"),
        col("sens6"), col("spec6"), col("final_agree6"))
  }

  /** Cohen's kappa between two raters over the same items — the
    * chance-corrected agreement a labeling pipeline reads BEFORE
    * believing two annotators (or a model and a rule) that "agree
    * 90%": with skewed marginals, 90% raw agreement can be pure
    * chance. κ = (p_o − p_e) / (1 − p_e), multi-class; Cohen (1960).
    *
    * Exactness: the confusion cells, both marginals, the diagonal
    * sum, and the chance numerator Σ_k rowA_k·rowB_k are all exact
    * int64 aggregates (order-free); p_o / p_e / κ are one row of
    * double arithmetic at the end, 6dp-snapped. The marginal product
    * bound: Σ na·nb ≤ n², inside int64 to ~3e9 rows.
    *
    * Scale shape: ONE corpus-sized hash aggregate to the (a, b)
    * confusion frame (label-pairs-sized); everything after runs on
    * that frame — two marginal aggregates, one label equi-join, one
    * 1-row cross join. Rater labels may be any equatable type; both
    * columns must share it (the join compares them).
    *
    * Output: ONE row (n, agree, pe_num, po6, pe6, kappa6); κ is
    * NULL when p_e = 1 (both raters constant — zero denominator) or
    * the input is empty.
    */
  def cohensKappa(
      df: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // label-pairs-sized; read three times
    val tot = cells.agg(
      coalesce(sum(col("__c")), lit(0L)).as("n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__c"))
        .otherwise(0L)), lit(0L)).as("agree"))
    val ra = cells.groupBy(col("__a").as("__k"))
      .agg(sum(col("__c")).as("__na"))
    val rb = cells.groupBy(col("__b").as("__k"))
      .agg(sum(col("__c")).as("__nb"))
    val pe = ra.join(rb, Seq("__k"))
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L)).as("pe_num"))
    val nD = col("n").cast("double")
    val po = col("agree").cast("double") / nD
    val ped = col("pe_num").cast("double") / (nD * nD)
    tot.crossJoin(pe).select(col("n"), col("agree"), col("pe_num"),
      when(col("n") > 0, pr6(po))
        .otherwise(lit(null).cast("double")).as("po6"),
      when(col("n") > 0, pr6(ped))
        .otherwise(lit(null).cast("double")).as("pe6"),
      when(col("n") > 0 && (lit(1.0) - ped) =!= lit(0.0),
        pr6((po - ped) / (lit(1.0) - ped)))
        .otherwise(lit(null).cast("double")).as("kappa6"))
  }
}
