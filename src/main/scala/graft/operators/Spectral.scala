package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spectral embedding analytics: the top principal component by
  * power iteration, expressed as DataFrame aggregates — the standard
  * first step of embedding-space diagnostics (anisotropy checks,
  * dominant-direction removal ("all-but-the-top"), 1-D ordering for
  * layout).
  *
  * Each round is
  *
  *   w  =  Σ_rows (x − μ) · ((x − μ)ᵀ v)         (un-normalized step)
  *   v  =  w / ‖w‖                                (normalize)
  *
  * with the per-row projection computed ROW-LOCALLY (an index-order
  * fold over the dimensions against the literal v — no join, no
  * shuffle), and the per-dimension sum one hash aggregate of
  * dims-sized groups (map-side combined). `rounds` corpus scans
  * total; the only shuffles are dims-sized. v is collected to the
  * driver between rounds — dims doubles, metadata-sized, the k-means
  * collect discipline (Similarity.trainIvfCentroidsD).
  *
  * Float portability follows the q88 k-means contract: double
  * precision throughout, every cross-row aggregate rounded to 6
  * decimals before reuse (the rounding CONFINES summation-order
  * sensitivity — see the cos6D/trainIvfCentroidsD note), v₀ the
  * deterministic uniform unit vector, so a relational oracle replays
  * every round from the same constants.
  */
object Spectral {

  private def pr6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Per-row index-order dot of (vec − mu) with the literal `v` — one
    * codegen'd ternary loop ([[graft.plans.DoubleVecCenteredDot]]):
    * identical arithmetic and summation order to the 64-term
    * `element_at` chain it replaced, without the chain's per-job
    * genCode+janino fixed cost (the q162 drift root cause — Coreset
    * paid it per greedy round, this file per power round).
    */
  private def centeredDot(
      spark: org.apache.spark.sql.SparkSession,
      vecCol: Column,
      mu: Array[Double],
      v: Array[Double]): Column =
    graft.plans.VecDistExprs.vecCenteredDotD(spark,
      vecCol.cast("array<double>"), lit(mu), lit(v))

  /** Mean vector, 6dp-rounded, as one aggregate. */
  def meanVector(emb: DataFrame, vecCol: String): Array[Double] = {
    val rows = emb.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(pr6(avg(col("x").cast("double"))).as("m"))
      .collect()
    val mu = new Array[Double](rows.length)
    rows.foreach(r => mu(r.getInt(0)) = r.getDouble(1))
    mu
  }

  /** The top principal component after `rounds` power iterations.
    * Output: (pos int, pc1 double) — the 6dp-rounded unit component,
    * one row per dimension. Sign is pinned by the deterministic v₀
    * (uniform positive), not canonicalized afterwards.
    */
  def pcaPowerComponent(
      emb: DataFrame,
      vecCol: String,
      rounds: Int = 3): DataFrame =
    pcaPowerComponentWithMu(emb, vecCol, rounds, meanVector(emb, vecCol))

  private def pcaPowerComponentWithMu(
      emb: DataFrame,
      vecCol: String,
      rounds: Int,
      mu: Array[Double]): DataFrame = {
    require(rounds >= 1, "need at least one power round")
    val spark = emb.sparkSession
    val dim = mu.length
    require(dim > 0, "empty embedding column")
    val v0 = math.floor(1.0 / math.sqrt(dim.toDouble) * 1e6 + 0.5) / 1e6
    var v = Array.fill(dim)(v0)
    var round = 0
    while (round < rounds) {
      val w = new Array[Double](dim)
      emb.select(col(vecCol).as("e"))
        .withColumn("dot", pr6(centeredDot(spark, col("e"), mu, v)))
        .select(posexplode(col("e")).as(Seq("pos", "x")), col("dot"))
        .groupBy(col("pos"))
        .agg(pr6(sum((col("x").cast("double") -
          element_at(typedlit(mu), col("pos") + 1)) * col("dot"))).as("w"))
        .collect()
        .foreach(r => w(r.getInt(0)) = r.getDouble(1))
      val nrm = math.sqrt(w.map(x => x * x).sum)
      require(nrm > 0, "power iteration collapsed to the zero vector")
      v = w.map(x => math.floor(x / nrm * 1e6 + 0.5) / 1e6)
      round += 1
    }
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => (i, x) }.toSeq
      .toDF("pos", "pc1")
  }

  /** Per-dimension standardization (z-scoring) of the embedding
    * column — the preprocessing step before cosine/PCA when dims have
    * heterogeneous scales. Stats are STAGED at 6dp (μ = pr6(avg x),
    * m2 = pr6(avg x²), σ = √(m2 − μ²)) so a relational oracle replays
    * them exactly; output is (idCol, pos, z6) rows for rows matching
    * `probePred` (the corpus-wide stats still aggregate everything).
    *
    * One dims-sized aggregate + one broadcast join into the scan —
    * no corpus shuffle.
    */
  def standardize(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      probePred: Column): DataFrame = {
    val u = emb.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(idCol), col("pos"), col("x").cast("double").as("x"))
    val st = u.groupBy(col("pos"))
      .agg(pr6(avg(col("x"))).as("mu"),
        pr6(avg(col("x") * col("x"))).as("m2"))
    u.where(probePred)
      .join(broadcast(st), Seq("pos"))
      .select(col(idCol), col("pos"),
        pr6((col("x") - col("mu")) /
          sqrt(col("m2") - col("mu") * col("mu"))).as("z6"))
  }

  /** Projection of every row onto [[pcaPowerComponent]]'s axis:
    * (idCol, score) with score = 6dp-rounded (x − μ)·v — one
    * codegen'd scan, zero shuffles past the component collect.
    */
  /** Embedding-space drift between two vector snapshots — the
    * "did the encoder (or the corpus) move" check run before mixing
    * embedding batches produced at different times: the cosine
    * between the two MEAN vectors (direction drift) and the two mean
    * norms (magnitude drift), plus counts. Means are 6dp-staged
    * before the cosine (the q134/q153 float discipline) so the
    * comparison replays bit-for-bit.
    *
    * Scale shape: one (side, dim)-keyed aggregate per snapshot
    * (map-side combined, dims-sized output) + a dims-sized join —
    * the corpora are never co-shuffled. Output one row:
    * (n_a, n_b, cos_means6, norm_a6, norm_b6).
    */
  def embeddingDrift(
      a: DataFrame,
      b: DataFrame,
      vecCol: String): DataFrame = {
    def meansOf(df: DataFrame, cnt: String, m: String): DataFrame =
      df.select(posexplode(col(vecCol).cast("array<double>"))
          .as(Seq("pos", "x")))
        .groupBy(col("pos"))
        .agg(count(lit(1)).as(cnt), pr6(avg(col("x"))).as(m))
    val ma = meansOf(a, "__na", "ma")
    val mb = meansOf(b, "__nb", "mb")
    ma.join(mb, Seq("pos"))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(col("ma") * col("mb")).as("__dot"),
        sum(col("ma") * col("ma")).as("__sa"),
        sum(col("mb") * col("mb")).as("__sb"))
      .select(col("n_a"), col("n_b"),
        when(col("__sa") > 0 && col("__sb") > 0,
          pr6(col("__dot") / (sqrt(col("__sa")) * sqrt(col("__sb")))))
          .otherwise(lit(null).cast("double")).as("cos_means6"),
        pr6(sqrt(col("__sa"))).as("norm_a6"),
        pr6(sqrt(col("__sb"))).as("norm_b6"))
  }

  /** Pearson correlation matrix over k numeric columns in ONE
    * combinable aggregate pass (the feature-diagnostics step before
    * training: redundant/leaking features show as |r| → 1): all
    * k sums, k squares and k(k−1)/2 cross-products fold into a single
    * scan's aggregate node, then every pairwise
    *
    *   r = (n·Σxy − Σx·Σy) / √((n·Σxx − Σx²)(n·Σyy − Σy²))
    *
    * is row-local arithmetic on the one stat row, pivoted long by
    * `stack`. Listwise deletion: rows with a null in ANY profiled
    * column are excluded (the convention the oracle replays).
    * Zero-variance columns read null r (zero denominator). Output:
    * (col_a, col_b, corr6) for the a < b upper triangle in `cols`
    * order. State: O(k²) doubles however large the table.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least 2 columns")
    val clean = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    // aggregate aliases are keyed by column INDEX, never by name —
    // name-derived aliases collide for names containing underscores
    // (pairs (a, b_c) and (a_b, c) would both read __sp_a_b_c)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (i, j)
    val aggCols = count(lit(1)).as("__n") +:
      (cols.indices.flatMap(i => Seq(
        sum(col(cols(i)).cast("double")).as(s"__s_$i"),
        sum(col(cols(i)).cast("double") * col(cols(i)).cast("double"))
          .as(s"__ss_$i"))) ++
        pairs.map { case (i, j) =>
          sum(col(cols(i)).cast("double") * col(cols(j)).cast("double"))
            .as(s"__sp_${i}_$j")
        })
    val one = clean.agg(aggCols.head, aggCols.tail: _*)
    def corrExpr(i: Int, j: Int): Column = {
      val n = col("__n").cast("double")
      val va = n * col(s"__ss_$i") - col(s"__s_$i") * col(s"__s_$i")
      val vb = n * col(s"__ss_$j") - col(s"__s_$j") * col(s"__s_$j")
      val cov = n * col(s"__sp_${i}_$j") - col(s"__s_$i") * col(s"__s_$j")
      when(va > 0 && vb > 0,
        floor(cov / sqrt(va * vb) * lit(1e6) + lit(0.5)) / lit(1e6))
        .otherwise(lit(null).cast("double"))
    }
    val stacked = pairs.map { case (i, j) =>
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        corrExpr(i, j).as("corr6"))
    }
    one.select(explode(array(stacked: _*)).as("__p"))
      .select(col("__p.col_a"), col("__p.col_b"), col("__p.corr6"))
  }

  def pcaProject(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      rounds: Int = 3): DataFrame = {
    val mu = meanVector(emb, vecCol) // computed once, shared below
    val comp = pcaPowerComponentWithMu(emb, vecCol, rounds, mu)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    emb.select(col(idCol),
      pr6(centeredDot(emb.sparkSession, col(vecCol), mu, comp)).as("score"))
  }
}
