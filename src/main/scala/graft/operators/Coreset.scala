package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (Gonzalez 1985 farthest-point
  * traversal — the 2-approximation for the k-center objective, and
  * the standard diversity-driven data-selection baseline: pick the
  * point farthest from everything chosen so far, k times).
  *
  * Each round is ONE codegen'd corpus scan — the running min-distance
  * column is folded with the latest center's literal vector (squared
  * L2 as an index-order term chain, no join) — followed by ONE
  * max-of-struct aggregate (map-side combined) to find the farthest
  * point. k rounds ⇒ k scans + k dims-sized driver collects; nothing
  * is quadratic in the corpus and no all-pairs distance matrix ever
  * exists. This is the exact greedy algorithm, not a sample-based
  * approximation.
  *
  * Float portability (q88 discipline): distances in double, 6dp-
  * rounded BEFORE the argmax so a relational oracle replays every
  * selection; ties broken on the smaller id via max(struct(d, -id)).
  */
object Coreset {

  private def pr6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Index-order squared-L2 term chain against a literal center. */
  private def sqDist(vecCol: Column, center: Array[Double]): Column =
    center.indices.map { i =>
      val d = element_at(vecCol, i + 1).cast("double") - lit(center(i))
      d * d
    }.reduceLeft(_ + _)

  /** Greedily select `k` centers. Output: (ord int 1-based selection
    * order, idCol, dist2 double = the 6dp-rounded squared distance to
    * the previously-selected set at selection time; 0.0 for the
    * seed). Seed = the smallest id (deterministic, oracle-stable).
    */
  def kCenterSelect(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = emb.sparkSession
    // vector column normalized to array<double> up front so float-
    // AND double-typed embeddings both work (everything downstream
    // reads Double)
    val base = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val n = base.count()
    require(n >= 1, "kCenterSelect needs a non-empty corpus")
    require(k <= n,
      s"kCenterSelect: k=$k exceeds the corpus row count $n")

    def vecOf(id: Long): Array[Double] =
      base.where(col("id") === id).head().getSeq[Double](1).toArray

    val seed = base.agg(min(col("id"))).head().getLong(0)
    var chosen = List((1, seed, 0.0))
    // carry the winner's VECTOR inside the argmax struct so each
    // round is exactly one scan — no separate fetch of the winner row
    // (the vector never decides the max: (d, -id) is already total)
    var centerVec = vecOf(seed)
    // running min over rounds, rebuilt as a min() chain of the k-1
    // literal-center distance terms — each round's frame is still one
    // scan; the chain depth is k, a constant
    var distCols: List[Array[Double]] = List(centerVec)
    var round = 2
    while (round <= k) {
      val d: Column = pr6(distCols.map(c => sqDist(col("v"), c))
        .reduceLeft(least(_, _)))
      val top = base.where(!col("id").isin(chosen.map(_._2): _*))
        .agg(max(struct(d.as("d"), (-col("id")).as("nid"),
          col("v").as("v"))).as("m"))
        .head().getStruct(0)
      val (dist, id) = (top.getDouble(0), -top.getLong(1))
      chosen = (round, id, dist) :: chosen
      centerVec = top.getSeq[Double](2).toArray
      distCols = centerVec :: distCols
      round += 1
    }
    import spark.implicits._
    chosen.reverse.toDF("ord", idCol, "dist2")
  }
}
