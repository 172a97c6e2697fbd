package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization ANN (SURVEY §2B R-20 scale path; Jégou et
  * al., TPAMI 2011): compress each corpus vector to `numSub` byte
  * codes — one nearest-codebook-centroid index per contiguous
  * subvector — then answer top-k probes by ASYMMETRIC DISTANCE
  * COMPUTATION: the probe precomputes a (numSub × numCentroids)
  * lookup table of exact probe-subvector→centroid distances, and a
  * corpus vector's approximate distance is the sum of numSub table
  * lookups over its codes.
  *
  * The 100 TB shape:
  *   - the encoded corpus is numSub bytes/vector (64-dim float → 4
  *     codes = 64× smaller), built by ONE codegen'd scan
  *     ([[graft.plans.PqEncodeExpr]]) — the representation that makes
  *     an exhaustive ANN scan IO-feasible at corpus scale, and the
  *     complement of the IVF family ([[Similarity.ivfTopK]]): IVF-PQ
  *     = route probes to nprobe cells, ADC-scan only those cells'
  *     codes;
  *   - codebooks are driver literals (numSub × numCentroids
  *     subvectors — KB, never corpus-sized), so encode is a scan with
  *     no join;
  *   - the probe side (LUT construction) is probe-count-sized and
  *     broadcast; the ADC scan is one codegen'd pass over the codes
  *     with no shuffle before the final top-k rank.
  *
  * Codebooks here are the deterministic smallest-id stand-in (q46's
  * mode — the `numCentroids` smallest-id corpus vectors, sliced per
  * subspace), so the DuckDB oracle reproduces them; swap in per-
  * subspace k-means ([[Similarity.trainIvfCentroidsD]] over slices)
  * when recall on real distributions matters — the plan shape is
  * identical.
  *
  * Determinism: all distances are double-precision squared-L2 rounded
  * to 6 decimals (floor(d*1e6+0.5)/1e6); code ties break to the
  * smaller centroid index, neighbor ties to the smaller id.
  */
object ProductQuant {

  /** Squared-L2 over the zipped prefix in double precision, rounded
    * to 6 decimals — the HOF twin of the [[graft.plans.PqEncodeExpr]]
    * kernel arithmetic (bit-identity asserted in ProductQuantSpec).
    */
  private[operators] def l2Round6(a: Column, b: Column): Column = {
    val d = aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (p, q) => (p - q) * (p - q)),
      lit(0.0), (acc, v) => acc + v)
    floor(d * lit(1e6) + lit(0.5)) / lit(1e6)
  }

  /** The `n` smallest-id corpus vectors — ONE driver collect, shared
    * by centroid and codebook derivation (n rows, KB-sized).
    */
  private[operators] def seedVectors(
      corpus: DataFrame, idCol: String, vecCol: String,
      n: Int): Array[Array[Float]] = {
    val seeds = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
      .orderBy(col("id"))
      .limit(n)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(seeds.length == n,
      s"corpus has only ${seeds.length} rows with vectors; need $n seeds")
    val dims = seeds.head.length
    require(seeds.forall(_.length == dims),
      "ragged embedding dimensions in the seed set")
    seeds
  }

  private[operators] def slicedBooks(
      seeds: Array[Array[Float]], numSub: Int,
      numCentroids: Int): Array[Array[Array[Float]]] = {
    val dims = seeds.head.length
    require(dims % numSub == 0,
      s"dims=$dims not divisible by numSub=$numSub")
    val sub = dims / numSub
    Array.tabulate(numSub) { m =>
      seeds.take(numCentroids).map(_.slice(m * sub, (m + 1) * sub))
    }
  }

  /** Deterministic codebooks: the `numCentroids` smallest-id corpus
    * vectors, each split into `numSub` contiguous subvectors —
    * books(m)(c) = centroid c of subspace m. Driver-sized by
    * construction (numCentroids rows). Requires dims % numSub == 0
    * (uneven tails would silently skew subspace weighting).
    */
  def codebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numSub: Int,
      numCentroids: Int): Array[Array[Array[Float]]] = {
    require(numSub > 0, "numSub must be positive")
    require(numCentroids > 0, "numCentroids must be positive")
    slicedBooks(seedVectors(corpus, idCol, vecCol, numCentroids),
      numSub, numCentroids)
  }

  /** The probe's ADC lookup table as a literal-built nested array
    * column: lut(m)(c) = round6 squared-L2 from the probe's m-th
    * subvector to codebook centroid c. numSub × numCentroids
    * subexpressions — probe-side only, never applied to the corpus.
    */
  private[operators] def lutColumn(
      vec: Column, books: Array[Array[Array[Float]]]): Column = {
    val sub = books(0)(0).length
    array(books.indices.map { m =>
      array(books(m).indices.map { c =>
        l2Round6(slice(vec, m * sub + 1, sub), typedlit(books(m)(c)))
      }: _*)
    }: _*)
  }

  /** Encode the corpus to PQ codes: (id, codes array<int>). One
    * codegen'd scan, no join, no shuffle.
    */
  def encode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      books: Array[Array[Array[Float]]]): DataFrame = {
    val spark = corpus.sparkSession
    corpus.select(col(idCol),
      graft.plans.PqEncodeExpr.pqEncode(spark, col(vecCol),
        typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)).as("codes"))
  }

  /** Approximate top-k neighbors of each probe by PQ/ADC: the corpus
    * is scanned as codes; each probe contributes a broadcast LUT row
    * and the approximate distance is `round6(Σ_m lut(m)(codes(m)))`.
    * Output: (probe_id, rnk, neighbor_id, adist) — rank by (adist
    * asc, neighbor_id).
    */
  def adcTopK(
      probes: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numSub: Int,
      numCentroids: Int,
      k: Int): DataFrame = {
    val books = codebooks(corpus, idCol, vecCol, numSub, numCentroids)
    val coded = encode(corpus, idCol, vecCol, books)
      .select(col(idCol).as("neighbor_id"), col("codes"))
    val p = probes.select(col(idCol).as("probe_id"),
      lutColumn(col(vecCol), books).as("lut"))
    rankAdc(coded.crossJoin(broadcast(p)), k)
  }

  /** ADC distance + (adist asc, neighbor_id) top-k over a frame
    * carrying (probe_id, neighbor_id, codes, lut).
    */
  private[operators] def rankAdc(pairs: DataFrame, k: Int): DataFrame = {
    val adist = aggregate(
      zip_with(col("codes"), col("lut"),
        (c, l) => element_at(l, c + lit(1))),
      lit(0.0), (acc, v) => acc + v)
    val scored = pairs.select(col("probe_id"), col("neighbor_id"),
      (floor(adist * lit(1e6) + lit(0.5)) / lit(1e6)).as("adist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("adist").asc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("neighbor_id"), col("adist"))
  }

  /** IVF-PQ — the standard billion-scale ANN recipe (Jégou 2011 §V):
    * route each probe to its `nprobe` nearest IVF cells
    * ([[Similarity.ivfTopK]]'s cell ranking), then ADC-scan only
    * those cells' PQ codes. Per-probe work drops from
    * O(corpus × numSub lookups) to O(corpus × nprobe/numCells ×
    * numSub), and the scanned representation is bytes, not floats.
    *
    * ONE codegen'd corpus scan computes both the cell assignment
    * ([[graft.plans.NearestCellExpr]]) and the PQ codes
    * ([[graft.plans.PqEncodeExpr]]) — at 100 TB this pass is the
    * index build you persist ([[SimilarityIndex]]'s cell-partitioned
    * layout applies verbatim, with codes instead of raw vectors);
    * the probe-side cell route + LUT is broadcast and the candidate
    * restrict is an equi-join on the cell id.
    *
    * Centroids and codebooks are the deterministic smallest-id
    * stand-ins (oracle-reproducible, q46/q98's mode); both accept
    * trained upgrades without changing the plan shape.
    */
  def ivfPqTopK(
      probes: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int,
      nprobe: Int,
      numSub: Int,
      numCentroids: Int,
      k: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= numCells, "need 1 <= nprobe <= numCells")
    val spark = probes.sparkSession
    // one driver collect serves both derivations (centroids = whole
    // vectors of the first numCells seeds; codebooks = subvector
    // slices of the first numCentroids)
    val seeds = seedVectors(corpus, idCol, vecCol,
      math.max(numCells, numCentroids))
    val cents = seeds.take(numCells).zipWithIndex
      .map { case (v, i) => (i, v) }.toSeq
    val books = slicedBooks(seeds, numSub, numCentroids)
    val booksLit = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val coded = corpus.select(
      col(idCol).as("neighbor_id"),
      Similarity.cellAssign(spark, cents, col(vecCol)).as("cell"),
      graft.plans.PqEncodeExpr.pqEncode(spark, col(vecCol), booksLit)
        .as("codes"))
    val probeCells = probes.select(
      col(idCol).as("probe_id"),
      lutColumn(col(vecCol), books).as("lut"),
      explode(transform(
        slice(Similarity.cellRank(spark, cents, col(vecCol)), 1, nprobe),
        s => s.getField("cell"))).as("cell"))
    rankAdc(coded.join(broadcast(probeCells), "cell"), k)
  }
}
