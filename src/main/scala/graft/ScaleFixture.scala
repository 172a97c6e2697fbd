package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-evidence fixture generator: writes `factor`× copies of the
  * sf0.1 tables so the WHOLE query surface can be timed one decade up
  * and the observed scaling exponent recorded in BASELINE.md —
  * documents/embeddings for the dedup/ANN family, events/orders/
  * lineitem/customer (key-disjoint copies, constant per-key density)
  * for the window/as-of/join/packing family; region/nation/supplier/
  * part stay as-is (pure dimensions).
  *
  * The copies are constructed so the EXPECTED growth is linear — any
  * super-linear bench time is then the engine's fault, not the
  * fixture's:
  *
  *   - documents: EVERY copy k (including 0) suffixes every token
  *     with a FIXED-WIDTH LETTERS-ONLY marker `x<aa>` (base-26 copy
  *     index: `$1xah` for copy 7), so shingles never match across
  *     copies and the pair graph is `factor` disjoint isomorphic
  *     images of the sf0.1 graph — pair count scales exactly ×factor.
  *     Fixed width + all-copies is what makes the claim (nearly)
  *     unconditional: with copy 0 left verbatim, a source token that
  *     already ENDS in `x<k>` (id-ish strings) could collide with
  *     copy k's image of its prefix; equal-length suffixes can only
  *     be equal when the copy indices are equal. A naive text copy
  *     would instead make every planted near-dup cluster `factor`×
  *     larger (quadratic pair growth inside each cluster) and the
  *     measurement would conflate fixture-induced candidate blowup
  *     with engine scaling.
  *
  *     Two deliberate exceptions keep the QUALITY surface two-class
  *     on decks (without them q85/q183/q185/q221/q223/q243 refused
  *     every deck — `trainNaiveBayes` requires both seed classes):
  *     (1) the seed stopword tokens `the`/`a` are left UNSUFFIXED
  *     (case-insensitively), so `stopword_ratio > 0` survives the
  *     deck exactly as in the source — the only shingles that can now
  *     match across copies are ALL-stopword shingles, far below any
  *     near-dup threshold (a cross-copy candidate pair would need a
  *     nearly all-"the a" document); (2) the marker is letters-only,
  *     because the old `x07`-style digits pushed every doc's
  *     `digit_ratio` toward the 0.2 quality bound (+2 digits per
  *     token ≈ 0.22 on digit-free text) — another one-classing.
  *     Per-copy labels can differ from source labels (avg_word_len
  *     +3, digit_ratio diluted) — irrelevant to the deck's purpose,
  *     which only needs a deterministic two-class seed on the deck
  *     itself.
  *   - embeddings: copy k multiplies dimension i by
  *     sign(xxhash64(k, i)) — an ISOMETRY per copy (both vectors of a
  *     within-copy pair flip identically, so every within-copy dot
  *     product, norm, cosine, sign bucket and cell assignment is
  *     bit-preserved), while cross-copy dots become random-sign sums
  *     that decorrelate — no fixture-induced cross-copy near-dups
  *     above any realistic threshold. Copy 0 is the identity, so the
  *     probe set (vec_id < 10) is unchanged.
  *
  * Usage: runMain graft.ScaleFixture <srcDir> <destDir> [factor=10]
  *
  * Every deck carries a `FIXTURE_MANIFEST.json` (generator, scheme
  * version, factor, source dir), written LAST so a half-built deck
  * never verifies. Deck consumers (Bench, TinyAppendBench,
  * tools/check.py) call [[verifyManifest]] and fail fast on a stale
  * or hand-made deck — the r16 stale-/tmp-deck incident (a pre-r15
  * marker-scheme deck silently reused => the NB quality family
  * one-classed until rebuilt) cost a failed sweep and a manual
  * root-cause; provenance is now machine-checked (r16 VERDICT #5).
  */
object ScaleFixture {

  /** Bump on ANY change to the generation scheme (marker format,
    * stopword exceptions, embedding flips, id spacing): consumers
    * refuse decks from another scheme. 3 = the r15 letters-only
    * fixed-width markers + seed-stopword passthrough + sign-flip
    * embedding isometries.
    */
  val SchemeVersion = 3

  val ManifestName = "FIXTURE_MANIFEST.json"

  /** Refuse a deck that was not produced by THIS generator scheme.
    * Driver-provided fixtures under /root/testdata are the source
    * tables (not decks) and are exempt; everything else must carry a
    * matching manifest.
    */
  def verifyManifest(dir: String): Unit = {
    val f = java.nio.file.Paths.get(dir, ManifestName)
    if (!java.nio.file.Files.exists(f)) {
      require(dir.startsWith("/root/testdata/"),
        s"$dir has no $ManifestName — a stale or hand-made deck " +
          s"(scheme v$SchemeVersion expected). Rebuild it: " +
          s"runMain graft.ScaleFixture <srcDir> $dir <factor>")
      return
    }
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readAllBytes(f))
    val v = Option(node.get("scheme_version")).map(_.asInt(-1)).getOrElse(-1)
    require(v == SchemeVersion,
      s"$dir was generated with fixture scheme v$v; this build " +
        s"expects v$SchemeVersion — stale deck, rebuild with " +
        s"runMain graft.ScaleFixture <srcDir> $dir <factor>")
  }

  /** Planted mid-cosine clusters (r16 VERDICT #2): the deck fixture's
    * cross-copy ≥0.4 pairs are decorrelation coincidences with no
    * cluster structure, so the routed arm's recall measured on them
    * (q274: 0.07 at θ=0.4) says nothing about real corpora. This
    * generates the structure real near-dup corpora have: for each
    * seed vector u, `membersPerSeed` members at a KNOWN seed-cosine
    * c ∈ [0.63, 0.95] —
    *
    *   member = (c·û + sqrt(1−c²)·ŵ) · |u|,  ŵ ⊥ û unit gaussian
    *
    * so seed–member cosines are exactly c and member–member cosines
    * concentrate at cᵢ·cⱼ ∈ [0.40, 0.90] (the ŵᵢ·ŵⱼ cross term is
    * N(0, 1/dims) ≈ ±0.12 at 64 dims) — the mid-cosine band the
    * θ=0.4–0.6 recall measurement needs. Deterministic: one
    * sequential Random(seed), so fixture and oracle runs agree.
    * Zero seed vectors are skipped (no direction to perturb).
    */
  def plantedClusters(seedVecs: Seq[Array[Float]], membersPerSeed: Int,
      idBase: Long, seed: Long = 42L): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    seedVecs.zipWithIndex.flatMap { case (v, s) =>
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (norm == 0.0) Seq.empty
      else {
        val u = v.map(_ / norm)
        (0 until membersPerSeed).map { j =>
          val c = 0.63 + 0.32 * rnd.nextDouble()
          val w0 = Array.fill(v.length)(rnd.nextGaussian())
          val dot = u.zip(w0).map { case (a, b) => a * b }.sum
          val wOrth = w0.zip(u).map { case (b, a) => b - dot * a }
          val wn = math.sqrt(wOrth.map(x => x * x).sum)
          val m = u.indices.map { i =>
            ((c * u(i) + math.sqrt(1 - c * c) * wOrth(i) / wn) * norm)
              .toFloat
          }.toArray
          (idBase + s.toLong * 1000L + j, m)
        }
      }
    }
  }

  private[graft] def writeManifest(dst: String, factor: Int,
      src: String): Unit = {
    val json =
      s"""{"generator":"graft.ScaleFixture","scheme_version":$SchemeVersion,"factor":$factor,"src":"$src"}\n"""
    java.nio.file.Files.write(java.nio.file.Paths.get(dst, ManifestName),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  def main(args: Array[String]): Unit = {
    val Array(src, dst) = args.take(2)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    require(factor >= 1 && factor <= 676,
      "fixed-width 2-letter copy suffixes cover factor <= 676")
    val idStep = 10000000L // copy id spaces can never collide

    // letters-only fixed-width marker (digits would shift every doc's
    // digit_ratio toward the 0.2 quality bound); the lookahead skips
    // standalone seed stopwords so the deck stays two-class (scaladoc)
    def marker(k: Int): String =
      "x" + ('a' + k / 26).toChar + ('a' + k % 26).toChar
    val tokenPat = "(?i)(?<!\\S)(?!(?:the|a)(?!\\S))(\\S+)"
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until factor).map { k =>
      docs.select(
        (col("doc_id") + lit(k * idStep)).as("doc_id"),
        regexp_replace(col("text"), tokenPat, "$1" + marker(k)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until factor).map { k =>
      val flipped =
        if (k == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          (x * when(pmod(xxhash64(lit(k), i), lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0))).cast("float"))
      emb.select(
        (col("vec_id") + lit(k * idStep)).as("vec_id"),
        flipped.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // relational/streaming tables scale with KEY-DISJOINT copies: ids
    // that key windows, as-of joins and fact-dim joins are offset per
    // copy, so per-key densities (events per user, orders per
    // customer, lineitems per order) are UNCHANGED — expected time
    // growth is linear in rows for the window/as-of/packing family,
    // and any super-linear reading is the engine's fault, not
    // fixture-induced key skew. Keys left unscaled (nation, part,
    // supplier, event_type, lang) keep a fixed group count with x
    // factor rows per group — aggregate work still linear.
    def copies(table: String, idCols: Seq[String]): Unit = {
      val t = spark.read.parquet(s"$src/$table.parquet")
      (0 until factor).map { k =>
        idCols.foldLeft(t) { (df, c) =>
          df.withColumn(c, col(c) + lit(k.toLong * idStep))
        }
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
    }
    copies("events", Seq("event_id", "user_id"))
    copies("orders", Seq("o_orderkey", "o_custkey"))
    copies("lineitem", Seq("l_orderkey"))
    copies("customer", Seq("c_custkey"))

    // pure dimension tables pass through unchanged
    Seq("region", "nation", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    // manifest LAST: a deck that died mid-build must not verify
    writeManifest(dst, factor, src)
    spark.stop()
  }
}
