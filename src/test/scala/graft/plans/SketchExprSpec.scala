package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.Tables
import graft.functions.TextFns

/** The codegen'd sketch expressions (sig_overlap, simhash64) and the
  * single-pass MinHash aggregator must be bit-identical to their
  * interpreted / explode-based reference formulations.
  */
class SketchExprSpec extends SparkSuiteBase {

  test("sig_overlap equals the aggregate(zip_with(...)) estimate exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val sigs = (1 to 50).map { i =>
      (i.toLong, Seq.fill(32)(rnd.nextLong()))
    }.toDF("id", "sig")
    val pairs = sigs.select(col("id").as("ida"), col("sig").as("sa"))
      .crossJoin(sigs.select(col("id").as("idb"), col("sig").as("sb")))
      .filter(col("ida") < col("idb"))
      // plant partial overlaps so the equal-fraction isn't always 0
      .withColumn("sb", concat(slice(col("sa"), 1, 16), slice(col("sb"), 17, 16)))
    val maxDiff = pairs.select(
        abs(SigOverlap.sigOverlap(spark, col("sa"), col("sb")) -
          TextFns.minhashSimilarity(col("sa"), col("sb"))).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(maxDiff == 0.0)
  }

  test("textShingles (codegen) is bit-identical to wordShingles(tokens(text))") {
    // hot-path equivalence: the whole dedup family keys on these
    // strings, so the codegen rewrite must not change a single shingle
    val docs = Tables.documents(spark, sfDir)
    Seq(1, 2, 3, 5).foreach { n =>
      // null-safe inequality: a null on either side must COUNT as a
      // difference, not silently drop out of the filter
      val diff = docs.select(
          TextFns.textShingles(col("text"), n).as("fast"),
          TextFns.wordShingles(TextFns.tokens(col("text")), n).as("ref"))
        .filter(not(col("fast") <=> col("ref"))).count()
      assert(diff == 0, s"n=$n: $diff docs differ")
    }
    // edge cases: null, empties, whitespace runs, fewer tokens than n
    import spark.implicits._
    val edge = Seq(null, "", "   ", "one", "one two", "a  b\tc\nd", " x ")
      .toDF("text")
    val got = edge.select(TextFns.textShingles(col("text"), 3).as("s"),
        TextFns.wordShingles(TextFns.tokens(col("text")), 3).as("r"))
      .collect()
    got.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1),
        "both forms must yield [] (never null) for null/empty text")
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("int8_quantize expression is bit-identical to the VectorFns column forms") {
    import graft.functions.VectorFns
    val e = Tables.embeddings(spark, sfDir)
    val sc = VectorFns.int8Scale(col("embedding"))
    val q8 = graft.plans.Int8QuantizeExpr.int8Quantize(spark, col("embedding"))
    val bad = e.select(
        q8.getField("scale").as("s1"), sc.as("s2"),
        q8.getField("qvec").as("q1"),
        VectorFns.quantizeInt8(col("embedding"), sc).as("q2"))
      .filter(not(col("s1") === col("s2")) || not(col("q1") <=> col("q2")))
      .count()
    assert(bad == 0)
  }

  test("int8_quantize edge cases: null elements, empty, all-null, all-zero vectors") {
    import graft.functions.VectorFns
    import spark.implicits._
    val edge = Seq(
      Seq[Option[Float]](Some(1.0f), None, Some(-2.0f)), // null elem, scale>0
      Seq[Option[Float]](Some(0.0f), None, Some(0.0f)),  // null elem, ZERO scale
      Seq.empty[Option[Float]],                          // empty vector
      Seq[Option[Float]](None, None),                    // all-null
      Seq[Option[Float]](Some(0.0f), Some(0.0f))         // all-zero
    ).toDF("embedding").select(col("embedding").cast("array<float>").as("embedding"))
    val sc = VectorFns.int8Scale(col("embedding"))
    val q8 = graft.plans.Int8QuantizeExpr.int8Quantize(spark, col("embedding"))
    val rows = edge.select(
        q8.getField("scale").as("s1"), sc.as("s2"),
        q8.getField("qvec").as("q1"),
        VectorFns.quantizeInt8(col("embedding"), sc).as("q2"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"scale diverges: $r")
      assert(r.getSeq[Any](2) == r.getSeq[Any](3), s"codes diverge: $r")
    }
    // the ADVICE case pinned explicitly: a null element in a
    // zero-scale vector is 0 (scale check first), null otherwise
    assert(rows(1).getSeq[Any](2) == Seq(0, 0, 0))
    assert(rows(0).getSeq[Any](2) == Seq(64, null, -127))
    // empty/all-null define scale 0 in both JVM forms
    assert(rows(2).getDouble(0) == 0.0 && rows(3).getDouble(0) == 0.0)
  }

  test("int8_pack/unpack roundtrip is the identity and bytes are offset-128") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
    val q8 = graft.plans.Int8QuantizeExpr.int8Quantize(spark, col("embedding"))
    val df = e.select(col("vec_id"), q8.getField("qvec").as("qvec"))
      .withColumn("packed", Int8PackExpr.int8Pack(spark, col("qvec")))
    // roundtrip identity over the whole fixture
    val bad = df
      .filter(not(Int8UnpackExpr.int8Unpack(spark, col("packed")) <=> col("qvec")))
      .count()
    assert(bad == 0)
    // 1 byte per code — the 4x storage claim vs array<int>
    val sizeBad = df.filter(length(col("packed")) =!= size(col("qvec"))).count()
    assert(sizeBad == 0)
    // pinned byte layout: offset-128, element order preserved
    val hexRow = Seq(Seq(127, -127, 0, 1)).toDF("codes")
      .select(lower(hex(Int8PackExpr.int8Pack(spark, col("codes")))).as("h"))
      .head().getString(0)
    assert(hexRow == "ff018081")
    // null array propagates; null ELEMENT and out-of-range throw loudly
    val nullOut = Seq(Tuple1(Option.empty[Seq[Int]])).toDF("codes")
      .select(Int8PackExpr.int8Pack(spark, col("codes")).as("p")).head()
    assert(nullOut.isNullAt(0))
    intercept[Exception] {
      Seq(Seq[Option[Int]](Some(1), None)).toDF("codes")
        .select(Int8PackExpr.int8Pack(spark, col("codes"))).collect()
    }
    intercept[Exception] {
      Seq(Seq(300)).toDF("codes")
        .select(Int8PackExpr.int8Pack(spark, col("codes"))).collect()
    }
  }

  test("simhash64 expression equals an independent JVM reimplementation") {
    // independent recomputation of the documented algorithm (31-mult
    // byte hash -> splitmix64 finalizer -> per-bit +-1 votes)
    def refHash(toks: Seq[String]): Long = {
      def th(t: String): Long = {
        var h = 1125899906842597L
        t.getBytes("UTF-8").foreach(b => h = 31 * h + (b & 0xff))
        var z = h + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      val votes = new Array[Int](64)
      toks.foreach { t =>
        val h = th(t)
        (0 until 64).foreach(j =>
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1)
      }
      (0 until 64).foldLeft(0L)((acc, j) =>
        if (votes(j) >= 0) acc | (1L << j) else acc)
    }
    val docs = Tables.documents(spark, sfDir).limit(50)
    val got = docs.select(col("doc_id"),
        TextFns.simhash64(TextFns.tokens(col("text"))).as("sh"),
        TextFns.tokens(col("text")).as("toks"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) == refHash(r.getSeq[String](2)),
        s"simhash mismatch for doc ${r.getLong(0)}")
    }
  }

  test("single-pass MinHash signatures equal the explode-based xxhash64 formulation") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val viaAgg = graft.operators.Dedup
      .minhashSignatures(docs, "doc_id", "text", shingleN = 3, numHashes = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // the round-1 reference formulation: explode k permutations and
    // min-reduce with the SQL xxhash64(i, h0)
    val sh = docs.select(col("doc_id").as("doc"),
        explode(TextFns.wordShingles(TextFns.tokens(col("text")), 3)).as("shingle"))
      .distinct()
    val viaExplode = sh
      .select(col("doc"), xxhash64(col("shingle")).as("h0"))
      .select(col("doc"), col("h0"),
        explode(sequence(lit(0), lit(15))).as("i"))
      .select(col("doc"), col("i"), xxhash64(col("i"), col("h0")).as("h"))
      .groupBy(col("doc"), col("i")).agg(min(col("h")).as("h"))
      .groupBy(col("doc"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("h")))),
        s => s.getField("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaAgg.keySet == viaExplode.keySet && viaAgg.nonEmpty)
    viaAgg.foreach { case (doc, sig) =>
      assert(sig == viaExplode(doc), s"signature mismatch for doc $doc")
    }
  }

  test("U-2 UDAF surface: MinHashAgg/PortableMinHashAgg match the codegen lane fold bit-for-bit") {
    // the Aggregators are the library's typed-UDAF API (and the JVM
    // reference semantics for the signature); the hot path folds lanes
    // as k codegen min-aggregates — this pins the two implementations
    // to each other for BOTH hash families
    import graft.functions.{MinHashAgg, PortableMinHashAgg, PortableHash}
    val docs = Tables.documents(spark, sfDir).limit(100)
    for (portable <- Seq(false, true)) {
      val viaCodegen = graft.operators.Dedup
        .minhashSignatures(docs, "doc_id", "text", 3, 16, portable)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val sigFn = udaf(
        if (portable) new PortableMinHashAgg(16) else new MinHashAgg(16))
      val baseHash =
        if (portable) PortableHash.md5Long60(col("shingle"))
        else xxhash64(col("shingle"))
      val viaUdaf = docs.select(col("doc_id").as("doc"),
          explode(TextFns.textShingles(col("text"), 3)).as("shingle"))
        .select(col("doc"), baseHash.as("h0"))
        .groupBy(col("doc")).agg(sigFn(col("h0")).as("s"))
        .select(col("doc"), col("s.sig").as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(viaCodegen.nonEmpty && viaCodegen.keySet == viaUdaf.keySet)
      viaCodegen.foreach { case (doc, sig) =>
        assert(sig == viaUdaf(doc), s"portable=$portable mismatch for doc $doc")
      }
    }
  }

  test("text_stats (codegen) is bit-identical to the interpreted HOF quality signals") {
    import spark.implicits._
    val adversarial = Seq(
      "", " ", "\t\n  mixed\tWS   runs ", "the a the A THE",
      "one", "repeat repeat repeat repeat repeat",
      "ünïcödé tökens ünïcödé tökens ünïcödé",
      "digits 123 45.6 end", "a b c d e f g h i j")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val fixture = Tables.documents(spark, sfDir).limit(80)
      .select(col("doc_id"), col("text"))
      .unionByName(adversarial.toDF("doc_id", "text"))
    val stops = Seq("the", "a")
    val stats = TextStatsExpr.textStats(spark, col("text"), 3, stops)
    val toks = TextFns.tokens(col("text"))
    val sh = TextFns.textShingles(col("text"), 3)
    val diff = fixture.select(
        (stats.getField("n_tokens") =!= size(toks)).as("d1"),
        (stats.getField("sum_word_len") =!=
          aggregate(toks, lit(0L), (acc, t) => acc + length(t))).as("d2"),
        (stats.getField("stopword_cnt").cast("double") /
          greatest(stats.getField("n_tokens"), lit(1)).cast("double")
          =!= TextFns.stopwordRatio(toks, stops)).as("d3"),
        (stats.getField("total_shingles") =!= size(sh)).as("d4"),
        (stats.getField("distinct_shingles") =!= size(array_distinct(sh))).as("d5"),
        (stats.getField("bpe_est") =!= TextFns.tokenCountEstimate(col("text"))).as("d6"))
      .filter(col("d1") || col("d2") || col("d3") || col("d4") || col("d5") || col("d6"))
    assert(diff.count() == 0, "codegen stats diverged from the HOF forms")
    // null text propagates
    val n = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(TextStatsExpr.textStats(spark, col("text"), 3, stops)).head()
    assert(n.isNullAt(0))
  }

  test("GraftExtensions makes all codegen functions SQL-resolvable in a fresh session") {
    val base = spark // keep the shared context alive
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      // reuses the existing SparkContext; extensions apply at session
      // construction — the spark.sql.extensions deployment path
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      val r = s2.sql(
        "SELECT vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d, " +
          "sig_overlap(array(1L, 2L), array(1L, 3L)) AS o, " +
          "simhash64(array('a')) AS h, " +
          "simhash_md5_60(array('a')) AS hp, " +
          "word_shingles(array('a', '', 'b', 'c'), 2) AS sh, " +
          "int8_unpack(int8_pack(array(5, -5))) AS rt, " +
          "winnow(array('a b', 'b c'), 4) AS wf, " +
          "text_stats('the quick fox', 3, 'the,a').n_tokens AS nt, " +
          "image_ahash(CAST(NULL AS BINARY)) AS ia, " +
          "audio_envhash(CAST('xx' AS BINARY)) AS ae, " +
          "nearest_cell(array(1.0f, 0.0f), " +
          "array(array(0.0f, 1.0f), array(1.0f, 0.0f))) AS nc, " +
          "pq_encode(array(1.0f, 0.0f), " +
          "array(array(array(0.0f), array(1.0f)), " +
          "array(array(1.0f), array(0.0f)))) AS pq, " +
          "zorder(5L, 3L) AS z").head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getDouble(1) == 0.5)
      assert(!r.isNullAt(2))
      assert(!r.isNullAt(3))
      assert(r.getSeq[String](4) == Seq("a b", "b c"))
      assert(r.getSeq[Int](5) == Seq(5, -5))
      // 2 shingles <= w=4: one fingerprint, the min hash
      assert(r.getSeq[Long](6).size == 1)
      assert(r.getInt(7) == 3)
      // perceptual hashes: null in / undecodable in -> null out
      assert(r.isNullAt(8) && r.isNullAt(9))
      // the axis-1 vector ranks centroid 1 nearest
      assert(r.getInt(10) == 1)
      // subspace 0 (dim 0 = 1.0) → centroid 1; subspace 1 (dim 1 = 0.0) → centroid 1
      assert(r.getSeq[Int](11) == Seq(1, 1))
      assert(r.getLong(12) == 27L)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("simhash64 is SQL-callable and null-safe") {
    SimHash64Expr.register(spark)
    val r = spark.sql(
      "SELECT simhash64(array('a', 'b')) AS h, simhash64(NULL) AS n").head()
    assert(!r.isNullAt(0) && r.isNullAt(1))
  }
}
