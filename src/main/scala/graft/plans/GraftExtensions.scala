package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions entry point registering the engine's codegen
  * expressions cluster-wide:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * }}}
  *
  * makes `vec_dot`, `sig_overlap`, and `simhash64` resolvable from SQL
  * text in every session of the application — the deployment-grade
  * alternative to the per-session `register(spark)` helpers (which
  * remain for ad-hoc/test use; SURVEY §4.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<float> vectors"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("sig_overlap"),
      info("sig_overlap",
        "sig_overlap(a, b) - fraction of equal positions of two array<bigint> MinHash signatures"),
      (exprs: Seq[Expression]) => SigOverlap(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of an array<string>"),
      (exprs: Seq[Expression]) => SimHash64Expr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("simhash_md5_60"),
      info("simhash_md5_60",
        "simhash_md5_60(tokens) - oracle-portable 60-bit SimHash of an array<string>"),
      (exprs: Seq[Expression]) => SimHashMd5Expr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("int8_quantize"),
      info("int8_quantize",
        "int8_quantize(vec) - struct(scale, qvec): symmetric int8 quantization of an array<float>"),
      (exprs: Seq[Expression]) => Int8QuantizeExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("int8_pack"),
      info("int8_pack",
        "int8_pack(codes) - binary: one offset-128 byte per array<int> code"),
      (exprs: Seq[Expression]) => Int8PackExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("int8_unpack"),
      info("int8_unpack",
        "int8_unpack(bin) - array<int>: inverse of int8_pack"),
      (exprs: Seq[Expression]) => Int8UnpackExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(arr, n) - space-joined n-gram windows over a raw token array (drops empties)"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "word_shingles(arr, n) takes 2 arguments")
        val n = exprs(1).eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"word_shingles width must be an int literal, got $other")
        }
        WordShinglesExpr(exprs.head, n)
      }))
    ext.injectFunction((FunctionIdentifier("winnow"),
      info("winnow",
        "winnow(shingles, w) - array<bigint>: sorted distinct window-minima of md5-derived shingle hashes (MOSS fingerprints)"),
      (exprs: Seq[Expression]) => WinnowExpr.buildFromExprs(exprs)))
    ext.injectFunction((FunctionIdentifier("text_stats"),
      info("text_stats",
        "text_stats(text, n, stopwords_csv) - struct(n_tokens, sum_word_len, stopword_cnt, total_shingles, distinct_shingles, bpe_est); n<=0 skips shingle fields"),
      (exprs: Seq[Expression]) => TextStatsExpr.buildFromExprs(exprs)))
    ext.injectFunction((FunctionIdentifier("char_entropy_stats"),
      info("char_entropy_stats",
        "char_entropy_stats(text) - struct(n_chars, n_distinct, s): code-point count, distinct code points, sum c*log2(c) over per-code-point counts"),
      (exprs: Seq[Expression]) => CharEntropyExpr.buildFromExprs(exprs)))
    ext.injectFunction((FunctionIdentifier("image_ahash"),
      info("image_ahash",
        "image_ahash(bmp) - 64-bit average-hash of a 24bpp BMP payload (null if undecodable)"),
      (exprs: Seq[Expression]) => ImageAHashExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("image_dhash"),
      info("image_dhash",
        "image_dhash(bmp) - 64-bit gradient-hash of a 24bpp BMP payload (null if undecodable)"),
      (exprs: Seq[Expression]) => ImageDHashExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("audio_envhash"),
      info("audio_envhash",
        "audio_envhash(wav) - 64-bit energy-envelope hash of an 8-bit PCM mono WAV payload (null if undecodable)"),
      (exprs: Seq[Expression]) => AudioEnvHashExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("pq_encode"),
      info("pq_encode",
        "pq_encode(vec, codebooks) - array<int>: per-subspace nearest-centroid PQ codes; codebooks must be a foldable array<array<array<float>>>"),
      (exprs: Seq[Expression]) => PqEncodeExpr(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("nearest_cell"),
      info("nearest_cell",
        "nearest_cell(vec, centroids) - cell index of the nearest centroid by (1 - cos6, cell); centroids must be a foldable array<array<float>>"),
      (exprs: Seq[Expression]) => NearestCellExpr(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("zorder"),
      info("zorder",
        "zorder(a, b) - Morton interleave of the low 16 bits of two bigint dimension bins"),
      (exprs: Seq[Expression]) => ZOrderExpr.buildFromExprs(exprs)))
  }
}
