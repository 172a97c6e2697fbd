package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** Power iteration must recover a planted dominant direction, stay
  * deterministic under repartitioning, and keep the projection scan
  * shuffle-free.
  */
class SpectralSpec extends SparkSuiteBase {

  import spark.implicits._

  private val dim = 8

  /** 200 vectors = t * u + bounded deterministic noise along other
    * axes; u the planted dominant axis (unit, positive entries so the
    * uniform-positive v0 converges onto +u, not -u).
    */
  private def planted() = {
    val u = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    val rows = (0 until 200).map { i =>
      val t = (i % 21) - 10.0 // spread along u, mean 0
      val vec = Array.tabulate(dim) { j =>
        val noise = 0.05 * (((i * 7 + j * 13) % 11) - 5.0) / 5.0
        (t * u(j) + noise).toFloat
      }
      (i.toLong, vec.toSeq)
    }
    (u, rows.toDF("vec_id", "embedding"))
  }

  test("recovers the planted dominant axis") {
    val (u, df) = planted()
    val v = Spectral.pcaPowerComponent(df, "embedding", rounds = 3)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    val dot = v.zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) > 0.99,
      s"pc1 misaligned with the planted axis: |cos| = ${math.abs(dot)}")
    val nrm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-4, s"pc1 not unit: $nrm")
  }

  test("deterministic under repartitioning") {
    val (_, df) = planted()
    val a = Spectral.pcaPowerComponent(df, "embedding", 3)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq
    val b = Spectral.pcaPowerComponent(df.repartition(7), "embedding", 3)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq
    assert(a == b)
  }

  test("projection orders points by their planted position") {
    val (_, df) = planted()
    val scores = Spectral.pcaProject(df, "vec_id", "embedding", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // i = 0 (t = -10) and i = 10 (t = 0) and i = 20 (t = +10) must be
    // monotone along the axis (sign fixed by the positive v0)
    assert(scores(0L) < scores(10L) && scores(10L) < scores(20L))
    assert(scores(20L) - scores(0L) > 15.0, "spread must survive")
  }

  test("projection plan is shuffle-free past the component collect") {
    val (_, df) = planted()
    val mu = Spectral.meanVector(df, "embedding")
    assert(mu.length === dim)
    val plan = Spectral.pcaProject(df, "vec_id", "embedding", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"projection must be one codegen scan, got:\n$plan")
  }

  test("standardize: probe rows z-scored against corpus-wide staged stats") {
    import spark.implicits._
    // dim 0 constant-ish spread 10 +- 2, dim 1 spread 0 +- 20
    val rows = (0 until 40).map { i =>
      val s0 = if (i % 2 == 0) 8.0f else 12.0f
      val s1 = if (i % 2 == 0) -20.0f else 20.0f
      (i.toLong, Seq(s0, s1))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Spectral.standardize(df, "vec_id", "embedding",
        col("vec_id") < 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    // mu0=10 sd0=2, mu1=0 sd1=20 -> vec 0 = (8,-20) -> (-1, -1);
    // vec 1 = (12, 20) -> (1, 1)
    assert(got === Map((0L, 0) -> -1.0, (0L, 1) -> -1.0,
      (1L, 0) -> 1.0, (1L, 1) -> 1.0))
  }

  test("correlation matrix: exact +-1 on linear columns, null on zero variance") {
    val df = (1 to 50).map { i =>
      (i.toDouble, 2.0 * i + 3.0, -1.0 * i, 7.0)
    }.toDF("x", "y", "z", "c")
    val got = Spectral.correlationMatrix(df, Seq("x", "y", "z", "c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(("x", "y")).contains(1.0))
    assert(got(("x", "z")).contains(-1.0))
    assert(got(("y", "z")).contains(-1.0))
    // constant column: zero variance -> null, for every pairing side
    assert(got(("x", "c")).isEmpty && got(("y", "c")).isEmpty
      && got(("z", "c")).isEmpty)
    assert(got.size === 6)
  }

  test("embedding drift: identical snapshots read cosine 1; a rotation reads lower") {
    val a = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.9f, 0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val same = Spectral.embeddingDrift(a, a, "embedding").head()
    assert(same.getDouble(2) === 1.0)
    assert(same.getDouble(3) === same.getDouble(4))
    // b points along y instead of x: mean cosine near 0
    val b = Seq(
      (3L, Seq(0.0f, 1.0f, 0.0f)), (4L, Seq(0.1f, 0.9f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rot = Spectral.embeddingDrift(a, b, "embedding").head()
    assert(rot.getLong(0) === 2L && rot.getLong(1) === 2L)
    assert(rot.getDouble(2) < 0.25, s"rotated means must decorrelate: $rot")
    // degenerate: a zero-mean side reads null cosine
    val z = Seq((5L, Seq(1.0f, 0.0f)), (6L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val deg = Spectral.embeddingDrift(z,
      Seq((7L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding"), "embedding")
      .head()
    assert(deg.isNullAt(2) && deg.getDouble(3) === 0.0)
  }

  test("correlation matrix: one scan, listwise deletion drops null rows") {
    val df = Seq(
      (Some(1.0), Some(1.0)), (Some(2.0), Some(4.0)),
      (Some(3.0), Some(9.0)), (None, Some(100.0)), (Some(100.0), None))
      .toDF("x", "y")
    val q = Spectral.correlationMatrix(df, Seq("x", "y"))
    val plan = q.queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size === 1,
      s"all stats must fold into one scan:\n$plan")
    // r over (1,1),(2,4),(3,9) only — the null rows must not leak in
    val n = 3.0; val sx = 6.0; val sy = 14.0; val sxx = 14.0
    val syy = 98.0; val sxy = 36.0
    val expect = math.floor((n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1e6 + 0.5) / 1e6
    assert(q.head().getDouble(2) === expect)
  }
}
