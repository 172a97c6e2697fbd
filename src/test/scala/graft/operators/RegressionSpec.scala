package graft.operators

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the closed-form regression operators:
  * OLS recovering exact planted coefficients (zero residual ⇒ R²=1),
  * the collinear-NULL guard, and the isotonic minimax fit against
  * the classic pooled-violator example plus the monotone invariant.
  */
class RegressionSpec extends SparkSuiteBase {

  test("olsFit: recovers an exact plane with R2 = 1") {
    import spark.implicits._
    // y = 2 + 3·x1 − 1·x2, exact in micro units
    val rows = for (x1 <- 0L to 4L; x2 <- 0L to 3L)
      yield (x1, x2, (2L + 3L * x1 - x2) * 1000000L)
    val r = Regression.olsFit(rows.toDF("x1", "x2", "ym"),
      "ym", "x1", "x2").head()
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("beta0_6") == 2.0)
    assert(r.getAs[Double]("beta1_6") == 3.0)
    assert(r.getAs[Double]("beta2_6") == -1.0)
    assert(r.getAs[Double]("r2_6") == 1.0)
  }

  test("olsFit: collinear features read NULL betas") {
    import spark.implicits._
    // x2 = 2·x1 exactly → singular Gram matrix
    val rows = (0L to 9L).map(i => (i, 2L * i, i * 1000000L))
    val r = Regression.olsFit(rows.toDF("x1", "x2", "ym"),
      "ym", "x1", "x2").head()
    assert(r.isNullAt(r.fieldIndex("beta0_6")))
    assert(r.isNullAt(r.fieldIndex("r2_6")))
  }

  test("olsFit: constant y reads R2 NULL (SST = 0), betas defined") {
    import spark.implicits._
    val rows = (0L to 9L).map(i => (i, (i * i) % 7, 5000000L))
    val r = Regression.olsFit(rows.toDF("x1", "x2", "ym"),
      "ym", "x1", "x2").head()
    assert(r.getAs[Double]("beta0_6") == 5.0)
    assert(r.getAs[Double]("beta1_6") == 0.0)
    assert(r.isNullAt(r.fieldIndex("r2_6")))
  }

  test("isotonicFit: pools the classic violator") {
    import spark.implicits._
    // means by bin: 1, 3, 2, 4 → bins 2,3 pool to 2.5; unit weights
    val bins = Seq((0L, 1L, 1000000L), (1L, 1L, 3000000L),
      (2L, 1L, 2000000L), (3L, 1L, 4000000L))
      .toDF("bin", "n", "s")
    val out = Regression.isotonicFit(bins, "bin", "n", "s")
      .orderBy(col("bin")).collect()
    assert(out.map(_.getAs[Double]("fitted6")).toSeq ==
      Seq(1.0, 2.5, 2.5, 4.0))
    assert(out.map(_.getAs[Double]("mean6")).toSeq ==
      Seq(1.0, 3.0, 2.0, 4.0))
  }

  test("isotonicFit: weighted pool + monotone invariant") {
    import spark.implicits._
    // bin1 mean 4 (w=3), bin2 mean 1 (w=1) → pooled (12+1)/4 = 3.25
    val bins = Seq((0L, 1L, 0L), (1L, 3L, 12000000L),
      (2L, 1L, 1000000L), (3L, 2L, 10000000L))
      .toDF("bin", "n", "s")
    val out = Regression.isotonicFit(bins, "bin", "n", "s")
      .orderBy(col("bin")).collect()
    val fit = out.map(_.getAs[Double]("fitted6")).toSeq
    assert(fit == Seq(0.0, 3.25, 3.25, 5.0))
    assert(fit == fit.sorted, "isotonic fit must be non-decreasing")
  }

  test("isotonicFit: already-monotone input is returned unchanged") {
    import spark.implicits._
    val bins = (0L to 5L).map(b => (b, 2L, (b * 2L + 1L) * 2000000L))
      .toDF("bin", "n", "s")
    val out = Regression.isotonicFit(bins, "bin", "n", "s")
      .orderBy(col("bin")).collect()
    assert(out.forall(r =>
      r.getAs[Double]("fitted6") == r.getAs[Double]("mean6")))
  }

  test("groupedOls: exact line per key, degenerate keys read NULL") {
    import spark.implicits._
    val rows = Seq(
      // key a: y = 2 + 3x exactly (micro units) → r2 = 1
      ("a", 0L, 2000000L), ("a", 1L, 5000000L), ("a", 2L, 8000000L),
      // key b: constant y → slope 0, r2 NULL (SST = 0)
      ("b", 0L, 4000000L), ("b", 1L, 4000000L),
      // key c: single point → NULL fit
      ("c", 5L, 1000000L),
      // key d: constant x → den = 0 → NULL fit
      ("d", 3L, 1000000L), ("d", 3L, 2000000L))
      .toDF("k", "x", "ym")
    val got = Regression.groupedOls(rows, "k", "x", "ym")
      .orderBy("k").collect()
    val a = got(0)
    assert(a.getAs[Double]("slope6") == 3.0 &&
      a.getAs[Double]("intercept6") == 2.0 &&
      a.getAs[Double]("r2_6") == 1.0, s"got $a")
    val b = got(1)
    assert(b.getAs[Double]("slope6") == 0.0 &&
      b.getAs[Double]("intercept6") == 4.0 &&
      b.isNullAt(b.fieldIndex("r2_6")))
    assert(got(2).isNullAt(got(2).fieldIndex("slope6")))
    assert(got(3).isNullAt(got(3).fieldIndex("slope6")))
  }

  test("logisticFit: separable-by-x1 fixture classifies perfectly") {
    import spark.implicits._
    // y = (x1 >= 2); x2 varies but carries no signal
    val rows = for {
      x1 <- 0L to 3L; x2 <- 0L to 1L; _ <- 1 to 2
    } yield (x1 >= 2L, x1, x2)
    val df = rows.toDF("y", "x1", "x2")
    val r = Regression.logisticFit(df, "y", "x1", "x2", steps = 3).head()
    assert(r.getAs[Long]("n") == 16L && r.getAs[Long]("n_pos") == 8L)
    val b1 = r.getAs[Double]("beta1_6")
    assert(b1 > 0.5, s"x1 must carry the signal, got b1=$b1")
    // x2 coefficient stays near zero; the eta>0 cut separates exactly
    assert(math.abs(r.getAs[Double]("beta2_6")) < 0.1)
    assert(r.getAs[Double]("acc6") == 1.0)
    // every beta sits on the 1e-6 grid (per-round snap discipline)
    Seq("beta0_6", "beta1_6", "beta2_6").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v == math.floor(v * 1e6 + 0.5) / 1e6, s"$c off-grid: $v")
    }
  }

  test("logisticFit: no-signal balanced input keeps beta at 0") {
    import spark.implicits._
    // every (x1, x2) cell holds one positive and one negative:
    // all residual moments are exactly 0 and Newton never moves
    val rows = for { x1 <- 0L to 2L; x2 <- 0L to 1L; y <- Seq(true, false) }
      yield (y, x1, x2)
    val r = Regression.logisticFit(rows.toDF("y", "x1", "x2"),
      "y", "x1", "x2", steps = 3).head()
    assert(r.getAs[Double]("beta0_6") == 0.0 &&
      r.getAs[Double]("beta1_6") == 0.0 &&
      r.getAs[Double]("beta2_6") == 0.0)
    // eta = 0 everywhere → predicted negative → half correct
    assert(r.getAs[Double]("acc6") == 0.5)
  }

  test("logisticFit: constant feature reads NULL betas, counts kept") {
    import spark.implicits._
    val df = Seq((true, 1L, 5L), (false, 2L, 5L), (true, 3L, 5L),
      (false, 4L, 5L)).toDF("y", "x1", "x2")
    val r = Regression.logisticFit(df, "y", "x1", "x2", steps = 2).head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_pos") == 2L)
    assert(r.isNullAt(r.fieldIndex("beta0_6")))
    assert(r.isNullAt(r.fieldIndex("acc6")))
  }

  test("logisticFit: determinism across runs") {
    import spark.implicits._
    val rows = (0 until 40).map(i =>
      (i % 3 == 0, (i % 7).toLong, (i % 5).toLong))
    val df = rows.toDF("y", "x1", "x2")
    val a = Regression.logisticFit(df, "y", "x1", "x2", 3).head()
    val b = Regression.logisticFit(df, "y", "x1", "x2", 3).head()
    assert(a == b)
  }
}
