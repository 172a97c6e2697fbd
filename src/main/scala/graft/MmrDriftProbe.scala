package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the q162_mmr_select drift (VERDICT r14
  * "What's wrong #3": 2.06 → 3.16 s with no code change, reproduced in
  * fresh JVMs). mmrSelect is k sequential argmax jobs whose filter
  * expressions are LITERAL-HEAVY (a 64-term dot-product chain per
  * chosen vector — round 5 folds 4 of them under a greatest()), so the
  * suspects split cleanly:
  *
  *   - driver-side planning + whole-stage-codegen compile of a fresh
  *     few-hundred-node expression per round (literals differ per
  *     round ⇒ the codegen cache can never hit across rounds);
  *   - executor-side scan/eval of the 2000×64 frame (microseconds).
  *
  * The probe times each phase separately, then re-runs the HEAVIEST
  * round's identical job a second time (same literals ⇒ plan + codegen
  * cache hot): the delta first−second is the pure compile cost.
  *
  * RESOLVED (round 15): jstack sampling during the steady-state jobs
  * put the driver inside `Expression.genCode` /
  * `BinaryArithmetic.doGenCode` / janino `UnitCompiler.compile` on
  * EVERY job — whole-stage source generation + compile re-runs per
  * action (~2.5 s at dim=64, even for a byte-identical repeat job),
  * while `executedPlan` alone costs 0.04 s and a constant-size-
  * expression variant runs the same job in 0.12 s. The probe's A/B
  * below keeps both variants runnable. Fix: Coreset/Spectral now
  * compute literal-vector distances via the codegen'd loop
  * expressions in [[graft.plans.VecDistExprs]] (bit-identical
  * numerics; q162 2.26 s / q137 1.33 s / q134 1.21 s on the r15 box).
  * The r14 "drift with no code change" was this fixed cost moving
  * with the box's JIT/compiler throughput — the operator plan never
  * regressed, the per-job janino bill did.
  *
  * Usage: runMain graft.MmrDriftProbe [sfDir]
  */
object MmrDriftProbe {
  private def pr6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
  private def sqDist0(vecCol: Column, dim: Int): Column =
    (0 until dim).map { i =>
      val d = element_at(vecCol, i + 1).cast("double")
      d * d
    }.reduceLeft(_ + _)
  private def dotLit(vecCol: Column, c: Array[Double]): Column =
    c.indices.map(i =>
      element_at(vecCol, i + 1).cast("double") * lit(c(i)))
      .reduceLeft(_ + _)
  private def cosLit(vecCol: Column, normCol: Column,
      c: Array[Double]): Column = {
    val cn = math.sqrt(c.map(x => x * x).sum)
    pr6(dotLit(vecCol, c) / (normCol * lit(cn)))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same JIT warmup as Bench
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val (queryId, k, lambda) = (0L, 5, 0.7)
    for (rep <- 1 to 3) {
      println(s"== rep $rep")
      val all = Tables.embeddings(spark, sfDir)
        .select(col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<double>").as("v"))
      val qVec = t("head(query vec)") {
        all.where(col("id") === queryId).head().getSeq[Double](1).toArray
      }
      val bplan = all.where(col("id") =!= queryId)
        .withColumn("__n", sqrt(sqDist0(col("v"), qVec.length)))
        .where(col("__n") > 0)
        .withColumn("__qcos", cosLit(col("v"), col("__n"), qVec))
      // dissect: same frame through (a) noop write (pure compute),
      // (b) raw-column checkpoint (checkpoint mechanics alone),
      // (c) the real checkpoint, (d) its count
      t("plan only (executedPlan)") {
        bplan.queryExecution.executedPlan
      }
      t("noop write (no ckpt)") {
        bplan.write.format("noop").mode("overwrite").save()
      }
      t("noop write SAME frame again") {
        bplan.write.format("noop").mode("overwrite").save()
      }
      if (sys.env.contains("GRAFT_MMR_SPIN"))
        t("noop write x20 (jstack window)") {
          (1 to 20).foreach(_ =>
            bplan.write.format("noop").mode("overwrite").save())
        }
      // constant-size expression alternative: literal array + HOF
      val qlit = lit(qVec)
      val hof = all.where(col("id") =!= queryId)
        .withColumn("__n", sqrt(aggregate(
          transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
        .where(col("__n") > 0)
        .withColumn("__qcos", pr6(
          aggregate(zip_with(col("v"), qlit, (a, b) => a * b),
            lit(0.0), (a, x) => a + x) /
          (col("__n") * lit(math.sqrt(qVec.map(x => x * x).sum)))))
      t("HOF variant noop write") {
        hof.write.format("noop").mode("overwrite").save()
      }
      t("ckpt WITHOUT exprs") {
        all.where(col("id") =!= queryId).localCheckpoint().count()
      }
      val base = {
        val b = t("localCheckpoint(base)") { bplan.localCheckpoint() }
        t("count(base)") { b.count() }
        b
      }
      var chosen = List.empty[Long]
      var simCols = List.empty[Array[Double]]
      var lastJob: Option[() => Unit] = None
      for (round <- 1 to k) {
        val redundancy: Column =
          if (simCols.isEmpty) lit(0.0)
          else simCols.map(c => cosLit(col("v"), col("__n"), c))
            .reduceLeft(greatest(_, _))
        val score = pr6(lit(lambda) * col("__qcos") -
          lit(1.0 - lambda) * redundancy)
        val snap = chosen
        def job(): org.apache.spark.sql.Row =
          base.where(!col("id").isin(snap: _*))
            .agg(max(struct(score.as("s"), (-col("id")).as("nid"),
              col("v").as("v"))).as("m"))
            .head().getStruct(0)
        val top = t(s"round $round agg") { job() }
        if (round == k) lastJob = Some(() => { job(); () })
        chosen = -top.getLong(1) :: chosen
        simCols = top.getSeq[Double](2).toArray :: simCols
      }
      // identical literals => plan/codegen caches hot: the delta vs the
      // first execution above is pure driver-side compile cost
      lastJob.foreach(j => t(s"round $k agg AGAIN (hot)") { j() })
    }
    spark.stop()
  }
}
