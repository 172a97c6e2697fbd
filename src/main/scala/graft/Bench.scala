package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: absorb JIT/codegen/session init so the first timed query
    // isn't charged for it; best-effort — a broken sfDir must still
    // reach the per-query loop so the JSON line is emitted with -1s
    try {
      spark.range(1000000).selectExpr("sum(id)").write
        .format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/region.parquet").write
        .format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: $e")
    }
    // noop sink: forces full evaluation of every column (count() can
    // collapse a projection-only plan into a metadata-only scan).
    // Failures are reported as -1 in the JSON (not a plausible-looking
    // duration) and excluded from the total.
    //
    // Each query runs `reps` times and reports the MINIMUM: the gate
    // artifact should grade the plan, and a one-off GC pause or sort
    // spill in a single run must not read as a plan regression (the
    // round-2 gate recorded one 9x single-query outlier that a rerun
    // couldn't reproduce). The min is the standard steady-state
    // estimator for a fixed plan on a shared box.
    val reps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    // optional comma-separated subset for local iteration; the driver
    // sets nothing and benches everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def rep(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e")
          None
        }
      }
      val base = (1 to reps).flatMap(_ => rep())
      // contention guard: when the base reps disagree by >2x, the box
      // was loaded during at least one of them — run up to 2 extra
      // reps until the two FASTEST agree within 2x, so a contended
      // driver box can't record a 19s artifact for a 2s plan (the
      // round-3 q33/q47 distortion). Per-rep times are all emitted
      // ("reps") so a reader can see the spread either way.
      def unstable(ts: Seq[Double]): Boolean = {
        val s = ts.sorted
        s.size >= 2 && s(1) > 2.0 * s(0)
      }
      var times = base
      var extra = 0
      while (base.size == reps && extra < 2 && unstable(times)) {
        times = times ++ rep().toSeq
        extra += 1
      }
      // ANY failed rep reports -1: min-of-reps absorbs timing noise,
      // but a query that crashes intermittently is a failure signal
      // the gate must see, not average away
      name -> (if (times.size == reps + extra) times.min else -1.0, times)
    }.toMap
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val repJson = results.map { case (k, (_, ts)) =>
      s"\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.values.map(_._1).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$repJson,"sf":"$sfDir"}"""
    println(json)
    // also write the JSON to a file: the stdout line gets wrapped in
    // sbt [info]/log prefixes, which defeated the driver's parser in
    // round 1 (BENCH_r01.json "parsed": null)
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
      java.nio.file.Files.write(out,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] writing bench_out.json failed: $e")
    }
    spark.stop()
  }
}
