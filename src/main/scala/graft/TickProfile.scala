package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (optimization rounds): run one incremental-index
  * append tick with a job listener and print every Spark job's call
  * site + wall duration — the attribution the UI would give if it were
  * enabled. Targets the q75/q80 bench shape (the 20% fixture delta)
  * so the fixed-job budget of a tick is visible line by line.
  *
  * Usage: TickProfile [dedup|curation|ann|pq] — default dedup.
  */
object TickProfile {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("dedup")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]
    var enabled = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // the action's call site is the job's LAST stage's name
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (enabled && s != null)
          rows.add((je.jobId, (System.nanoTime() - s._1) / 1e9, s._2))
      }
    })
    val docs = Tables.documents(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("tickprof").toString

    def profiled(label: String)(body: => Unit): Unit = {
      // settle listener queue, then time
      Thread.sleep(500); rows.clear(); enabled = true
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500); enabled = false
      println(f"== $label: wall $wall%.2f s")
      val it = rows.iterator()
      var sum = 0.0
      while (it.hasNext) {
        val (id, dur, site) = it.next()
        sum += dur
        println(f"  job $id%4d  $dur%7.3f s  $site")
      }
      println(f"  (sum of job durations $sum%.2f s; gaps = driver/planning)")
    }

    which match {
      case "dedup" =>
        operators.IncrementalDedup.buildIndex(
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          "doc_id", "text", "lang", n = 3, threshold = 0.8,
          maxShingleDocFreq = 1000, dir = s"$root/base")
        val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        // rep 1 untimed (JIT), reps 2-3 profiled
        operators.IncrementalDedup.append(delta, "doc_id", "text", "lang",
          s"$root/base", s"$root/out0").labels
          .write.format("noop").mode("overwrite").save()
        (1 to 2).foreach { i =>
          profiled(s"dedup append rep $i") {
            operators.IncrementalDedup.append(delta, "doc_id", "text",
              "lang", s"$root/base", s"$root/out$i").labels
              .write.format("noop").mode("overwrite").save()
          }
        }
      case "curation" =>
        operators.IncrementalCuration.buildIndex(
          docs.filter(pmod(col("doc_id"), lit(20)) =!= 0
            && pmod(col("doc_id"), lit(5)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(20)) === 0),
          "doc_id", "text", "lang", Seq("the", "a"), dir = s"$root/base")
        val delta = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0
          && pmod(col("doc_id"), lit(5)) === 0)
        operators.IncrementalCuration.append(delta, "doc_id", "text",
          "lang", s"$root/base", s"$root/out0")
          .write.format("noop").mode("overwrite").save()
        (1 to 2).foreach { i =>
          profiled(s"curation append rep $i") {
            operators.IncrementalCuration.append(delta, "doc_id", "text",
              "lang", s"$root/base", s"$root/out$i")
              .write.format("noop").mode("overwrite").save()
          }
        }
      case "ann" | "pq" =>
        val emb = Tables.embeddings(spark, sfDir)
        val ebase = emb.filter(pmod(col("vec_id"), lit(100)) =!= 0)
        val edelta = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
        val cells = operators.Similarity.autoCells(ebase.count())
        if (which == "ann") {
          operators.SimilarityIndex.buildIvf(ebase, "vec_id", "embedding",
            cells, s"$root/base")
          operators.SimilarityIndex.appendIvf(edelta, "vec_id",
            "embedding", s"$root/base", s"$root/out0")
          (1 to 2).foreach { i =>
            profiled(s"ann append rep $i (cells=$cells)") {
              operators.SimilarityIndex.appendIvf(edelta, "vec_id",
                "embedding", s"$root/base", s"$root/out$i")
            }
          }
        } else {
          operators.SimilarityIndex.buildIvfPq(ebase, "vec_id", "embedding",
            cells, numSub = 4, numCentroids = 16, dir = s"$root/base")
          operators.SimilarityIndex.appendIvfPq(edelta, "vec_id",
            "embedding", s"$root/base", s"$root/out0")
          (1 to 2).foreach { i =>
            profiled(s"pq append rep $i (cells=$cells)") {
              operators.SimilarityIndex.appendIvfPq(edelta, "vec_id",
                "embedding", s"$root/base", s"$root/out$i")
            }
          }
        }
      case "q224" =>
        // piecewise attribution of the link-prediction rep: edge memo
        // mine vs linkPredict stages vs final order
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val edges = Tables.orders(spark, sfDir)
            .join(Tables.lineitem(spark, sfDir),
              col("l_orderkey") === col("o_orderkey"))
            .join(Tables.customer(spark, sfDir)
              .filter(col("c_mktsegment") === "BUILDING"),
              col("c_custkey") === col("o_custkey"))
            .select((lit(2L) * col("o_custkey")).as("id_a"),
              (lit(2L) * col("l_partkey") + lit(1L)).as("id_b"))
            .distinct()
            .localCheckpoint(true)
          val t1 = System.nanoTime()
          val lp = operators.GraphOps.linkPredict(edges, "id_a", "id_b",
            maxDeg = 64)
          lp.filter(col("cn") >= 2)
            .orderBy(col("id_a"), col("id_b"))
            .write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          println(f"q224 rep $i: memo ${(t1 - t0) / 1e9}%.2f s, " +
            f"predict+order ${(t2 - t1) / 1e9}%.2f s")
        }
      case "q224b" =>
        // experiment: self-join wedge mine (linkPredict's shape) vs
        // adjacency-ARRAY enumeration (groupBy collect_list + double
        // explode) — one exchange of `kept` instead of two + no SMJ
        // sort, same wedge multiset. Result equality asserted.
        val edges = Tables.orders(spark, sfDir)
          .join(Tables.lineitem(spark, sfDir),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(spark, sfDir)
            .filter(col("c_mktsegment") === "BUILDING"),
            col("c_custkey") === col("o_custkey"))
          .select((lit(2L) * col("o_custkey")).as("id_a"),
            (lit(2L) * col("l_partkey") + lit(1L)).as("id_b"))
          .distinct()
          .localCheckpoint(true)
        // the pre-r17 self-join wedge mine, kept inline as the
        // reference arm (production linkPredict IS the array mine now)
        def selfJoinPredict(): org.apache.spark.sql.DataFrame = {
          val ed = edges.filter(col("id_a") =!= col("id_b"))
            .select(least(col("id_a"), col("id_b")).as("__a"),
              greatest(col("id_a"), col("id_b")).as("__b"))
            .localCheckpoint(true)
          val adj = ed.select(col("__a").as("__w"), col("__b").as("__u"))
            .unionByName(ed.select(col("__b").as("__w"), col("__a").as("__u")))
          val deg = adj.groupBy(col("__w")).agg(count(lit(1)).as("__dw"))
          val kept = adj.join(deg, Seq("__w")).filter(col("__dw") <= 64)
            .localCheckpoint(true)
          val wedges = kept.select(col("__w"), col("__u").as("__ua"),
              col("__dw"))
            .join(kept.select(col("__w"), col("__u").as("__ub")), Seq("__w"))
            .filter(col("__ua") < col("__ub"))
            .select(col("__ua"), col("__ub"), col("__dw"))
          val cand = wedges.groupBy(col("__ua"), col("__ub"))
            .agg(count(lit(1)).as("cn"),
              sum(floor(lit(1e6) / col("__dw").cast("double") + lit(0.5))
                .cast("long")).as("__ram"))
          cand.join(ed,
              cand("__ua") === ed("__a") && cand("__ub") === ed("__b"),
              "left_anti")
            .select(col("__ua").as("id_a"), col("__ub").as("id_b"),
              col("cn"), (col("__ram").cast("double") / lit(1e6)).as("ra6"))
        }
        val want = selfJoinPredict()
          .filter(col("cn") >= 2).orderBy(col("id_a"), col("id_b")).collect()
        val got = operators.GraphOps.linkPredict(edges, "id_a", "id_b",
            maxDeg = 64, pairsNormalized = true)
          .filter(col("cn") >= 2).orderBy(col("id_a"), col("id_b")).collect()
        require(want.sameElements(got),
          s"array wedge mine diverges: ${want.length} vs ${got.length} rows")
        println(s"== equality ok (${want.length} rows)")
        (1 to 3).foreach { i =>
          profiled(s"self-join arm rep $i") {
            selfJoinPredict()
              .filter(col("cn") >= 2).orderBy(col("id_a"), col("id_b"))
              .write.format("noop").mode("overwrite").save()
          }
        }
        (1 to 3).foreach { i =>
          profiled(s"array arm rep $i") {
            operators.GraphOps.linkPredict(edges, "id_a", "id_b",
                maxDeg = 64, pairsNormalized = true)
              .filter(col("cn") >= 2).orderBy(col("id_a"), col("id_b"))
              .write.format("noop").mode("overwrite").save()
          }
        }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
