package graft

/** Every registered query runs at sf0.001 and produces a stable,
  * non-degenerate result. The value-level correctness gate is the
  * DuckDB oracle (tools/check.py / the driver); this suite catches
  * runtime regressions fast.
  */
class QueriesSpec extends SparkSuiteBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a unique name and every oracle has a query") {
    val names = Queries.defs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(Queries.oracle.keySet.subsetOf(Queries.all.keySet))
  }

  Queries.defs.foreach { qd =>
    test(s"${qd.name} runs at sf0.001") {
      val df = qd.fn(spark, sfDir)
      val n = df.count()
      withClue(s"${qd.name} returned no rows: ") {
        assert(n > 0)
      }
    }
  }

  test("q45: Catalyst-decorrelated SQL text matches the fused engine plan") {
    // the oracle SQL (three correlated subqueries) run through
    // spark.sql — Catalyst decorrelates it — must produce exactly the
    // rows of the fused single-aggregate plan served by the engine
    Queries.registerViews(spark, sfDir)
    val viaSql = spark.sql(ExtendedQueries.subqSql).collect().toSeq
    val fused = Queries.all("q45_subqueries")(spark, sfDir).collect().toSeq
    assert(viaSql == fused)
  }

  test("deterministic re-run: q07_join_star identical across executions") {
    val a = Queries.all("q07_join_star")(spark, sfDir).collect().toSeq
    val b = Queries.all("q07_join_star")(spark, sfDir).collect().toSeq
    assert(a == b)
  }
}
