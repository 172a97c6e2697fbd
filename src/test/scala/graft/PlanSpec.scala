package graft

/** Plan-shape assertions (SURVEY "optimize for scale"): filters reach
  * the parquet scan, scans are column-pruned, tiny dims broadcast,
  * top-k compiles to TakeOrderedAndProject, and hot paths stay inside
  * whole-stage codegen.
  */
class PlanSpec extends SparkSuiteBase {

  private def plan(name: String): String =
    Queries.all(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q02 filter pushdown reaches the parquet scan") {
    val p = plan("q02_filter_predicates")
    assert(p.contains("PushedFilters: [IsNotNull(p_type)")
      && p.contains("Not(StringContains(p_type,BRAS"))
  }

  test("q01 scan is pruned to referenced columns") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_shipdate"), "projection-only query must not read l_shipdate")
  }

  test("q07 joins dims via broadcast with pruned scans") {
    val p = plan("q07_join_star")
    assert(p.contains("BroadcastHashJoin"))
    // lineitem scan pruned to the 3 referenced columns
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"))
  }

  test("q14 top-k compiles to TakeOrderedAndProject") {
    assert(plan("q14_topk").contains("TakeOrderedAndProject"))
  }

  test("q03 aggregate is partial+final (map-side combine)") {
    val p = plan("q03_agg_q1")
    assert(p.contains("partial_sum") || p.contains("Partial"))
  }

  test("q17 as-of join is one key shuffle + window, no join operator") {
    val p = plan("q17_asof_join")
    assert(p.contains("Window "))
    assert(!p.contains("Join"), "as-of must not plan a join")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1, s"expected exactly 1 key shuffle, got $hashExchanges")
  }
}
