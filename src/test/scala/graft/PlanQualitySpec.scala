package graft

/** Physical-plan regression guards: the properties that make these
  * operators scale (pushdown, pruning, broadcast, top-k, codegen) must be
  * visible in the executed plan — not assumed (SURVEY.md §4).
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  /** AQE finalizes (and annotates codegen stages in) the plan only after
    * execution — run the query, then read the final plan. */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("scan projection prunes columns at the parquet reader") {
    val p = plan("q_scan_project")
    assert(p.contains("ReadSchema"))
    // only the 6 projected columns reach the scan — not all 11 lineitem cols
    assert(!p.contains("l_returnflag"), "unprojected column leaked into scan")
  }

  test("compound filter pushes predicates into the parquet scan") {
    val p = plan("q_filter_pred")
    assert(p.contains("PushedFilters") &&
      (p.contains("GreaterThan") || p.contains("LessThan") || p.contains("In(")),
      s"no pushed predicates in:\n$p")
  }

  test("star join broadcasts the dimension tables") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("theta join keeps the equi key (hash/SMJ + residual range, no cartesian)") {
    val p = plan("q_join_theta")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"range join degenerated:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("order-by + limit plans as TakeOrderedAndProject (bounded heap)") {
    val p = plan("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), s"global sort materialized:\n$p")
  }

  test("semi/anti joins never multiply rows") {
    assert(plan("q_join_semi").contains("LeftSemi"))
    assert(plan("q_join_anti").contains("LeftAnti"))
  }

  test("aggregations run partial+final (map-side combine before shuffle)") {
    val p = plan("q_agg_groupby")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      s"no partial aggregation:\n$p")
  }

  test("whole-stage codegen covers the hot paths, including vec_dot") {
    // "*(n)" prefixes mark whole-stage-codegen stages in the final plan
    assert(executedPlan("q_agg_groupby").contains("*("))
    val sim = executedPlan("q_sim_topk")
    assert(sim.contains("*("))
    assert(sim.contains("dotproduct"), "vec_dot not in the plan")
    // Spark pushed the per-group top-k below the shuffle
    assert(sim.contains("WindowGroupLimit"))
  }

  test("similarity join is blocked (broadcast of the query side, no cartesian)") {
    val p = plan("q_sim_topk")
    assert(p.contains("BroadcastHashJoin"), s"expected blocked broadcast join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }
}
