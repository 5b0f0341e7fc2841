package graft

import org.apache.spark.sql.functions._

/** Plan-SHAPE regression guards: the optimized physical shapes PERF.md
  * claims (scan pushdown, broadcast joins, window-group-limit pruning,
  * partial aggregation, no unbounded cartesian anywhere) asserted against
  * the actual planned query, so a refactor that silently loses one of
  * them fails CI instead of surfacing as a 100 TB surprise. Planning only
  * — `queryExecution.executedPlan` never runs the job (queries whose
  * CONSTRUCTION runs bounded actions — dim probes, curation counts — stay
  * cheap at sf0.001). */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    graft.plans.GraftExtensions.install(spark)
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
  }

  test("parquet scans push filters and prune columns (loader contract)") {
    val df = graft.sources.Testdata.table(spark, sf, "lineitem")
      .filter(col("l_quantity") > 10).select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,"),
      s"filter not pushed to parquet:\n$scan")
    // projection pruned to the two selected columns at the scan
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan reads more than the projection:\n$scan")
  }

  test("top-k plans prune: global TakeOrderedAndProject, per-group WindowGroupLimit") {
    // global top-k never sorts the full table
    assert(plan("q02_topk_orders").contains("TakeOrderedAndProject"),
      "q02 lost its TakeOrderedAndProject (full sort planned instead)")
    // per-group rank(<=k) prunes inside each partition before the window
    for (q <- Seq("q09_window_topn", "q58_source_cap"))
      assert(plan(q).contains("WindowGroupLimit"),
        s"$q lost its WindowGroupLimit pruning")
  }

  test("dimension enrich joins broadcast the small side") {
    for (q <- Seq("q05_left_join_missing", "q06_enriched_flags"))
      assert(plan(q).contains("BroadcastHashJoin"),
        s"$q does not broadcast its dimension side")
  }

  test("aggregates are partial+final (map-side combine before the exchange)") {
    // q65's grouping sets must also pre-combine map-side after the Expand
    for (q <- Seq("q07_kpi_daily", "q01_agg_pricing", "q65_corpus_report"))
      assert(plan(q).contains("partial_"),
        s"$q lost map-side partial aggregation")
  }

  test("no query plans an unbounded CartesianProduct") {
    // documented bounded cross joins (1-row agg combines, fixed-cardinality
    // broadcasts) plan as BroadcastNestedLoopJoin, never CartesianProduct
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = plan(name)
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct planned in: ${offenders.mkString(", ")}")
  }
}
