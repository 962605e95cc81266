package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan regression guards: the performance story rests on specific
  * plan shapes (filters reaching the parquet scan, narrow read schemas,
  * broadcast joins for dimension-sized sides, TakeOrderedAndProject instead
  * of global sorts). A code change that silently loses one of these still
  * returns correct rows — only the plan shows the regression, so pin it. */
class PlanQualitySpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q01: predicates are pushed into the parquet scan and the read schema is pruned") {
    val p = planOf("q01_pruned_scan")
    assert(p.contains("PushedFilters: [IsNotNull"), s"no pushdown in:\n$p")
    // (the rendered PushedFilters list truncates, so assert the first entries)
    assert(p.contains("LessThan(l_shipdate"), s"shipdate filter not pushed:\n$p")
    // projection pruning: 16-column lineitem must not be read wholesale
    assert(!p.contains("l_comment"), s"read schema not pruned:\n$p")
  }

  test("q15 KNN: top-k via TakeOrderedAndProject, query vector broadcast, no sort-merge join") {
    val p = planOf("q15_knn_cosine")
    assert(p.contains("TakeOrderedAndProject"), s"global sort instead of top-k heap:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("Broadcast"),
      s"query row not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"KNN shuffled a sort-merge join:\n$p")
  }

  test("q03 multiway join: dimension tables broadcast, no cartesian product") {
    val p = planOf("q03_join_multiway")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast hash join in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product in:\n$p")
  }

  test("q02 aggregation: partial (map-side) aggregation before the exchange") {
    val p = planOf("q02_agg_pushdown")
    // two HashAggregates (partial + final) around one shuffle
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"no partial agg in:\n$p")
  }

  test("q06 top-k orders: limit+sort fuses to TakeOrderedAndProject") {
    val p = planOf("q06_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"global sort instead of top-k heap:\n$p")
  }
}
