package graft.queries

import graft.{SparkFunSuite, SparkEntry}

/** Physical-plan audits (SURVEY.md §4): the properties that make these
  * plans survive a 100× scale-up are asserted here, so a regression in
  * pushdown / broadcast / top-k fusion fails the build, not just the bench.
  */
class PlanAuditSpec extends SparkFunSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02: filter and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), IsNotNull(l_shipdate), EqualTo(l_returnflag,R)"),
      s"filters not pushed:\n$p")
    // column pruning: scan reads only the 5 needed source columns
    // (4 projected + the filter column); the other 11 are pruned
    assert(p.contains("FileScan parquet [l_orderkey#"), s"unexpected scan shape:\n$p")
    assert(!p.contains("l_quantity") && !p.contains("l_tax") && !p.contains("l_suppkey"),
      s"columns not pruned:\n$p")
  }

  test("q09/q11: dimension joins are broadcast, not shuffled") {
    assert(plan("q09_trending").contains("BroadcastHashJoin"))
    val p11 = plan("q11_region_revenue")
    assert(p11.split("BroadcastHashJoin").length >= 4, // 3 dim joins
      s"expected 3 broadcast joins:\n$p11")
    assert(!p11.contains("SortMergeJoin"))
  }

  test("q17: ORDER BY + LIMIT fuses into TakeOrderedAndProject") {
    assert(plan("q17_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("q01: aggregation is partial+final hash aggregate (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.split("HashAggregate").length >= 3, s"expected partial+final:\n$p")
  }

  test("q06: latest-row window keeps a single exchange on the key") {
    val p = plan("q06_latest_event")
    assert(p.split("Exchange").length - 1 == 1, s"expected exactly 1 shuffle:\n$p")
  }

  test("q13: as-of join is one shuffle on the key (no cross/theta join)") {
    val p = plan("q13_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of join must not fall back to a product join:\n$p")
  }

  test("q24: shingle pair join is an equi-join with partial+final pair count") {
    val p = plan("q24_ngram_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair enumeration must stay an equi-join:\n$p")
    assert(p.split("HashAggregate").length >= 3, s"pair count must map-side combine:\n$p")
  }

  test("q26: native graft_dot expression is in the plan") {
    assert(plan("q26_cosine_topk").contains("graft_dot"))
  }

  test("q45: tf aggregate is partial+final; df comes from a token window, not a self-join") {
    val p = plan("q45_tfidf_top")
    assert(p.split("HashAggregate").length >= 3, s"expected partial+final aggs:\n$p")
    assert(p.contains("Window"), s"df_docs must come from the token window:\n$p")
    // the only join is the intentional 1-row corpus-size broadcast; a
    // SortMergeJoin would mean the tf⋈df self-join crept back in
    assert(!p.contains("SortMergeJoin"), s"tf frame must not be recomputed via a self-join:\n$p")
  }

  test("q59: raw-timestamp predicate prunes day partitions via the hidden-partitioning rewrite") {
    val p = plan("q59_layout_pruning")
    // the rewrite must surface ts_day bounds as PartitionFilters on the scan
    assert(p.contains("PartitionFilters") && p.contains("ts_day"),
      s"expected derived ts_day partition filters:\n$p")
    assert(p.contains("(ts_day") && p.contains(">= 2024-01-03") && p.contains("<= 2024-01-04"),
      s"expected day-grain bounds from the timestamp literals:\n$p")
  }

  test("q50: centroid cells join is broadcast; assignment is hash-agg + single argmin window") {
    val p = plan("q50_centroid_assign")
    assert(p.contains("BroadcastHashJoin"), s"centroid join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"assignment must not fall back to a product join:\n$p")
  }
}
