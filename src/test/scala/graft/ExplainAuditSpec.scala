package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the properties that make these queries
  * survive a 100x scale-up, asserted on the optimized physical plan.
  */
class ExplainAuditSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q02 filter+projection reach the parquet scan (pushdown)") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), s"no pushed filters:\n$p")
  }

  test("q38 ANN probe broadcasts only the single-vector query side") {
    val p = plan("q38_ann_lsh")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"query side should broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$p")
  }

  test("q28 shuffles on band keys, broadcasts signature screen") {
    val p = plan("q28_neardup_pairs")
    assert(p.contains("BroadcastHashJoin"), s"sig screen should broadcast:\n$p")
  }

  test("q37 window agg is partial+final (no extra shuffle)") {
    val p = plan("q37_event_tumbling")
    // two HashAggregates (partial, final) around ONE exchange for the window group
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"expected partial+final agg:\n$p")
  }

  test("q01 agg is partial+final with scan-level filter") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate filter must reach the scan:\n$p")
  }
}
