package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-plan shapes the 100 TB story depends on
  * (SCALING.md): filter/column pushdown into scans, broadcast joins for
  * dimensions, TakeOrderedAndProject for global top-k, partial+final
  * aggregation. A regression that silently turns one of these into a
  * full scan or an extra shuffle fails here, not in production. */
class PlanSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02: predicates and projection pushed to the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range not pushed")
    assert(!p.contains("l_returnflag"), "unused column not pruned from scan")
  }

  test("q05: dimension joins are broadcast hash joins") {
    val p = plan("q05_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dimension join must not shuffle-sort")
  }

  test("q04: global top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan("q04_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q01: aggregation is partial then final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate pair")
  }

  test("q06: only the fact-fact join may shuffle; dims broadcast") {
    val p = plan("q06_join_multiway")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(3000))
  }

  test("mm01: metadata query never reads the payload-bearing text column eagerly") {
    val p = plan("mm01_binary_meta")
    // text is needed (it IS the payload source here) but the scan must
    // read only doc_id + text, not lang/source/n_chars
    assert(!p.contains("n_chars"), "unused metadata columns must be pruned")
  }
}
