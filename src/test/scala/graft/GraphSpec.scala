package graft

import org.scalatest.funsuite.AnyFunSuite

/** PageRank invariants beyond the oracle equality check. */
class GraphSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def gr01 = Registry.all.find(_.name == "gr01_pagerank").get

  test("pagerank top-25 is positive, descending, and deterministic across runs") {
    val a = gr01.build(spark, sf).collect().toSeq
    val b = gr01.build(spark, sf).collect().toSeq
    assert(a.size == 25)
    val ranks = a.map(_.getLong(1))
    assert(ranks.forall(_ > 0L))
    assert(ranks == ranks.sorted.reverse, "not descending")
    // Integer fixed-point makes the whole iteration exact, so two runs
    // must agree bit-for-bit despite different shuffle schedules.
    assert(a == b)
  }

  test("pagerank final top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = gr01.build(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }
}
