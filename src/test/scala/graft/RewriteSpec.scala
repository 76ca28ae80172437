package graft

import graft.plans.ApproxDistinctRewrite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected approx-distinct rule must be inert by default, rewrite
  * COUNT(DISTINCT) to the HLL++ sketch when the session opts in, and
  * land within the sketch's error bound of the exact answer. */
class RewriteSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"
  private val flag = "spark.graft.approxDistinct"

  private def ensureInstalled(): Unit =
    if (!spark.experimental.extraOptimizations.contains(ApproxDistinctRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxDistinctRewrite

  private def distinctOrders() =
    Tables.lineitem(spark, sf).agg(countDistinct(col("l_orderkey")).as("n"))

  test("inert by default: exact distinct, no sketch in the plan") {
    ensureInstalled()
    spark.conf.unset(flag)
    val df = distinctOrders()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("approx_count_distinct"), plan.take(2000))
    val exact = df.head().getLong(0)
    assert(exact == Tables.lineitem(spark, sf).select("l_orderkey").distinct().count())
  }

  test("opt-in: plan swaps to HLL++, answer within the sketch rsd") {
    ensureInstalled()
    val exact = distinctOrders().head().getLong(0)
    spark.conf.set(flag, "true")
    try {
      val df = distinctOrders()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        "rule did not rewrite the distinct aggregate\n" + plan.take(2000))
      assert(!plan.contains("Expand"), "sketch path must not need the Expand round")
      val approx = df.head().getLong(0)
      assert(math.abs(approx - exact).toDouble / exact < 0.1,
        s"approx $approx vs exact $exact drifted beyond the sketch bound")
    } finally spark.conf.unset(flag)
  }

  test("grouped distincts rewrite too, and group keys stay exact") {
    ensureInstalled()
    spark.conf.set(flag, "true")
    try {
      val rows = Tables.lineitem(spark, sf)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n"))
        .orderBy("l_returnflag")
        .collect()
      assert(rows.length == 3)
      assert(rows.forall(_.getLong(1) > 0))
    } finally spark.conf.unset(flag)
  }
}
