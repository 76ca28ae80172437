package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The approx-distinct rule must be inert by default, rewrite
  * COUNT(DISTINCT) to the HLL++ sketch when the session opts in, and
  * land within the sketch's error bound of the exact answer.
  *
  * The session under test is [[TestSpark]]'s, built
  * `.withExtensions(new GraftExtensions)` — the rule arrives through
  * `injectOptimizerRule` (operator-optimization fixed-point batch,
  * which runs BEFORE RewriteDistinctAggregates), i.e. the exact
  * insertion point production users get, not a post-hoc
  * `experimental.extraOptimizations` approximation of it.
  */
class RewriteSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"
  private val flag = "spark.graft.approxDistinct"

  private def distinctOrders() =
    Tables.lineitem(spark, sf).agg(countDistinct(col("l_orderkey")).as("n"))

  test("inert by default: exact distinct, no sketch in the plan") {
    spark.conf.unset(flag)
    val df = distinctOrders()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("approx_count_distinct"), plan.take(2000))
    val exact = df.head().getLong(0)
    assert(exact == Tables.lineitem(spark, sf).select("l_orderkey").distinct().count())
  }

  test("opt-in: plan swaps to HLL++, answer within the sketch rsd") {
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

  test("two distincts on different columns: both rewrite, Expand round gone") {
    // exact multi-distinct is the worst case the rule exists for:
    // RewriteDistinctAggregates plans it as Expand (row replication
    // x #distincts) + double aggregation. With BOTH rewritten to
    // HLL++ the Expand disappears and one pass suffices — and because
    // the injected rule sits in the operator-optimization batch it
    // must win BEFORE RewriteDistinctAggregates ever sees the plan.
    val li = Tables.lineitem(spark, sf)
    def q() = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy("l_returnflag")
    spark.conf.unset(flag)
    val exactPlan = q().queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "precondition: exact multi-distinct should need Expand\n" + exactPlan.take(2000))
    val exact = q().collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.conf.set(flag, "true")
    try {
      val df = q()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Expand"),
        "both distincts rewritten => no Expand round\n" + plan.take(2000))
      assert("approx_count_distinct".r.findAllIn(plan).size >= 2,
        "expected BOTH aggregates sketched\n" + plan.take(2000))
      df.collect().foreach { r =>
        val (eo, ep) = exact(r.getString(0))
        assert(math.abs(r.getLong(1) - eo).toDouble / eo < 0.1, s"n_orders ${r.getString(0)}")
        assert(math.abs(r.getLong(2) - ep).toDouble / ep < 0.1, s"n_parts ${r.getString(0)}")
      }
    } finally spark.conf.unset(flag)
  }
}
