package graft

import graft.plans.TopKPerGroup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom TopK operator (logical node + strategy + two-stage
  * physical plan) must return exactly the rows the window idiom
  * returns, for deterministic (tie-broken) orderings. */
class TopKSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("custom TopK == window row_number idiom (per suppkey, k=3)") {
    val li = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    val order = struct(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val custom = TopKPerGroup.perGroup(li, Seq(col("l_suppkey")), order, k = 3)
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber").collect().toSeq
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").desc, col("l_linenumber").desc)
    val viaWindow = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber").collect().toSeq
    assert(custom == viaWindow)
    assert(custom.nonEmpty)
  }

  test("physical plan is partial TopK → exchange → final TopK (no sort)") {
    val li = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    val order = struct(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val df = TopKPerGroup.perGroup(li, Seq(col("l_suppkey")), order, k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert("(?m)^\\s*(\\+\\-|:\\-)? *TopK ".r.findAllIn(plan).size == 2,
      s"expected partial+final TopK stages:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"),
      "expected a clustered exchange between the stages")
    assert(!"(?m)^\\s*\\+\\- Sort ".r.findAllIn(plan).hasNext, "top-k must not sort")
  }

  test("ascending variant and k larger than group size") {
    val n = Tables.nation(spark, sf).select("n_nationkey", "n_name", "n_regionkey")
    val res = TopKPerGroup.perGroup(
      n, Seq(col("n_regionkey")), col("n_nationkey"), k = 100, desc = false)
    assert(res.count() == n.count()) // k ≥ group size keeps everything
    val top1 = TopKPerGroup.perGroup(
      n, Seq(col("n_regionkey")), col("n_nationkey"), k = 1, desc = false)
      .select("n_regionkey", "n_nationkey")
      .orderBy("n_regionkey").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val expected = n.groupBy("n_regionkey").agg(min("n_nationkey").as("mn"))
      .orderBy("n_regionkey").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(top1 == expected)
  }
}
