package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized-view rewrite ([[graft.plans.MvRewrite]]) must
  * (a) actually FIRE — the oracle compare alone can't distinguish a
  * served-from-MV plan from a silent fallback to the fact scan, since
  * both produce identical rows (that equivalence being the point) —
  * (b) roll up to coarser grains, (c) leave every non-matching plan
  * untouched (filters, non-derivable measures, non-dim groupings), and
  * (d) be exactly semantics-preserving conf-on vs conf-off. */
class MvSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val flag = "spark.graft.mv.lineitemAgg"
  private def q(name: String) = Registry.all.find(_.name == name).get

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("mv01: rewritten plan reads the summary table, never the fact scan") {
    val p = planOf(q("mv01_mv_rewrite").build(spark, sf))
    assert(p.contains("graft_mv_"), "MV scan missing\n" + p.take(3000))
    assert(!p.contains("lineitem.parquet"),
      "fact scan must be replaced\n" + p.take(3000))
  }

  test("mv02: coarser-grain roll-up also serves from the MV (partial-state merge)") {
    val p = planOf(q("mv02_mv_rollup").build(spark, sf))
    assert(p.contains("graft_mv_"), p.take(3000))
    assert(!p.contains("lineitem.parquet"), p.take(3000))
  }

  test("rewrite is exactly semantics-preserving: conf on vs off, identical rows") {
    def frame() = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        Det.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
    spark.conf.set(flag, graft.operators.MvQueries.mvPath(spark, sf))
    val on = frame()
    assert(planOf(on).contains("graft_mv_"), "pattern should rewrite")
    val onRows = on.collect().map(_.toSeq).toSeq
    spark.conf.unset(flag)
    try {
      val off = frame()
      assert(!planOf(off).contains("graft_mv_"))
      assert(onRows == off.collect().map(_.toSeq).toSeq,
        "MV-served result must be bit-identical to the fact scan")
    } finally spark.conf.set(flag, graft.operators.MvQueries.mvPath(spark, sf))
  }

  test("mv03: a dim-only predicate replays over the MV (filter commutes with grain agg)") {
    val df = q("mv03_mv_filtered").build(spark, sf)
    val p = planOf(df)
    assert(p.contains("graft_mv_"), p.take(3000))
    assert(!p.contains("lineitem.parquet"), p.take(3000))
    // and the predicate actually survived onto the MV side
    assert(p.contains("l_returnflag"), "dim predicate must be replayed\n" + p.take(3000))
  }

  test("non-matching plans stay on the fact scan with the conf on") {
    spark.conf.set(flag, graft.operators.MvQueries.mvPath(spark, sf))
    // (1) a NON-dim Filter between aggregate and scan disqualifies —
    // q01 filters on l_shipdate, which the MV pre-aggregated away
    val q01 = planOf(q("q01_pricing_summary").build(spark, sf))
    assert(q01.contains("lineitem.parquet") && !q01.contains("graft_mv_"),
      "filtered aggregate must NOT be served from the unfiltered MV\n" + q01.take(3000))
    // (2) a measure the MV can't derive (distinct count)
    val p2 = planOf(Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n")))
    assert(p2.contains("lineitem.parquet") && !p2.contains("graft_mv_"), p2.take(3000))
    // (3) a grouping key outside the MV dims
    val p3 = planOf(Tables.lineitem(spark, sf)
      .groupBy("l_linenumber")
      .agg(count(lit(1)).as("n")))
    assert(p3.contains("lineitem.parquet") && !p3.contains("graft_mv_"), p3.take(3000))
    // (4) a raw double SUM (not the exact-decimal Det form the MV stores)
    val p4 = planOf(Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("s")))
    assert(p4.contains("lineitem.parquet") && !p4.contains("graft_mv_"), p4.take(3000))
  }
}
