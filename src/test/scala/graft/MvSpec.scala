package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized-view rewrite ([[graft.plans.MvRewrite]]) must
  * (a) actually FIRE — the oracle compare alone can't distinguish a
  * served-from-MV plan from a silent fallback to the fact scan, since
  * both produce identical rows (that equivalence being the point) —
  * (b) roll up to coarser grains, (c) SELECT the right MV out of the
  * registered candidates by dims/measure coverage, (d) leave every
  * non-matching plan untouched (non-dim / non-deterministic /
  * subquery filters, non-derivable measures, non-dim groupings,
  * foreign-corpus fact tables), and (e) be exactly
  * semantics-preserving conf-on vs conf-off. */
class MvSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val flag = "spark.graft.mv.registry"
  private def q(name: String) = Registry.all.find(_.name == name).get

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("mv01: rewritten plan reads the fs summary table, never the fact scan") {
    val p = planOf(q("mv01_mv_rewrite").build(spark, sf))
    assert(p.contains("graft_mv_fs_"), "MV scan missing\n" + p.take(3000))
    assert(!p.contains("lineitem.parquet"),
      "fact scan must be replaced\n" + p.take(3000))
  }

  test("mv02: coarser-grain roll-up also serves from the MV (partial-state merge)") {
    val p = planOf(q("mv02_mv_rollup").build(spark, sf))
    assert(p.contains("graft_mv_fs_"), p.take(3000))
    assert(!p.contains("lineitem.parquet"), p.take(3000))
  }

  test("mv04: selection picks the date-grain MV, not the dashboard MV") {
    val p = planOf(q("mv04_mv_date_grain").build(spark, sf))
    assert(p.contains("graft_mv_date_"), "date MV must serve\n" + p.take(3000))
    assert(!p.contains("graft_mv_fs_"),
      "the 6-row fs MV cannot serve a ship-date grouping\n" + p.take(3000))
    assert(!p.contains("lineitem.parquet"), p.take(3000))
    // and the converse: mv01's grouping must NOT touch the date MV
    val p1 = planOf(q("mv01_mv_rewrite").build(spark, sf))
    assert(!p1.contains("graft_mv_date_"), p1.take(3000))
  }

  test("rewrite is exactly semantics-preserving: conf on vs off, identical rows") {
    def frame() = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        Det.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
    val reg = graft.operators.MvQueries.registryConf(spark, sf, "spec")
    spark.conf.set(flag, reg)
    val on = frame()
    assert(planOf(on).contains("graft_mv_fs_"), "pattern should rewrite")
    val onRows = on.collect().map(_.toSeq).toSeq
    spark.conf.unset(flag)
    try {
      val off = frame()
      assert(!planOf(off).contains("graft_mv_"))
      assert(onRows == off.collect().map(_.toSeq).toSeq,
        "MV-served result must be bit-identical to the fact scan")
    } finally spark.conf.set(flag, reg)
  }

  test("mv03: a dim-only predicate replays over the MV (filter commutes with grain agg)") {
    val df = q("mv03_mv_filtered").build(spark, sf)
    val p = planOf(df)
    assert(p.contains("graft_mv_fs_"), p.take(3000))
    assert(!p.contains("lineitem.parquet"), p.take(3000))
    // and the predicate actually survived onto the MV side
    assert(p.contains("l_returnflag"), "dim predicate must be replayed\n" + p.take(3000))
  }

  test("non-matching plans stay on the fact scan with the conf on") {
    spark.conf.set(flag, graft.operators.MvQueries.registryConf(spark, sf, "spec"))
    // (1) a NON-dim Filter between aggregate and scan disqualifies —
    // q01 filters on l_shipdate, which the fs MV pre-aggregated away
    // and which exceeds the date MV's measure coverage (sum_price)
    val q01 = planOf(q("q01_pricing_summary").build(spark, sf))
    assert(q01.contains("lineitem.parquet") && !q01.contains("graft_mv_"),
      "filtered aggregate must NOT be served from the unfiltered MV\n" + q01.take(3000))
    // (2) a measure the MV can't derive (distinct count)
    val p2 = planOf(Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n")))
    assert(p2.contains("lineitem.parquet") && !p2.contains("graft_mv_"), p2.take(3000))
    // (3) a grouping key outside every MV's dims
    val p3 = planOf(Tables.lineitem(spark, sf)
      .groupBy("l_linenumber")
      .agg(count(lit(1)).as("n")))
    assert(p3.contains("lineitem.parquet") && !p3.contains("graft_mv_"), p3.take(3000))
    // (4) a raw double SUM (not the exact-decimal Det form the MV stores)
    val p4 = planOf(Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("s")))
    assert(p4.contains("lineitem.parquet") && !p4.contains("graft_mv_"), p4.take(3000))
    // (5) a NON-DETERMINISTIC filter: replaying rand() over the 6-row
    // MV would sample GROUPS instead of fact rows — must disqualify
    // even though rand() references no columns at all
    val p5 = planOf(Tables.lineitem(spark, sf)
      .filter(rand(7) < 0.5)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n")))
    assert(p5.contains("lineitem.parquet") && !p5.contains("graft_mv_"), p5.take(3000))
    // (6) a filter carrying a subquery must not be replayed over the
    // MV: the OUTER aggregate stays on the fact scan. (The subquery's
    // own `SELECT DISTINCT l_linestatus` is a pure-grouping aggregate,
    // which the rule MAY serve from the MV — grain rows exist iff fact
    // rows exist, so that rewrite is exact; only the filtered outer
    // count must keep its fact scan.)
    Tables.lineitem(spark, sf).createOrReplaceTempView("mvspec_li")
    val p6 = planOf(spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n FROM mvspec_li
        |WHERE l_linestatus IN (SELECT DISTINCT l_linestatus FROM mvspec_li)
        |GROUP BY l_returnflag""".stripMargin))
    assert(p6.contains("lineitem.parquet"),
      "outer filtered aggregate must keep the fact scan\n" + p6.take(3000))
  }

  test("mv05: the incrementally-refreshed MV serves the full-fact aggregate") {
    val p = planOf(q("mv05_mv_incremental_refresh").build(spark, sf))
    assert(p.contains("graft_mv_inc_"),
      "refreshed MV must serve\n" + p.take(3000))
    assert(!p.contains("lineitem.parquet"), p.take(3000))
  }

  test("mv06: the stream-folded MV serves the full-fact aggregate") {
    val p = planOf(q("mv06_mv_streaming_refresh").build(spark, sf))
    assert(p.contains("graft_mv_stream_"),
      "stream-refreshed MV must serve\n" + p.take(3000))
    assert(!p.contains("lineitem.parquet"), p.take(3000))
  }

  test("a STALE registration (deleted MV file) degrades to the fact scan, never fails the query") {
    val s2 = spark.newSession()
    s2.conf.set(flag,
      s"/tmp/graft_mv_gone_${System.nanoTime()}|$sf/lineitem.parquet|" +
        "l_returnflag,l_linestatus|l_quantity:sum_qty")
    val df = Tables.lineitem(s2, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("lineitem.parquet") && !p.contains("graft_mv_"),
      "stale MV registration must fall back to the fact scan\n" + p.take(2000))
    assert(df.count() > 0, "and the query must still RUN")
  }

  test("a foreign corpus' fact table is NEVER served from this corpus' MV") {
    // registry built from sf0.001; the same aggregate over sf0.01's
    // lineitem must stay on its own fact scan — path identity, not
    // "any file named lineitem.parquet" (the multi-corpus JVM trap)
    spark.conf.set(flag, graft.operators.MvQueries.registryConf(spark, sf, "spec"))
    val p = planOf(Tables.lineitem(spark, "/root/testdata/sf0.01")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n")))
    assert(p.contains("lineitem.parquet") && !p.contains("graft_mv_"),
      "foreign fact table must not be served from another corpus' MV\n" + p.take(3000))
  }
}
