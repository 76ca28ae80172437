package graft.operators

import graft.{Det, GraftQuery, Phases, Scratch, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query faces for the transparent materialized-view rewrite
  * ([[graft.plans.MvRewrite]], injected via GraftExtensions).
  *
  * mv01 hits the MV at its exact grain; mv02 ROLLS UP to a coarser
  * grain (l_returnflag only), proving the rewrite is algebraic — it
  * merges partial states (SUM of counts, SUM of partial sums) rather
  * than memoizing one query's answer. Both oracles aggregate the raw
  * fact table directly in DuckDB, so the driver's hash compare is
  * exactly the MV-consistency property: rewritten plan ≡ fact scan.
  *
  * The summary table is built once per (JVM, sf-dir) into a Scratch
  * dir (6 rows: the returnflag × linestatus grain, with cnt/sum_qty/
  * sum_price partial states); `spark.graft.mv.lineitemAgg` then opts
  * the session into the rewrite. The conf is set by the query build
  * and stays on for the session — safe by construction, because the
  * rule only fires on plans whose rewrite is semantics-preserving
  * (PlanSpec pins that q01's filtered aggregate is untouched with the
  * conf set). The MV build itself clears the conf while writing: its
  * own aggregate matches the rewrite pattern, and in a multi-corpus
  * JVM a stale conf from another sf-dir must not feed the new MV.
  * Freshness/invalidation on fact-table updates is out of scope for a
  * static corpus (a production deployment would tie the conf to the
  * table's snapshot version). */
object MvQueries {
  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build-once-per-(JVM, sf-dir) summary table; returns its path. */
  def mvPath(s: SparkSession, d: String): String =
    built.computeIfAbsent(d, _ => {
      val p = Scratch.dir("graft_mv_")
      val prev = s.conf.getOption("spark.graft.mv.lineitemAgg")
      s.conf.unset("spark.graft.mv.lineitemAgg")
      try Phases.timed("mv01_mv_rewrite", "setup_write") {
        Tables.lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"),
            sum(Det.dec2(col("l_quantity"))).as("sum_qty"),
            sum(Det.dec2(col("l_extendedprice"))).as("sum_price"))
          .coalesce(1) // 6-row grain: one file
          .write.mode("overwrite").parquet(p)
      } finally prev.foreach(v => s.conf.set("spark.graft.mv.lineitemAgg", v))
      p
    })

  private def withMv(s: SparkSession, d: String): Unit =
    s.conf.set("spark.graft.mv.lineitemAgg", mvPath(s, d))

  val mv01Rewrite: GraftQuery = GraftQuery(
    "mv01_mv_rewrite",
    (s: SparkSession, d: String) => {
      withMv(s, d)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
           |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "transparent materialized-view rewrite: fact-table aggregate served from the 6-row summary")

  val mv02Rollup: GraftQuery = GraftQuery(
    "mv02_mv_rollup",
    (s: SparkSession, d: String) => {
      withMv(s, d)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n_rows,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
    "MV roll-up: coarser-grain aggregate merged from the MV's partial states")

  val mv03FilteredRollup: GraftQuery = GraftQuery(
    "mv03_mv_filtered",
    (s: SparkSession, d: String) => {
      withMv(s, d)
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") =!= "A")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_linestatus")
    },
    Some("""SELECT l_linestatus, COUNT(*) AS n_rows,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
           |FROM lineitem WHERE l_returnflag <> 'A'
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    "MV rewrite under a dim-only predicate: the filter selects whole groups, so it replays over the MV")

  val all: Seq[GraftQuery] = Seq(mv01Rewrite, mv02Rollup, mv03FilteredRollup)
}
