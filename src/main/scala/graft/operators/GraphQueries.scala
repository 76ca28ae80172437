package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph computation as repeated join+aggregate rounds — the
  * third convergence-loop shape in the engine next to dd08's
  * connected-components label fold and ivf03's Lloyd iterations.
  *
  * PageRank here runs a FIXED number of rounds in integer fixed-point
  * arithmetic (ranks scaled by 10^12, every division an integer
  * division), which buys two things at once:
  *  - cross-engine determinism: no floating-point sums whose
  *    accumulation order differs between Spark's shuffle and DuckDB's
  *    scan, so the oracle (the same three rounds unrolled as CTEs)
  *    hash-matches exactly;
  *  - order-independence inside Spark itself: BIGINT sums are exact
  *    whatever the partial-aggregation schedule.
  *
  * Scale shape: each round is one shuffle (groupBy dst) joined against
  * the static edge list; ranks are `localCheckpoint`ed per round so the
  * plan does not deepen with iteration count (dd08's pattern). The edge
  * list with out-degrees is computed once and reused by every round. At
  * cluster scale the edge list would be bucketed by src so the per-round
  * join never reshuffles the big side.
  */
object GraphQueries {
  private def q(name: String, doc: String, sql: String)(
      build: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, build, Some(sql), doc)

  private val SCALE = 1000000000000L // 10^12 fixed-point
  private val ITERS = 3

  /** Top-25 PageRank over the undirected customer↔supplier bipartite
    * graph induced by lineitem (who traded with whom). Damping 0.85 in
    * integer arithmetic: r' = base + 85·Σ(r_src div deg_src) div 100,
    * base = (SCALE div n)·15 div 100. */
  val gr01PageRank: GraftQuery = {
    def iterSql(i: Int): String = {
      val prev = s"r${i - 1}"
      s"""c$i AS (
         |  SELECT e.dst, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
         |  FROM edges e JOIN $prev r ON e.src = r.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT node, CAST(b + 85 * COALESCE(s, 0) // 100 AS BIGINT) AS r
         |  FROM nodes CROSS JOIN base LEFT JOIN c$i ON node = c$i.dst)""".stripMargin
    }
    q("gr01_pagerank",
      s"$ITERS-round fixed-point PageRank over the customer-supplier trade graph",
      s"""WITH eb AS (
         |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (
         |  SELECT c * 2 AS src, sp * 2 + 1 AS dst FROM eb
         |  UNION ALL
         |  SELECT sp * 2 + 1, c * 2 FROM eb),
         |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |params AS (SELECT COUNT(*) AS n FROM nodes),
         |base AS (SELECT CAST((($SCALE // n) * 15) // 100 AS BIGINT) AS b FROM params),
         |r0 AS (SELECT node, CAST($SCALE // n AS BIGINT) AS r FROM nodes, params),
         |${(1 to ITERS).map(iterSql).mkString(",\n")}
         |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
         |            ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,
         |  r AS rank_scaled FROM r$ITERS
         |ORDER BY rank_scaled DESC, node LIMIT 25""".stripMargin) { (s, d) =>
      val eb = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
        .distinct()
      // Nodes are BIGINT-encoded (customer = 2k, supplier = 2k+1):
      // long join keys shuffle and checkpoint at a fraction of the
      // string encoding's cost; labels decode only in the final 25 rows.
      val edges = eb.select(
          (col("c") * 2).as("src"), (col("sp") * 2 + 1).as("dst"))
        .unionByName(eb.select(
          (col("sp") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
        .localCheckpoint() // static across rounds: compute the join once
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val edgeDeg = edges.join(deg, "src").localCheckpoint()
      val nodes = edges.select(col("src").as("node")).distinct()
      val params = nodes.agg(count(lit(1)).as("n"))
      var ranks = nodes.crossJoin(broadcast(params))
        .select(col("node"), expr(s"$SCALE div n").as("r"))
        .localCheckpoint()
      for (_ <- 1 to ITERS) {
        // |V| ≪ |E|: the rank table broadcasts, so the big edge side
        // never shuffles for the join — the only per-round shuffle is
        // the partial+final contribution sum on dst. (At a scale where
        // ranks outgrow broadcast, the fallback is edges bucketed by
        // src joined to ranks co-partitioned the same way.)
        val contribs = edgeDeg
          .join(broadcast(ranks), col("src") === col("node"))
          .select(col("dst"), expr("r div deg").as("cb"))
          .groupBy("dst").agg(sum(col("cb")).as("s"))
        ranks = nodes.crossJoin(broadcast(params))
          .join(broadcast(contribs), col("node") === col("dst"), "left")
          .select(col("node"),
            (expr(s"($SCALE div n) * 15 div 100") +
              expr("85 * coalesce(s, 0) div 100")).as("r"))
          .localCheckpoint()
      }
      ranks.select(
          when(col("node") % 2 === 0,
            concat(lit("c"), expr("node div 2").cast("string")))
            .otherwise(concat(lit("s"), expr("node div 2").cast("string")))
            .as("node"),
          col("r").as("rank_scaled"))
        .orderBy(col("rank_scaled").desc, col("node")).limit(25)
    }
  }

  val all: Seq[GraftQuery] = Seq(gr01PageRank)
}
