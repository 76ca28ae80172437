package graft.operators

import graft.{GraftQuery, Tables}
import graft.plans.VectorExpressions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF-style ANN: a coarse quantizer assigns every vector to its
  * nearest centroid (the inverted-file cell); a query probes only its
  * own cell. Complements the sign-bit LSH path (sm02/sm03) — IVF cells
  * adapt to the data distribution where LSH planes are fixed.
  *
  * Centroids here are deterministic (the first 16 vectors) instead of
  * k-means-trained — training is an offline concern; the engine-side
  * shapes (assignment join, cell-restricted probe) are what must scale:
  * the centroid table broadcasts, assignment is one narrow shuffle-free
  * pass, and search is an equi-join on cell id.
  */
object IvfQueries {

  import VectorSql.{sqlDot, sqlNorm2}

  private val CELLS = 16

  /** vectors × centroids cosine, argmax by (cosine desc, cid) —
    * shared SQL prefix of both queries. */
  private def sqlAssign: String =
    s"""centroids AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < $CELLS),
       |scored AS (
       |  SELECT v.vec_id, c.cid,
       |    ${sqlDot("v", "c")} / (SQRT(${sqlNorm2("v")}) * SQRT(${sqlNorm2("c")})) AS cos_c,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${sqlDot("v", "c")} / (SQRT(${sqlNorm2("v")}) * SQRT(${sqlNorm2("c")})) DESC, c.cid) AS rc
       |  FROM embeddings v CROSS JOIN centroids c),
       |assigned AS (SELECT vec_id, cid, cos_c FROM scored WHERE rc = 1)""".stripMargin

  /** Nearest-centroid assignment, computed map-side: the centroid set
    * collapses to ONE broadcast row holding a cid-sorted
    * `array<struct<cid, cemb>>`, and each vector picks its argmax with
    * a per-row `transform` + `array_max` loop — zero shuffle of the
    * corpus and no 16×-inflated pair set (the round-1 window-over-
    * crossJoin shape shuffled 16n rows to pick a per-row max). The
    * struct max is lexicographic (cos desc via max, ties → max of
    * -cid = smallest cid), exactly the oracle's ROW_NUMBER pick. */
  private def assignedDf(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    val e = Tables.embeddings(s, d)
    val centArr = e.filter(col("vec_id") < CELLS)
      .agg(sort_array(collect_list(struct(col("vec_id").as("cid"),
        col("embedding").as("cemb")))).as("cents"))
    e.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centArr))
      .withColumn("best", array_max(transform(col("cents"), c =>
        struct(
          VectorExpressions.cosine_similarity(col("embedding"), c.getField("cemb"))
            .as("cos_c"),
          (-c.getField("cid")).as("neg_cid"),
          c.getField("cid").as("cid")))))
      .select(col("vec_id"), col("embedding"),
        col("best.cid").as("cid"), col("best.cos_c").as("cos_c"))
  }

  private def q(name: String, doc: String, sql: String)(
      build: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, build, Some(sql), doc)

  /** Inverted-file cell histogram: assignment quality at a glance. */
  val ivf01Assign: GraftQuery = q(
    "ivf01_assign",
    "IVF coarse quantizer: nearest-centroid assignment histogram",
    s"""WITH $sqlAssign
       |SELECT cid, COUNT(*) AS n_vecs, MIN(vec_id) AS first_vec
       |FROM assigned GROUP BY cid ORDER BY cid""".stripMargin) { (s, d) =>
    assignedDf(s, d)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("first_vec"))
      .orderBy("cid")
  }

  /** Probe-1 search: queries scan only their own cell (equi-join on
    * cid) — the IVF scale shape; recall improves with multi-probe. */
  val ivf02Probe: GraftQuery = q(
    "ivf02_probe_search",
    "IVF ANN: probe-nearest-cell top-5 per query",
    s"""WITH $sqlAssign,
       |pairs AS (
       |  SELECT qa.vec_id AS query_id, ca.vec_id AS cand_id,
       |    ${sqlDot("q", "c")} / (SQRT(${sqlNorm2("q")}) * SQRT(${sqlNorm2("c")})) AS cosine
       |  FROM assigned qa JOIN embeddings q ON q.vec_id = qa.vec_id
       |  JOIN assigned ca ON ca.cid = qa.cid AND ca.vec_id <> qa.vec_id
       |  JOIN embeddings c ON c.vec_id = ca.vec_id
       |  WHERE qa.vec_id < 5),
       |ranked AS (
       |  SELECT query_id, cand_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, cand_id) AS BIGINT) AS rn
       |  FROM pairs)
       |SELECT query_id, cand_id, cosine, rn FROM ranked WHERE rn <= 5
       |ORDER BY query_id, rn""".stripMargin) { (s, d) =>
    val assigned = assignedDf(s, d)
    val qv = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("cid"))
    val cv = assigned.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), col("cid").as("ccid"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("cand_id"))
    broadcast(qv)
      .join(cv, col("cid") === col("ccid") && col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        VectorExpressions.cosine_similarity(col("qe"), col("ce")).as("cosine"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 5)
      .orderBy("query_id", "rn")
  }

  val all: Seq[GraftQuery] = Seq(ivf01Assign, ivf02Probe)
}
