package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-family invariants the DuckDB oracle can't express:
  * Count-Min's overestimate-only guarantee and its mergeability
  * (sketch(A ∪ B) = sketch(A) + sketch(B) cell-wise — the property
  * that makes a distributed build a plain partial+final aggregation). */
class SketchSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val DEPTH = 3
  private val WIDTH = 64

  private def bucket(j: Int, t: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(s"$j:"), t)), 1, 8), 16, 10)
      .cast(LongType) % WIDTH

  private def sketchOf(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("term"))
      .select(explode(array((0 until DEPTH).map(j =>
        struct(lit(j).as("row_j"), bucket(j, col("term")).as("bucket"))): _*)).as("e"))
      .select(col("e.row_j").as("row_j"), col("e.bucket").as("bucket"))
      .groupBy("row_j", "bucket").agg(count(lit(1)).as("c"))

  test("count-min estimates never undercount") {
    val rows = Registry.all.find(_.name == "cm01_countmin").get
      .build(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) >= 0L),
      "CMS must be overestimate-only: " +
        rows.filter(_.getLong(3) < 0L).mkString(", "))
  }

  test("count-min sketches merge by cell-wise addition") {
    val docs = Tables.documents(spark, sf)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = sketchOf(a).unionByName(sketchOf(b))
      .groupBy("row_j", "bucket").agg(sum(col("c")).as("c"))
      .orderBy("row_j", "bucket").collect().toSeq
    val whole = sketchOf(docs)
      .orderBy("row_j", "bucket").collect().toSeq
    assert(merged == whole)
  }
}
