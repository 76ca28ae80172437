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

  test("hll registers merge by register-wise max, even on overlapping inputs") {
    import graft.operators.Hll
    val ev = Tables.events(spark, sf).select(col("event_type"), col("user_id"))
    // Overlapping halves: a duplicate-insensitive sketch must not care.
    val a = ev.filter(col("user_id") % 3 =!= 0)
    val b = ev.filter(col("user_id") % 3 =!= 1)
    val merged = Hll.registers(a, col("event_type"), col("user_id").cast("string"))
      .unionByName(Hll.registers(b, col("event_type"), col("user_id").cast("string")))
      .groupBy("gkey", "bucket").agg(max(col("mj")).as("mj"))
      .orderBy("gkey", "bucket").collect().toSeq
    val whole = Hll.registers(ev, col("event_type"), col("user_id").cast("string"))
      .orderBy("gkey", "bucket").collect().toSeq
    assert(merged == whole)
  }

  test("hll estimate lands within 3 standard errors of exact") {
    val m = graft.operators.Hll.M
    val rows = Registry.all.find(_.name == "hll02_oracle_distinct").get
      .build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val zeros = r.getLong(2)
      val raw = r.getDouble(4)
      // The query emits the RAW estimate plus n_zero; the standard
      // small-range linear-counting branch uses ln, which is not
      // bit-reproducible cross-engine, so it is applied client-side.
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else raw
      val se = 1.04 / math.sqrt(m.toDouble) // ~13% for m=64
      assert(math.abs(est - exact) <= 3 * se * exact + 1,
        s"${r.getString(0)}: est $est (raw $raw) vs exact $exact")
    }
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
