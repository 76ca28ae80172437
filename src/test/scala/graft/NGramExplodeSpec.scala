package graft

import graft.plans.VectorExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native ngram_explode Generator must agree exactly with the
  * composed explode(transform(sequence(...))) form it replaces, handle
  * the degenerate inputs (short array, empty, NULL) the way explode()
  * does, and resolve through both the Column API and SQL LATERAL VIEW.
  */
class NGramExplodeSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def composed(n: Int) = {
    // dc01/dd11's composition: materialize the gram array, posexplode it
    val toks = split(col("text"), " ")
    val grams = transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    posexplode(grams)
  }

  test("generator ≡ composed transform+posexplode on the corpus") {
    VectorExpressions.register(spark)
    val docs = Tables.documents(spark, sf)
    val native = docs.select(col("doc_id"),
        VectorExpressions.ngram_explode(split(col("text"), " "), 4))
      .select(col("doc_id"), col("pos"), col("gram"))
    val comp = docs.filter(size(split(col("text"), " ")) >= 4)
      .select(col("doc_id"), composed(4))
      .select(col("doc_id"), col("pos"), col("col").as("gram"))
    assert(native.count() > 0)
    assert(native.exceptAll(comp).count() == 0)
    assert(comp.exceptAll(native).count() == 0)
  }

  test("short, empty, and NULL arrays yield zero rows (explode semantics)") {
    val sp = spark
    VectorExpressions.register(sp)
    import sp.implicits._
    val df = Seq(
      (1, Some(Seq("a", "b"))),     // shorter than n
      (2, Some(Seq.empty[String])), // empty
      (3, None)                     // NULL array
    ).toDF("id", "toks")
    val out = df.select(col("id"),
      VectorExpressions.ngram_explode(col("toks"), 3))
    assert(out.count() == 0)
  }

  test("positions are 0-based and ordered; gram joins with single space") {
    val sp = spark
    VectorExpressions.register(sp)
    import sp.implicits._
    val df = Seq((1, Seq("w0", "w1", "w2", "w3"))).toDF("id", "toks")
    val rows = df.select(VectorExpressions.ngram_explode(col("toks"), 3))
      .orderBy("pos").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1))
    assert(rows.map(_.getString(1)).toSeq == Seq("w0 w1 w2", "w1 w2 w3"))
  }

  test("SQL LATERAL VIEW path through the function registry") {
    VectorExpressions.register(spark)
    Tables.documents(spark, sf).limit(20).createOrReplaceTempView("ng_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, pos, gram
        |FROM ng_docs
        |LATERAL VIEW ngram_explode(split(text, ' '), 4) t AS pos, gram
        |WHERE pos = 0""".stripMargin).collect()
    assert(viaSql.length == 20) // every doc has ≥4 tokens in this corpus
  }
}
