package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("trigramsFast yields empty (not nonsense) grams for text under 3 chars") {
    // sequence(1, len-2) with len < 3 counts DOWN — unguarded it would
    // emit descending-index garbage; the helper must return [] instead,
    // for ASCII and multibyte short strings alike, and agree with the
    // char-exact path on the 3-char boundary.
    import TestSpark.spark.implicits._
    val df = Seq("", "a", "ab", "abc", "é", "éç", "héllo")
      .toDF("text").withColumn("__bin", col("text").cast(BinaryType))
    val got = df.select(col("text"),
        TextFunctions.trigramsFast(col("text"), col("__bin")).as("g"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got("") == Nil && got("a") == Nil && got("ab") == Nil)
    assert(got("é") == Nil && got("éç") == Nil)
    assert(got("abc") == List("abc"))
    assert(got("héllo") == List("hél", "éll", "llo"),
      "multibyte text must stay character-indexed")
  }
}
