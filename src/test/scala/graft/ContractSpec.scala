package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke tests for the driver contract surface. */
class ContractSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows and is the pricing-summary flagship") {
    val e = SparkEntry.entry(spark)
    assert(e.count() > 0)
    assert(e.columns.contains("sum_charge"), "entry must be q01_pricing_summary")
  }

  test("every oracleSql key has a queries entry, names are unique") {
    val q = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(q.keySet))
    assert(Registry.all.map(_.name).distinct.size == Registry.all.size)
  }

  test("each query family executes at sf0.001") {
    Seq("q01_pricing_summary", "dd04_minhash_signatures", "tx01_token_stats",
      "sm02_simhash_buckets", "ev02_sessionize").foreach { name =>
      assert(SparkEntry.queries(name)(spark, sf).count() > 0, name)
    }
  }
}
