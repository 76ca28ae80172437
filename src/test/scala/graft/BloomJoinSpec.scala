package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bloom join-pruning contract: the JVM-side builder and the
  * Column-side probe agree on the hash (no false negatives ever), and
  * the filter actually prunes (otherwise it's dead weight in the plan).
  */
class BloomJoinSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("no false negatives: every build key passes its own filter") {
    val keys = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("k"))
    // probe the fact restricted to TRUE matches only: all must survive
    val trueMatches = Tables.lineitem(spark, sf)
      .join(keys, col("l_orderkey") === col("k"), "left_semi")
    val survived = BloomJoin.prefiltered(trueMatches, keys).count()
    assert(survived == trueMatches.count())
  }

  test("the filter prunes a meaningful fraction of non-matching rows") {
    val keys = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("k"))
    val fact = Tables.lineitem(spark, sf)
    val factN = fact.count()
    val matchN = fact.join(keys, col("l_orderkey") === col("k"), "left_semi").count()
    val prefN = BloomJoin.prefiltered(fact, keys).count()
    assert(prefN >= matchN, "bloom lost true matches")
    // false-positive residue must be small relative to the pruned mass
    val fp = prefN - matchN
    val nonMatch = factN - matchN
    assert(fp.toDouble / nonMatch < 0.05,
      s"false-positive rate ${fp.toDouble / nonMatch} too high")
  }
}
