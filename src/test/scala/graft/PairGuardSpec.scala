package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pair-budget fail-fast ([[graft.operators.PairGuard]]) on the
  * doc-level pair contracts (dd10, ss01): a twin-heavy corpus makes
  * their OUTPUT Θ(copies²) (SCALING.md fourth-decade table: dd10
  * heap-OOMs at the 100× twin-heavy replica), and the guard must turn
  * that cliff into an immediate diagnostic naming the twin-safe
  * variant — BEFORE the pair join runs — while never tripping on a
  * healthy corpus. The spec proves the mechanism at spec scale with a
  * lowered budget (the bound is computed the same way at any budget);
  * the 100×-replica behavior is the same bound × the default budget.
  */
class PairGuardSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = Registry.all.find(_.name == name).get

  /** twin-heavy corpus: `copies` identical multi-word documents */
  private def twinDir(copies: Int): String = {
    val dir = Scratch.dir("pair_guard_twins_")
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    spark.range(copies.toLong)
      .select(col("id").as("doc_id"), lit(text).as("text"),
        lit(text.length.toLong).as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dd10 aborts with a dd19 diagnostic on a twin-heavy corpus") {
    val s2 = spark.newSession()
    s2.conf.set(graft.operators.PairGuard.ConfKey, "10000")
    // 300 identical docs -> every band bucket has 300 members ->
    // bound = 2 bands x 300*299/2 = 89,700 pairs > 10,000 budget
    val e = intercept[IllegalStateException] {
      q("dd10_production_lsh").build(s2, twinDir(300)).count()
    }
    assert(e.getMessage.contains("dd19_twin_safe_lsh"), e.getMessage)
    assert(e.getMessage.contains("dd10_production_lsh"), e.getMessage)
  }

  test("ss01 aborts with an ss03 diagnostic on a twin-heavy corpus") {
    val s2 = spark.newSession()
    s2.conf.set(graft.operators.PairGuard.ConfKey, "10000")
    val e = intercept[IllegalStateException] {
      q("ss01_setsim_join").build(s2, twinDir(300)).count()
    }
    assert(e.getMessage.contains("ss03_setsim_representatives"), e.getMessage)
  }

  test("the guard does not fire on a healthy corpus at the default budget") {
    assert(q("dd10_production_lsh").build(spark, sf).count() >= 0)
    assert(q("ss01_setsim_join").build(spark, sf).count() >= 0)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
  }

  test("dd19 (the twin-safe route) RUNS on the same corpus that trips dd10") {
    val s2 = spark.newSession()
    s2.conf.set(graft.operators.PairGuard.ConfKey, "10000")
    val d = twinDir(300)
    // representative collapse first: one group of 300 copies becomes
    // one representative, so the guarded pair stage sees 1 doc
    val rows = q("dd19_twin_safe_lsh").build(s2, d).count()
    assert(rows >= 0) // must complete, not throw
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
  }
}
