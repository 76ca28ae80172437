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
    // every pair-emitting contract in the registry, guarded this round:
    // the default 20M budget must pass the real sf0.001 corpus clean
    Seq("dd10_production_lsh", "ss01_setsim_join", "dd03_jaccard_pairs",
      "dd17_simhash_hamming", "mm08_phash_neardup", "fz01_fuzzy_join",
      "sm01_cosine_topk").foreach { name =>
      assert(q(name).build(spark, sf).count() >= 0, name)
    }
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
  }

  test("dd03 aborts on a twin-heavy cohort (word histogram bounds the pair join)") {
    val s2 = spark.newSession()
    s2.conf.set(graft.operators.PairGuard.ConfKey, "10000")
    // 60 identical 8-word docs inside dd03's doc_id<60 cohort:
    // bound = 8 words x 60*59/2 = 14,160 > 10,000
    val e = intercept[IllegalStateException] {
      q("dd03_jaccard_pairs").build(s2, twinDir(300)).count()
    }
    assert(e.getMessage.contains("dd19_twin_safe_lsh"), e.getMessage)
  }

  test("dd17 aborts on a dense hamming ball (block-key histogram)") {
    val s2 = spark.newSession()
    s2.conf.set(graft.operators.PairGuard.ConfKey, "100")
    // twins can't trip dd17 (families collapse first) — the exposure
    // is many DISTINCT simhashes colliding on 15-bit blocks. 1500
    // single-word docs give ~1500 near-uniform 60-bit hashes; expected
    // block collisions 4*C(1500,2)/2^15 ≈ 137 pairs > 100 (fixed word
    // list + md5 → deterministic)
    val dir = Scratch.dir("pair_guard_dd17_")
    spark.range(1500)
      .select(col("id").as("doc_id"),
        concat(lit("uniqueword"), col("id")).as("text"),
        lit(12L).as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException] {
      q("dd17_simhash_hamming").build(s2, dir).count()
    }
    assert(e.getMessage.contains("dd20_star_components"), e.getMessage)
  }

  test("mm08 aborts when the perceptual block buckets exceed the budget") {
    val s2 = spark.newSession()
    // mm08's raster workload is fixed (doc_id < 360); constant-gradient
    // dHash rows make block collisions certain, so a tight budget
    // proves the guard sits before the candidate join
    s2.conf.set(graft.operators.PairGuard.ConfKey, "1")
    val e = intercept[IllegalStateException] {
      q("mm08_phash_neardup").build(s2, twinDir(360)).count()
    }
    assert(e.getMessage.contains("dd20_star_components"), e.getMessage)
  }

  test("fz01 aborts on a dense deletion neighborhood") {
    val s2 = spark.newSession()
    s2.conf.set(graft.operators.PairGuard.ConfKey, "1000")
    // vocabulary a0..a99: every word's digit-deletion collides on "a"
    // -> one bucket of 100 variants -> bound >= 4950 > 1000
    val dir = Scratch.dir("pair_guard_fz01_")
    spark.range(1)
      .select(lit(1L).as("p_partkey"),
        lit((0 until 100).map(i => s"a$i").mkString(" ")).as("p_name"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    val e = intercept[IllegalStateException] {
      q("fz01_fuzzy_join").build(s2, dir).count()
    }
    assert(e.getMessage.contains("dd20_star_components"), e.getMessage)
  }

  test("sm01 aborts when |Q|x|C| exceeds the budget (cross-product guard)") {
    val s2 = spark.newSession()
    s2.conf.set(graft.operators.PairGuard.ConfKey, "100")
    // sf0.001 embeddings: 3 queries x ~1k candidates > 100
    val e = intercept[IllegalStateException] {
      q("sm01_cosine_topk").build(s2, sf).count()
    }
    assert(e.getMessage.contains("sm02_simhash_buckets"), e.getMessage)
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
