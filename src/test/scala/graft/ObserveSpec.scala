package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-flight audit metrics via `Dataset.observe` — the 100 TB answer to
  * "how many rows did each filter stage reject?". A naive audit runs
  * the funnel once for the output and once more per counter (each a
  * full corpus scan); `observe` accumulates the counters inside the
  * SAME job, so the audit is free: one scan, metrics delivered to the
  * driver out-of-band (accumulator-style, no shuffle, no second pass).
  * The reference has no notion of this (its jobs fold one reducer
  * state); Spark-side it is the idiomatic production data-quality gate
  * and composes with every query in the registry unchanged.
  */
class ObserveSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("observe() audits a quality funnel in one scan (counters match recomputation)") {
    val docs = Tables.documents(spark, sf)
    val obs = Observation("funnel_audit")
    val minChars = 100
    val kept = docs
      .observe(
        obs,
        count(lit(1)).as("n_in"),
        sum(when(col("n_chars") < minChars, 1L).otherwise(0L)).as("n_short"),
        sum(col("n_chars")).as("chars_in"))
      .filter(col("n_chars") >= minChars)
    val nKept = kept.count()

    val m = obs.get
    // conservation law: input = kept + rejected, from ONE scan
    assert(m("n_in").asInstanceOf[Long] === docs.count())
    assert(m("n_in").asInstanceOf[Long] - m("n_short").asInstanceOf[Long] === nKept)
    // independent recomputation of a non-count metric
    val charsIn = docs.agg(sum(col("n_chars"))).head().getLong(0)
    assert(m("chars_in").asInstanceOf[Long] === charsIn)
  }

  test("observe() rides an aggregating query without changing its result") {
    val docs = Tables.documents(spark, sf)
    val obs = Observation("agg_audit")
    val observed = docs
      .observe(obs, count(lit(1)).as("n_scanned"))
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .orderBy("lang")
    val plain = docs.groupBy("lang").agg(count(lit(1)).as("n")).orderBy("lang")
    assert(observed.collect().toSeq === plain.collect().toSeq)
    assert(obs.get("n_scanned").asInstanceOf[Long] === docs.count())
  }
}
