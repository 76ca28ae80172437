package graft

import graft.sources.MemSink
import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Commit-protocol invariants of the DSv2 write sink: append/overwrite
  * roundtrips, and atomicity — a failed job must leave NOTHING behind,
  * even from the tasks that succeeded before the failure. */
class SinkSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val fmt = "graft.sources.MemSink"
  private val sf = "/root/testdata/sf0.001"

  test("append/overwrite roundtrip through the commit protocol") {
    MemSink.store.drop("t_round")
    val src = Tables.nation(spark, sf).select("n_nationkey", "n_name")
    src.write.format(fmt).option("table", "t_round").mode("append").save()
    val back = spark.read.format(fmt).option("table", "t_round").load()
    assert(back.count() == src.count())
    assert(back.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq ==
      src.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq)
    // append accumulates…
    src.write.format(fmt).option("table", "t_round").mode("append").save()
    assert(spark.read.format(fmt).option("table", "t_round").load().count() ==
      2 * src.count())
    // …overwrite truncates atomically in the same commit
    src.limit(5).write.format(fmt).option("table", "t_round").mode("overwrite").save()
    assert(spark.read.format(fmt).option("table", "t_round").load().count() == 5)
  }

  test("a failed write job commits NOTHING — no torn partial state") {
    MemSink.store.drop("t_atomic")
    val poison = udf { (k: Long) =>
      if (k == 7L && TaskContext.get() != null) throw new RuntimeException("boom")
      k
    }
    val src = Tables.nation(spark, sf)
      .repartition(4, col("n_nationkey")) // spread keys over several write tasks
      .select(poison(col("n_nationkey")).as("k"), col("n_name"))
    val failed = intercept[Exception] {
      src.write.format(fmt).option("table", "t_atomic").mode("append").save()
    }
    assert(failed != null)
    // the tasks that didn't hold key 7 succeeded and produced commit
    // messages — but the driver never committed, so the table must not
    // exist at all (schema included)
    assert(MemSink.store.schema("t_atomic").isEmpty, "torn write: partial state visible")
    assert(MemSink.store.rows("t_atomic").isEmpty)
  }

  test("a successful second run after a failure sees only its own rows") {
    MemSink.store.drop("t_retry")
    val src = Tables.nation(spark, sf).select(col("n_nationkey").as("k"), col("n_name"))
    src.write.format(fmt).option("table", "t_retry").mode("append").save()
    assert(spark.read.format(fmt).option("table", "t_retry").load().count() == src.count())
  }
}
