package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 connector contract: parallel partition planning, planning-time
  * range pruning from pushed filters, column pruning to the reader. */
class SynthSourceSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def synth(rows: Long = 100000, parts: Int = 8): DataFrame =
    spark.read.format("graft.sources.SynthSource")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("unfiltered scan plans `parts` parallel partitions") {
    assert(synth().rdd.getNumPartitions == 8)
  }

  test("pushed id-band narrows the generated interval at planning time") {
    val df = synth().filter(col("id") < 12500)
    // 1/8 of the id space -> exactly one partition survives planning
    assert(df.rdd.getNumPartitions == 1,
      s"expected 1 planned partition, got ${df.rdd.getNumPartitions}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-synth [0, 12500)"), plan.take(2000))
    assert(df.count() == 12500)
  }

  test("column pruning reaches the reader schema") {
    val df = synth().select(col("val"))
    val plan = df.queryExecution.executedPlan.toString
    // the BatchScan output column list carries only the pruned field
    assert("BatchScan[^\\[]*\\[val#\\d+L\\]".r.findFirstIn(plan).isDefined,
      plan.take(2000))
    assert(!plan.contains("label#"), plan.take(2000))
  }

  test("scan is vectorized: columnar batches feed a ColumnarToRow boundary") {
    val df = synth()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      "scan must serve ColumnarBatches\n" + plan.take(2000))
    // and the columnar path returns the same rows as the formula
    assert(df.agg(org.apache.spark.sql.functions.sum("val")).head().getLong(0) ==
      (0L until 100000L).map(i => (i * 2654435761L) % 1000003L).sum)
  }

  test("generated rows match the formula") {
    val r = synth(rows = 1000, parts = 4)
      .filter(col("id") === 999).collect().head
    assert(r.getLong(0) == 999L)
    assert(r.getLong(1) == 999L % 97)
    assert(r.getLong(2) == (999L * 2654435761L) % 1000003L)
    assert(r.getString(3) == "g" + (999L % 97))
  }
}
