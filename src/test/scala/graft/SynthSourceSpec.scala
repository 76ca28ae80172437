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

  test("aggregate pushdown: count/min/max served by closed-form partials, no row generation") {
    val df = synth()
      .filter(col("id") >= 25000 && col("id") < 75000)
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
    val r = df.collect().head
    assert(r.getLong(0) == 50000L)
    assert(r.getLong(1) == 25000L)
    assert(r.getLong(2) == 74999L)
    // the executed scan is the aggregate scan (one partial row per
    // partition), not the row generator
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-synth-agg"), plan.take(2000))
    assert(!plan.contains("graft-synth ["), plan.take(2000))
  }

  test("aggregate pushdown declines group-bys and val-sums (normal scan plans)") {
    val grouped = synth(rows = 1000).groupBy("grp").agg(count(lit(1)).as("n"))
    assert(!grouped.queryExecution.executedPlan.toString.contains("graft-synth-agg"))
    assert(grouped.count() == 97)
    val summed = synth(rows = 1000).agg(sum(col("val")).as("s"))
    assert(!summed.queryExecution.executedPlan.toString.contains("graft-synth-agg"))
    assert(summed.head().getLong(0) ==
      (0L until 1000L).map(i => (i * 2654435761L) % 1000003L).sum)
  }

  test("runtime filtering: join-time key set reaches the connector and narrows the scan") {
    val before = graft.sources.SynthSource.runtimeFilterApplications.get
    // selective, broadcastable dim side -> dynamic pruning hands the
    // materialized key set to the v2 scan before partitions are planned
    val dim = spark.range(0, 100000).select(col("id").as("k"))
      .filter(col("k") >= 30000 && col("k") < 30010)
    val joined = synth().join(dim, col("id") === col("k"))
      .select(col("id"), col("val"))
    val rows = joined.collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (30000L until 30010L).toSeq)
    rows.foreach(r => assert(r.getLong(1) == (r.getLong(0) * 2654435761L) % 1000003L))
    assert(graft.sources.SynthSource.runtimeFilterApplications.get > before,
      "the runtime IN-filter never reached SynthScan.filter — dynamic pruning did not fire")
  }

  test("generated rows match the formula") {
    val r = synth(rows = 1000, parts = 4)
      .filter(col("id") === 999).collect().head
    assert(r.getLong(0) == 999L)
    assert(r.getLong(1) == 999L % 97)
    assert(r.getLong(2) == (999L * 2654435761L) % 1000003L)
    assert(r.getString(3) == "g" + (999L % 97))
  }

  private def synthStream(rows: Long, batchRows: Long) =
    spark.readStream.format("graft.sources.SynthSource")
      .option("rows", rows.toString).option("parts", "4")
      .option("batchRows", batchRows.toString).load()

  test("micro-batch stream: AvailableNow drains the backlog in admission-controlled batches; rows ≡ batch scan") {
    import org.apache.spark.sql.streaming.Trigger
    val q = synthStream(rows = 1000, batchRows = 300)
      .writeStream.format("memory").queryName("synth_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // admission control (maxRows 300) must split 1000 ids into ≥ 4
    // micro-batches rather than one giant batch
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      q.recentProgress.map(_.numInputRows).mkString(","))
    val got = spark.table("synth_stream")
    assert(got.count() == 1000)
    // streamed rows are bit-identical to the batch scan's
    val batch = synth(rows = 1000, parts = 4)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("micro-batch stream: checkpointed restart resumes from the committed offset, re-emitting nothing") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("synth_stream_ckpt")
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    def run(rows: Long): Unit = {
      val q = synthStream(rows, batchRows = 250)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run(600)  // first run emits ids [0, 600)
    run(1000) // restart: the checkpoint holds offset 600 → emits [600, 1000)
    val got = spark.read.parquet(out)
    assert(got.count() == 1000, "restart must not re-emit committed ids")
    assert(got.select("id").distinct().count() == 1000)
  }
}
