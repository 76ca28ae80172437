package graft

import graft.operators.ZOrder
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The z-order layout's point is SKIPPING — the oracle proves the box
  * aggregate is right, this spec proves the layout made it cheap. */
class ZOrderSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("morton interleave is a bijection on the 256x256 grid") {
    val grid = spark.range(256L * 256)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val zs = grid.select(ZOrder.zval(col("x"), col("y")).as("z"))
    assert(zs.distinct().count() == 256L * 256)
    val mm = zs.agg(min("z"), max("z")).head()
    assert((mm.getLong(0), mm.getLong(1)) == ((0L, 65535L)))
  }

  test("2-D box over the z-ordered layout scans a fraction of the table") {
    val zo = ZOrder.zorderedOrders(spark, "/root/testdata/sf0.01")
    val total = zo.count()
    val df = ZOrder.box(zo)
    df.collect()
    // The file scan hides behind AdaptiveSparkPlanExec and the AQE
    // query-stage wrappers (whose subplan is not a `children` entry).
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
    }.flatten
    val scanned = scans(df.queryExecution.executedPlan)
      .head.metrics("numOutputRows").value
    // The box covers 1/128 of the key space; without clustering every
    // row group intersects it and the scan reads the whole table. The
    // z-layout must let parquet row-group stats skip most of it.
    assert(scanned * 2 < total,
      s"scan read $scanned of $total rows — z-layout is not skipping")
  }
}
