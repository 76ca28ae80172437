package graft

import graft.operators.ManifestSkipping
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The manifest must actually SKIP files — and skipping must be
  * lossless: the pruned read over selected files must return exactly
  * what a full-table filter returns. Losslessness holds because range
  * clustering makes file bands cover the domain and the manifest test
  * is an interval intersection, but the spec proves it empirically
  * rather than trusting the argument. */
class ManifestSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("manifest-pruned read opens fewer files and loses no rows") {
    val (pruned, selected, total) =
      ManifestSkipping.manifestPrunedScan(spark, sf, lo = 100L, hi = 300L)
    assert(total == 16, s"range write must produce 16 files, got $total")
    assert(selected > 0 && selected < total,
      s"manifest must skip some files: selected=$selected of $total")
    val expect = Tables.orders(spark, sf)
      .filter(col("o_custkey") >= 100 && col("o_custkey") < 300).count()
    assert(pruned.count() == expect,
      "pruned scan must equal the full-table filter")
  }

  test("a predicate outside every band selects zero files") {
    val (_, selected, total) =
      ManifestSkipping.manifestPrunedScan(spark, sf, lo = Long.MaxValue - 2,
        hi = Long.MaxValue - 1)
    assert(total == 16)
    assert(selected == 0, s"out-of-domain predicate must skip everything, got $selected")
  }
}
