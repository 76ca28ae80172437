package graft

import graft.operators.SpectralQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the spectral family the DuckDB oracle can't express:
  * the Gram aggregation's algebraic properties (symmetry, PSD
  * diagonal, exact mergeability across partitionings) and the integer
  * power iteration's convergence behavior (Rayleigh quotient
  * non-decreasing in the round count; the integer iterate tracks the
  * exact double-arithmetic iterate). */
class SpectralSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val Dim = SpectralQueries.EmbDim

  private def quantizedRows = {
    val s = spark
    import s.implicits._
    Tables.embeddings(s, sf).select(
      transform(col("embedding"),
        e => round(e.cast(DoubleType) * 1000).cast(LongType)).as("q"))
      .select(col("q")).as[Seq[Long]]
  }

  test("gram matrix is symmetric with non-negative diagonal") {
    val (g, n) = SpectralQueries.gramOf(quantizedRows)
    assert(n > 0)
    for (i <- 0 until Dim) {
      assert(g(i * Dim + i) >= 0L, s"diag($i)")
      for (j <- 0 until i)
        assert(g(i * Dim + j) == g(j * Dim + i), s"asym at ($i,$j)")
    }
  }

  test("gram aggregation is partitioning-invariant (exact merge)") {
    val one = SpectralQueries.gramOf(quantizedRows.repartition(1))._1.toSeq
    val many = SpectralQueries.gramOf(quantizedRows.repartition(7))._1.toSeq
    assert(one == many, "integer Gram must not depend on partitioning")
  }

  test("rayleigh quotient is non-decreasing in the round count") {
    val (g, n) = SpectralQueries.gramOf(quantizedRows)
    val eigs = (1 to 8).map(k => SpectralQueries.powerIterate(g, n, k)._3)
    eigs.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"rayleigh regressed: $eigs") }
  }

  test("integer iterate tracks the exact double-arithmetic iterate") {
    val (g, n) = SpectralQueries.gramOf(quantizedRows)
    val intLoading = SpectralQueries.powerIterate(g, n, 8)._2
    // same 8 rounds in plain double arithmetic with exact norm rescale
    var v = Array.fill(Dim)(1.0)
    for (_ <- 1 to 8) {
      val u = Array.tabulate(Dim)(i =>
        (0 until Dim).map(j => g(i * Dim + j).toDouble * v(j)).sum)
      val nrm = math.sqrt(u.map(x => x * x).sum)
      v = u.map(_ / nrm)
    }
    val dot = (0 until Dim).map(i => v(i) * intLoading(i)).sum
    val cos = math.abs(dot) /
      math.sqrt(intLoading.map(x => x * x).sum)
    assert(cos > 0.999, s"integer iterate drifted from double iterate: cos=$cos")
  }

  test("loading vector is unit-norm") {
    val (g, n) = SpectralQueries.gramOf(quantizedRows)
    val loading = SpectralQueries.powerIterate(g, n, 8)._2
    val nrm = loading.map(x => x * x).sum
    assert(math.abs(nrm - 1.0) < 1e-9, s"norm²=$nrm")
  }

  test("em02 exact-integer outlier scores match a double recompute's ranking") {
    val rows = Registry.all.find(_.name == "em02_centroid_outliers").get
      .build(spark, sf).collect()
    assert(rows.length == 20)
    // dist must decrease (weakly) down the integer-score ranking
    val dists = rows.map(_.getDouble(2))
    dists.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-12, "dist not aligned with integer score order") }
  }
}
