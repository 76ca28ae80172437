package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-family invariants the DuckDB oracle can't express:
  * Count-Min's overestimate-only guarantee and its mergeability
  * (sketch(A ∪ B) = sketch(A) + sketch(B) cell-wise — the property
  * that makes a distributed build a plain partial+final aggregation). */
class SketchSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val DEPTH = 3
  private val WIDTH = 64

  private def bucket(j: Int, t: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(s"$j:"), t)), 1, 8), 16, 10)
      .cast(LongType) % WIDTH

  private def sketchOf(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("term"))
      .select(explode(array((0 until DEPTH).map(j =>
        struct(lit(j).as("row_j"), bucket(j, col("term")).as("bucket"))): _*)).as("e"))
      .select(col("e.row_j").as("row_j"), col("e.bucket").as("bucket"))
      .groupBy("row_j", "bucket").agg(count(lit(1)).as("c"))

  test("count-min estimates never undercount") {
    val rows = Registry.all.find(_.name == "cm01_countmin").get
      .build(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) >= 0L),
      "CMS must be overestimate-only: " +
        rows.filter(_.getLong(3) < 0L).mkString(", "))
  }

  test("hll registers merge by register-wise max, even on overlapping inputs") {
    import graft.operators.Hll
    val ev = Tables.events(spark, sf).select(col("event_type"), col("user_id"))
    // Overlapping halves: a duplicate-insensitive sketch must not care.
    val a = ev.filter(col("user_id") % 3 =!= 0)
    val b = ev.filter(col("user_id") % 3 =!= 1)
    val merged = Hll.registers(a, col("event_type"), col("user_id").cast("string"))
      .unionByName(Hll.registers(b, col("event_type"), col("user_id").cast("string")))
      .groupBy("gkey", "bucket").agg(max(col("mj")).as("mj"))
      .orderBy("gkey", "bucket").collect().toSeq
    val whole = Hll.registers(ev, col("event_type"), col("user_id").cast("string"))
      .orderBy("gkey", "bucket").collect().toSeq
    assert(merged == whole)
  }

  test("hll estimate lands within 3 standard errors of exact") {
    val m = graft.operators.Hll.M
    val rows = Registry.all.find(_.name == "hll02_oracle_distinct").get
      .build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val zeros = r.getLong(2)
      val raw = r.getDouble(4)
      // The query emits the RAW estimate plus n_zero; the standard
      // small-range linear-counting branch uses ln, which is not
      // bit-reproducible cross-engine, so it is applied client-side.
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else raw
      val se = 1.04 / math.sqrt(m.toDouble) // ~13% for m=64
      assert(math.abs(est - exact) <= 3 * se * exact + 1,
        s"${r.getString(0)}: est $est (raw $raw) vs exact $exact")
    }
  }

  test("count-min sketches merge by cell-wise addition") {
    val docs = Tables.documents(spark, sf)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = sketchOf(a).unionByName(sketchOf(b))
      .groupBy("row_j", "bucket").agg(sum(col("c")).as("c"))
      .orderBy("row_j", "bucket").collect().toSeq
    val whole = sketchOf(docs)
      .orderBy("row_j", "bucket").collect().toSeq
    assert(merged == whole)
  }

  // ---- graft's own TypedImperativeAggregate quantile sketch ----

  /** Deterministic pseudo-random valued frame: 3 groups, mostly-unique
    * values — the Knuth-multiplicative scatter every engine reproduces. */
  private def kllInput(n: Int): DataFrame =
    spark.range(n).select(
      (col("id") % 3).as("g"),
      ((col("id") * 2654435761L) % 1000003L).cast("double").as("v"))

  private def kllOf(df: DataFrame, k: Int, percents: Seq[Int]): Map[Long, Seq[Double]] = {
    graft.plans.VectorExpressions.register(spark)
    df.groupBy("g")
      .agg(graft.plans.VectorExpressions
        .kll_quantiles(col("v"), k, percents: _*).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
  }

  test("kll: exact type-1 quantiles below the compaction threshold, any partitioning") {
    val n = 20000
    val percents = Seq(25, 50, 75, 95, 99)
    val df = kllInput(n)
    // exact type-1 quantiles driver-side (n is test-tiny), same
    // integer rank formula as the aggregate and the qs01 oracle
    val byG = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def exactQ(g: Long, p: Int): Double = {
      val vs = byG(g)
      val r = math.max(1L, (p.toLong * vs.length + 99L) / 100L)
      vs((r - 1).toInt)
    }
    for (parts <- Seq(1, 13)) {
      val got = kllOf(df.repartition(parts), k = 65536, percents)
      for (g <- 0L to 2L; (p, i) <- percents.zipWithIndex)
        assert(got(g)(i) == exactQ(g, p),
          s"parts=$parts g=$g p=$p: got ${got(g)(i)} want ${exactQ(g, p)}")
    }
  }

  test("kll: forced-small k stays within the rank-error envelope across merge trees") {
    val n = 21000
    val percents = Seq(25, 50, 75, 95)
    val df = kllInput(n)
    val byG = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // k=64 on ~7000-row groups → log2(n/k) ≈ 7 compaction levels; the
    // empirical envelope 0.1·n is ~2× the observed worst case — an
    // honest regression pin, not the theoretical bound
    for (parts <- Seq(2, 32)) {
      val got = kllOf(df.repartition(parts), k = 64, percents)
      for (g <- 0L to 2L; (p, i) <- percents.zipWithIndex) {
        val vs = byG(g)
        val est = got(g)(i)
        val rank = vs.count(_ <= est)
        val target = (p.toLong * vs.length + 99L) / 100L
        assert(math.abs(rank - target) <= vs.length / 10,
          s"parts=$parts g=$g p=$p: rank $rank vs target $target of n=${vs.length}")
      }
    }
  }

  test("kll: weight conservation — sketch count equals group count under heavy compaction") {
    // count is carried exactly through odd-element handling: quantile
    // ranks are computed against the TRUE n even when buffers compact
    val df = kllInput(9999).filter(col("g") === 0)
    val got = kllOf(df, k = 16, Seq(100))
    val mx = df.agg(max(col("v"))).collect()(0).getDouble(0)
    // p100's target rank is exactly n; the estimate must be drawn from
    // the retained items, and under keep-later pair collapse the max
    // always survives to the end
    assert(got(0L)(0) == mx, s"p100 ${got(0L)(0)} != max $mx")
  }
}
