package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the round-8 operators that the row-for-row DuckDB oracle
  * can't express directly:
  *
  *  - q53's fingerprint must be INVARIANT to row order / partitioning
  *    (the whole point of an order-independent checksum), SENSITIVE to
  *    any single-value perturbation, and its modular-sum term must
  *    catch the XOR blind spot (even-multiplicity duplicate rows).
  *  - dd15's distributed rank (range repartition + zipWithIndex) must
  *    be partition-count-invariant — the candidate pairs cannot depend
  *    on how the cluster happened to split the sort.
  *  - cm03's Count-Min candidate pass must have perfect recall: the
  *    final result equals a brute-force exact heavy-hitter scan.
  */
class IntegritySpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def fp(df: DataFrame): Row = {
    import graft.operators.RelationalQueries.tableFingerprint
    tableFingerprint(df, "t",
      Seq(col("k").cast("string"), col("v"))).collect().head
  }

  private def kv(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "v")
  }

  test("q53 fingerprint: order- and partitioning-invariant") {
    val rows = (1L to 500L).map(k => (k, s"payload-$k"))
    val a = fp(kv(rows))
    val b = fp(kv(rows.reverse).repartition(7))
    val c = fp(kv(scala.util.Random.shuffle(rows)).repartition(1))
    assert(a == b && a == c)
  }

  test("q53 fingerprint: any single-value perturbation changes it") {
    val rows = (1L to 100L).map(k => (k, s"payload-$k"))
    val base = fp(kv(rows))
    val perturbed = fp(kv(rows.updated(41, (42L, "payload-42x"))))
    assert(base.getAs[Long]("n_rows") == perturbed.getAs[Long]("n_rows"))
    assert(base.getAs[Long]("fp_xor") != perturbed.getAs[Long]("fp_xor"))
  }

  test("q53 fingerprint: mod-sum catches the even-duplicate XOR blind spot") {
    val rows = (1L to 100L).map(k => (k, s"payload-$k"))
    // duplicate one row twice more: XOR of the pair cancels out
    val dup = rows ++ Seq(rows.head, rows.head)
    val base = fp(kv(rows))
    val dupFp = fp(kv(dup))
    assert(base.getAs[Long]("fp_xor") == dupFp.getAs[Long]("fp_xor"),
      "sanity: an even-multiplicity duplicate is invisible to XOR")
    assert(base.getAs[Long]("fp_modsum") != dupFp.getAs[Long]("fp_modsum"),
      "the modular sum must catch what XOR cannot")
    assert(base.getAs[Long]("n_rows") != dupFp.getAs[Long]("n_rows"))
  }

  test("dd15: candidate pairs are shuffle-partition-count invariant") {
    val build = SparkEntry.queries("dd15_sorted_neighborhood")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = build(spark, sf).collect().toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      val b = build(spark, sf).collect().toSeq
      assert(a.nonEmpty && a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("dd15: every pair is rank-adjacent and above the Jaccard floor") {
    val rows = SparkEntry.queries("dd15_sorted_neighborhood")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("jaccard") >= 0.8)
      assert(r.getAs[Long]("doc_a") != r.getAs[Long]("doc_b"))
    }
  }

  test("mx03 water-filling laws on a skewed corpus: small sources whole, big capped, budget exact") {
    // the driver corpus has near-uniform sources (k=0 path); craft a
    // skewed one so the taken-whole branch is exercised end to end
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, ("w " * 10).trim, "en", "tiny", 10L),      // 10 tokens
      (2L, ("w " * 100).trim, "en", "small", 100L),   // 100 tokens
      (3L, ("w " * 1000).trim, "en", "big", 1000L),   // 1000 tokens
      (4L, ("w " * 1000).trim, "en", "huge", 1000L),
      (5L, ("w " * 900).trim, "en", "huge", 900L))    // huge = 1900 tokens
    val dir = Scratch.dir("mx03-skew")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("mx03_budget_mix")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("capacity"), r.getAs[Long]("allocation"))).toMap
    val total = out.values.map(_._1).sum
    val budget = total * 3 / 5 // 3010 * 3 / 5 = 1806
    assert(out.values.map(_._2).sum == budget, "allocations must exhaust the budget")
    out.values.foreach { case (c, a) => assert(a <= c, "no source over-sampled") }
    // water level: tiny and small fit whole; big and huge are capped at
    // the same level (±1 for the integer remainder)
    assert(out("tiny") == (10L, 10L))
    assert(out("small") == (100L, 100L))
    val capped = Seq(out("big")._2, out("huge")._2)
    assert(math.abs(capped(0) - capped(1)) <= 1,
      s"capped sources must sit at the common level, got $capped")
    assert(capped.forall(_ < 1000L))
  }

  test("cm03: equals the brute-force exact heavy-hitter scan (perfect recall)") {
    val got = SparkEntry.queries("cm03_heavy_hitters")(spark, sf).collect().toSeq
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
    val n = toks.count()
    val want = toks.groupBy("term").agg(count(lit(1)).as("c"))
      .filter(col("c") * 64L >= n)
      .select(col("term"), col("c").as("n_occurrences"))
      .orderBy("term").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("dd19 is a lossless factorization of dd10 on a twin corpus " +
      "(cross-expansion ≡ the doc-level result)") {
    val s = spark
    // twin fixture: sf0.001 documents ∪ one key-shifted identical
    // replica (the ScaleUp construction that makes doc-level LSH
    // output Θ(copies²))
    val docs = Tables.documents(s, sf)
    val off = 1000000L
    val twin = docs.select((col("doc_id") + off).as("doc_id"), col("text"),
      col("lang"), col("source"), col("n_chars"))
    val root = Scratch.dir("dd19-law")
    docs.unionByName(twin).write.mode("overwrite")
      .parquet(s"$root/documents.parquet")

    def res(name: String) = Registry.all.find(_.name == name).get.build(s, root)
    val dd10 = res("dd10_production_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val dd19 = res("dd19_twin_safe_lsh").collect()
    assert(dd19.length < dd10.size,
      "the collapse must strictly shrink the output on a twin corpus")

    // group membership under the operator's own fingerprint definition
    import graft.functions.TextFunctions
    val members: Map[Long, Seq[Long]] = Tables.documents(s, root)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), md5(concat_ws("\u0001",
        sort_array(TextFunctions.shingles(col("text"), 3)))).as("f"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values
      .map { g => val ids = g.map(_._1).sorted.toSeq; ids.head -> ids }.toMap
    // ≥ 2: the shifted replica guarantees a twin; exact-dup ORIGINALS
    // (present in the synthetic corpus) make some groups larger
    assert(members.forall(_._2.size >= 2), "every doc must have its twin")

    // identical sets ⇒ identical signatures ⇒ identical band collisions,
    // so each rep pair expands to all cross pairs with the SAME n_bands
    // and jaccard, and each group's internal pairs are (2 bands, 1.0)
    val expanded = scala.collection.mutable.Set[(Long, Long, Long, Double)]()
    dd19.foreach { r =>
      val (a, b, nb, j) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      for (x <- members(a); y <- members(b)) {
        val (lo, hi) = if (x < y) (x, y) else (y, x)
        expanded += ((lo, hi, nb, j))
      }
    }
    members.values.filter(_.size > 1).foreach { ids =>
      for (i <- ids.indices; k <- i + 1 until ids.size)
        expanded += ((ids(i), ids(k), 2L, 1.0))
    }
    assert(expanded.toSet == dd10,
      s"expansion mismatch: ${(expanded.toSet -- dd10).take(3)} extra, " +
        s"${(dd10 -- expanded).take(3)} missing")
  }
}
