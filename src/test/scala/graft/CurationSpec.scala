package graft

import graft.plans.VectorExpressions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-5 curation operators (sd01 / bm01 /
  * q49) that the DuckDB oracle can't or shouldn't express: independent
  * recomputation of the SemDeDup drop set, BM25 result-shape laws, and
  * the compaction contract.
  */
class CurationSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    Registry.all.find(_.name == name).get.build(spark, sf)

  test("sd01: per-cell audit matches an independent window-based recomputation") {
    VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    // independent assignment formulation: score all 16 centroids per
    // vector with a crossJoin + row_number window (the shape sd01's
    // map-side struct-max deliberately avoids) and take rank 1
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("cid"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
        VectorExpressions.cosine_similarity(col("embedding"), col("cemb")).as("cos_c"))
      .withColumn("rc", row_number().over(w)).filter(col("rc") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
    val a = assigned.select(col("cid"), col("vec_id").as("kid"), col("embedding").as("ae"))
    val b = assigned.select(col("cid").as("bcid"), col("vec_id").as("did"), col("embedding").as("be"))
    val drops = a.join(b, col("cid") === col("bcid") && col("did") > col("kid"))
      .filter(VectorExpressions.cosine_similarity(col("ae"), col("be")) > 0.4)
      .select(col("cid"), col("did")).distinct()
      .groupBy("cid").agg(count(lit(1)).as("want_dropped"))
    val members = assigned.groupBy("cid").agg(count(lit(1)).as("want_members"))
    val want = members.join(drops, Seq("cid"), "left")
      .na.fill(0L, Seq("want_dropped"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val got = run("sd01_semdedup").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    assert(got.values.map(_._1).sum == 500, "members must partition the corpus")
  }

  test("bm01: rank shape and term-membership law") {
    val rows = run("bm01_bm25").collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(2)).toSeq == (1L to 20L), "rn must be 1..20 in order")
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse, "bm25 non-increasing by rn")
    // every returned doc must contain at least one query term as a token
    val ids = rows.map(_.getLong(0)).toIndexedSeq
    val terms = Seq("spark", "window", "stream")
    val nWithTerm = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(ids: _*))
      .filter(size(filter(split(col("text"), " "),
        w => terms.map(w === _).reduce(_ || _))) > 0)
      .count()
    assert(nWithTerm == 20)
  }

  test("st03: apportionment law — quotas sum exactly to the target, selection fills them") {
    val rows = run("st03_quota_alloc").collect()
    assert(rows.map(_.getLong(2)).sum == 100, "largest-remainder must hit the target exactly")
    rows.foreach { r =>
      assert(r.getLong(3) == math.min(r.getLong(2), r.getLong(1)),
        s"source ${r.getString(0)}: selection must fill min(quota, available)")
    }
  }

  test("mx02: temperature weights are a proper distribution that compresses spread") {
    val rows = run("mx02_temperature_mix").collect()
    val shares = rows.map(_.getDouble(2))
    val weights = rows.map(_.getDouble(3))
    // each weight is quantized to 6dp, so the sum may drift by n·5e-7
    assert(math.abs(weights.sum - 1.0) < weights.length * 5e-7,
      "weights must normalize to 1 within quantization")
    // T=2 smoothing compresses the mixture toward uniform: the ratio of
    // max to min weight must shrink vs the raw shares
    assert(weights.max / weights.min < shares.max / shares.min,
      "temperature smoothing must reduce the spread")
  }

  test("q49: compaction preserves content and hits the file-count contract") {
    val r = run("q49_compaction").collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 200, "pre-compaction fragment count")
    assert(r(0).getLong(1) == 8, "post-compaction file count")
    val expected = Tables.lineitem(spark, sf)
      .filter(year(col("l_shipdate")) === 1995).count()
    assert(r(0).getLong(2) == expected, "row preservation")
  }

  test("dd14: precision/recall laws — bounded ratios, hits within both sets, monotone truth") {
    val rows = run("dd14_lsh_quality").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0.5, 0.8))
    rows.foreach { case (t, nTrue, nCand, nHit) =>
      assert(nHit <= math.min(nTrue, nCand), s"t=$t: hits exceed a parent set")
      assert(nTrue > 0, s"t=$t: degenerate harness — no ground-truth pairs in the slice")
    }
    // raising the threshold can only shrink the truth set; candidates are
    // threshold-independent
    assert(rows(1)._2 <= rows(0)._2, "truth must be monotone in threshold")
    assert(rows(1)._3 == rows(0)._3, "candidate set must not depend on threshold")
  }

  test("ir01: driver-side exact recomputation and the odds-bound law") {
    val rows = run("ir01_importance_weights").collect()
    assert(rows.length == 40)
    // scores arrive ranked, ties broken by doc_id
    val pairs = rows.map(r => (r.getAs[Long]("ir_score"), r.getAs[Long]("doc_id")))
    assert(pairs.sliding(2).forall { case Array((s1, d1), (s2, d2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2) },
      "ranking must be (ir_score DESC, doc_id ASC)")
    // law: 0 <= odds <= SCALE per bucket, so 0 <= score <= n_tokens * SCALE
    rows.foreach { r =>
      val (nt, sc) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("ir_score"))
      assert(sc >= 0 && sc <= nt * 1000000L, s"score out of odds bounds: $sc / $nt")
    }
    // independent recomputation: rebuild bucket odds and one doc's score
    // with plain JVM code (md5 + integer division), no Spark expressions
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16) % 1024L
    }
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
    val bg = scala.collection.mutable.Map.empty[Long, Long]
    val tg = scala.collection.mutable.Map.empty[Long, Long]
    docs.foreach { r =>
      val isT = r.getAs[String]("source") == "src0"
      r.getAs[String]("text").split(" ", -1).foreach { t =>
        val b = bucket(t)
        bg(b) = bg.getOrElse(b, 0L) + 1
        if (isT) tg(b) = tg.getOrElse(b, 0L) + 1
      }
    }
    val odds = bg.map { case (b, n) => b -> tg.getOrElse(b, 0L) * 1000000L / n }
    val byId = docs.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.take(5).foreach { r =>
      val want = byId(r.getAs[Long]("doc_id"))
        .split(" ", -1).map(t => odds(bucket(t))).sum
      assert(r.getAs[Long]("ir_score") == want,
        s"doc ${r.getAs[Long]("doc_id")}: engine ${r.getAs[Long]("ir_score")} != recomputed $want")
    }
  }

  test("pd01: chunk accounting laws and keep-first conservation") {
    val rows = run("pd01_chunk_dedup").collect()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.length == docs.size, "one audit row per document")
    // per-doc: n_chunks = ceil(words/20), kept + dropped = chunks
    rows.foreach { r =>
      val nWords = docs(r.getAs[Long]("doc_id")).split(" ", -1).length
      val wantChunks = (nWords + 19) / 20
      assert(r.getAs[Long]("n_chunks") == wantChunks)
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_chunks"))
    }
    // global conservation: total kept == number of DISTINCT chunk contents
    // (keep-first keeps exactly one instance per distinct chunk)
    val distinctChunks = docs.values.flatMap { t =>
      t.split(" ", -1).grouped(20).map(_.mkString(" "))
    }.toSet.size
    assert(rows.map(_.getAs[Long]("n_kept")).sum == distinctChunks)
  }

  test("qc01: map-only inference — no shuffle before the ordering; sign law") {
    val df = run("qc01_classifier_score")
    val rows = df.collect()
    rows.foreach { r =>
      assert((r.getAs[Long]("score") >= 0) == (r.getAs[Long]("label") == 1L))
    }
    // the inference itself must be a pure Project over the scan: the
    // ONLY exchanges allowed are the rangepartitioning of the final
    // deterministic ORDER BY (which a pipeline consumer would drop)
    // and the conditional ingest fan-out (fires only when the scan
    // under-parallelizes — small testdata files; r16: hash on the
    // table's leading key doc_id, previously RoundRobin — see
    // Tables.fanout). AQE prints final + initial plans; count the
    // final section only.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    // cap the fan-out allowance at exactly ONE doc_id-keyed exchange —
    // a blanket exclusion would also mask a future accidental
    // doc_id-keyed groupBy/join shuffle (r16 review finding)
    val fanouts = exchanges.count(_.contains("hashpartitioning(doc_id"))
    assert(fanouts <= 1,
      s"expected at most the one conditional ingest fan-out, got:\n$plan")
    assert(exchanges.size - fanouts <= 1,
      s"expected at most the order-by exchange, got:\n$plan")
    assert(!plan.contains("Generate"), "no explode in classifier inference")
  }

  test("wt01: priority sampling — top-k heap plan, exact integer priorities") {
    val df = run("wt01_weighted_sample")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as a bounded heap, not a global sort:\n$plan")
    val rows = df.collect()
    assert(rows.length == 50)
    // independent JVM recomputation of each returned priority
    def u32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 8), 16)
    }
    rows.foreach { r =>
      val want = r.getAs[Long]("n_chars") * 4294967296L /
        (u32("wt:" + r.getAs[Long]("doc_id")) + 1)
      assert(r.getAs[Long]("priority") == want)
    }
    // priorities non-increasing in output order
    val ps = rows.map(_.getAs[Long]("priority")).toSeq
    assert(ps == ps.sorted.reverse)
  }

  test("sh01: seeded shuffle is a permutation, reproducible, and source-interleaved") {
    val rows = run("sh01_seeded_shuffle").collect()
    val n = rows.length
    // a permutation: seq is exactly 1..n
    assert(rows.map(_.getAs[Long]("seq")).sorted.toSeq == (1L to n).toSeq)
    // reproducible: a second build yields the identical order
    assert(run("sh01_seeded_shuffle").collect().toSeq == rows.toSeq)
    // interleave law: the stream is organized in rounds (rs) — round r
    // holds AT MOST one doc per source (every source's r-th pick), and
    // rounds are non-interleaved in seq order, so any prefix that ends
    // on a round boundary has a per-source mix within one doc of even
    // (until a source is exhausted)
    rows.groupBy(_.getAs[Long]("rs")).foreach { case (r, g) =>
      val srcs = g.map(_.getAs[String]("source")).toSeq
      assert(srcs.distinct.size == srcs.size,
        s"round $r repeats a source: $srcs")
    }
    val bySeq = rows.sortBy(_.getAs[Long]("seq")).map(_.getAs[Long]("rs"))
    assert(bySeq.zip(bySeq.tail).forall { case (a, b) => a <= b },
      "rounds must be contiguous in stream order")
    // not source-sorted (the shuffle actually shuffles): the stream's
    // source column must not be globally grouped
    val srcStream = rows.sortBy(_.getAs[Long]("seq")).map(_.getAs[String]("source"))
    assert(srcStream.sliding(2).count(p => p(0) != p(1)) > srcStream.distinct.size,
      "sources must interleave, not form contiguous blocks")
  }
}
