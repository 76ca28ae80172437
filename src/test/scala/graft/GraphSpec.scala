package graft

import org.scalatest.funsuite.AnyFunSuite

/** PageRank invariants beyond the oracle equality check. */
class GraphSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def gr01 = Registry.all.find(_.name == "gr01_pagerank").get

  test("bfs levels alternate sides of the bipartite trade graph") {
    // Nodes encode customer=2k, supplier=2k+1; every edge crosses sides,
    // so distance parity must equal node parity (source is a customer).
    val rows = Registry.all.find(_.name == "gr03_bfs").get
      .build(spark, sf).collect()
    assert(rows.nonEmpty && rows.head.getLong(0) == 0L)
    rows.foreach { r =>
      val d = r.getLong(0); val minN = r.getLong(2); val maxN = r.getLong(3)
      assert(minN % 2 == d % 2 && maxN % 2 == d % 2,
        s"distance $d holds nodes of the wrong side: $minN..$maxN")
    }
    // frontier growth: the dense trade graph reaches both sides
    assert(rows.length >= 3, "BFS should reach at least distance 2")
  }

  test("graph join mode (spark.graft.graph.join) changes the plan, never the answer") {
    // The per-round node-state joins are config-selected: `shuffle`
    // (default — scale-safe at web-graph |V|) vs `broadcast` (opt-in
    // for bounded graphs). Integer fixed-point arithmetic makes every
    // round exact, so the two modes must agree bit-for-bit.
    val conf = spark.conf
    def inMode[A](m: String)(body: => A): A = {
      conf.set("spark.graft.graph.join", m)
      try body finally conf.unset("spark.graft.graph.join")
    }
    for (name <- Seq("gr01_pagerank", "gr02_hits", "gr03_bfs")) {
      val gq = Registry.all.find(_.name == name).get
      val shuffled = inMode("shuffle") { gq.build(spark, sf).collect().toSeq }
      val broadcasted = inMode("broadcast") { gq.build(spark, sf).collect().toSeq }
      assert(shuffled == broadcasted, s"$name diverges across join modes")
    }
    // and the broadcast mode really does hint: the analyzed plan grows
    // ResolvedHint nodes that the default mode must not have
    def hintCount(m: String) = inMode(m) {
      Registry.all.find(_.name == "gr01_pagerank").get
        .build(spark, sf).queryExecution.analyzed.collect {
          case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
        }.size
    }
    assert(hintCount("broadcast") > hintCount("shuffle"),
      "broadcast mode must add rank/contrib hints over the default")
  }

  test("pagerank top-25 is positive, descending, and deterministic across runs") {
    val a = gr01.build(spark, sf).collect().toSeq
    val b = gr01.build(spark, sf).collect().toSeq
    assert(a.size == 25)
    val ranks = a.map(_.getLong(1))
    assert(ranks.forall(_ > 0L))
    assert(ranks == ranks.sorted.reverse, "not descending")
    // Integer fixed-point makes the whole iteration exact, so two runs
    // must agree bit-for-bit despite different shuffle schedules.
    assert(a == b)
  }

  test("hits scores are deterministic and the per-role top-k uses the TopK operator") {
    val gr02 = Registry.all.find(_.name == "gr02_hits").get
    val a = gr02.build(spark, sf).collect().toSeq
    val b = gr02.build(spark, sf).collect().toSeq
    // sf0.001 has only 10 suppliers: authority side caps below k=15
    assert(a.size == 25 && a == b)
    assert(a.count(_.getString(0) == "hub") == 15)
    val plan = gr02.build(spark, sf).queryExecution.executedPlan.toString
    assert("TopK".r.findAllIn(plan).size >= 2,
      "per-role top-15 must run through the k-bounded TopK operator\n" + plan.take(2000))
  }

  test("pagerank final top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = gr01.build(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("recursive-CTE BFS (gr05) reproduces the driver-loop BFS (gr03) exactly, and plans a loop") {
    // same graph, source, and depth — the engine-iterated WITH
    // RECURSIVE and the per-round driver loop must agree row-for-row
    val loop = Registry.all.find(_.name == "gr03_bfs").get
      .build(spark, sf).collect().toSeq
    val rec = Registry.all.find(_.name == "gr05_recursive_bfs").get
      .build(spark, sf).collect().toSeq
    assert(rec == loop && rec.nonEmpty)
    // the recursion must be a single engine-executed loop, not an
    // unrolled union of 4 levels
    val plan = Registry.all.find(_.name == "gr05_recursive_bfs").get
      .build(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("UnionLoop"),
      "WITH RECURSIVE must plan as an engine loop\n" + plan.take(2000))
  }
}
