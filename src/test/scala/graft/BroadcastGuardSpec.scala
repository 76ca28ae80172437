package graft

import org.apache.spark.sql.GraftDatasetBridge
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, LogicalPlan, ResolvedHint}
import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide guard against the one plan shape with no 100 TB story:
  * an EXPLICIT `broadcast()` hint on a frame whose cardinality grows
  * with the corpus. A hint bypasses Spark's size threshold AND AQE's
  * runtime re-check, so a corpus-growing build side that fits today is
  * a guaranteed driver/executor OOM at 100× — it fails only in
  * production, which is exactly why a spec has to make the class
  * impossible here (round-6 verdict: tx13/tx14/dd13 shipped this way).
  *
  * Rule, checked EMPIRICALLY rather than by plan-shape heuristics:
  * "bounded" means scale-invariant. For every registry query, collect
  * each broadcast-hinted subtree from the analyzed plan and count its
  * rows at sf0.001 and at sf0.01 (a 10× corpus). A genuinely bounded
  * frame — 1-row totals, fixed dimension (25 nations), top-k output,
  * per-group threshold table, 1024-bucket stats, fixed query set —
  * produces (near-)identical counts at both scales; anything that
  * tracks the corpus (vocabulary, gram tables, per-doc/per-node state)
  * grows ≈5–10× and fails. Hint-free joins are out of scope by design:
  * without a hint, size-based planning + AQE pick broadcast only while
  * the RUNTIME size fits, which is the safe default this guard pushes
  * queries toward.
  *
  * Queries whose hinted frame is a corpus-slice STAND-IN for an
  * operationally bounded input are whitelisted with the reason —
  * in production these frames' sizes are fixed by ops, not by corpus
  * growth, but the testdata can only model them as a modulo slice.
  */
class BroadcastGuardSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sfSmall = "/root/testdata/sf0.001"
  private val sfBig = "/root/testdata/sf0.01"

  /** Hinted frames that grow with the TESTDATA corpus by construction
    * but are bounded operationally; each entry documents why. */
  private val whitelist: Map[String, String] = Map(
    "dd12_incremental_admission" ->
      ("delta side = one ingest shard (doc_id % 10 = 0 in testdata); " +
        "production deltas are bounded by the ingest batch, not the corpus"),
    "dc01_decontaminate" ->
      ("eval side = held-out benchmark (doc_id % 50 = 0 in testdata); " +
        "a real eval suite is a fixed few-MB artifact"),
    "cc01_curation_pipeline" ->
      ("same eval-benchmark stand-in as dc01 inside the funnel's " +
        "decontamination stage"),
    "ev12_lateness_audit" ->
      ("watermark table = one row per 5-minute trigger batch — bounded " +
        "by wall-clock span (a year ≈ 105k rows ≈ 2 MB), not event " +
        "volume; testdata only grows it until every slot is occupied"),
    "dc02_semantic_decontam" ->
      ("eval side = held-out benchmark embeddings (vec_id % 50 = 0 in " +
        "testdata); same fixed-eval-artifact reason as dc01 — a real " +
        "eval suite is a few thousand vectors regardless of corpus size"),
    "iv01_incremental_join" ->
      ("hinted frames are the dimension-upsert batch ΔS (c_custkey % 10 " +
        "= 0 in testdata); production deltas are bounded by the upsert " +
        "batch, not the standing table — same reason as dd12's shard"))

  /** Broadcast-hinted subtrees of an analyzed plan, traversal order. */
  private def hintedSubtrees(plan: LogicalPlan): Seq[LogicalPlan] =
    plan.collect { case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
      h.child
    }

  private def release(): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
  }

  test("no broadcast hint pins a corpus-growing frame (counts scale-invariant sf0.001→sf0.01)") {
    // pass 1 (cheap): find the queries that hint at all
    val hinted = Registry.all.flatMap { gq =>
      val subtrees =
        try hintedSubtrees(gq.build(spark, sfSmall).queryExecution.analyzed)
        finally release()
      if (subtrees.isEmpty) None else Some(gq.name)
    }.toSet

    val offenders = Registry.all.filter(q => hinted(q.name)).flatMap { gq =>
      def maxHintedCount(sf: String): Long = {
        // count BEFORE releasing: loop-built queries pin per-round
        // frames during construction and the hinted subtrees read them
        try {
          val trees = hintedSubtrees(gq.build(spark, sf).queryExecution.analyzed)
          if (trees.isEmpty) 0L
          else trees.map(t => GraftDatasetBridge.ofRows(spark, t).count()).max
        } finally release()
      }
      val small = maxHintedCount(sfSmall)
      val big = maxHintedCount(sfBig)
      // bounded ⇒ scale-invariant; ≤ max(64, 2×) absorbs fixed frames
      // that happen to be data-dependent in the tail (per-group tables
      // where a rare group exists only at the larger scale)
      if (big > math.max(64L, 2L * small) && !whitelist.contains(gq.name))
        Some(s"${gq.name}: largest hinted frame $small rows @sf0.001 → $big rows @sf0.01")
      else None
    }
    assert(offenders.isEmpty,
      "broadcast hints on corpus-growing frames (drop the hint — size-based " +
        "planning/AQE still broadcasts while it fits — or broadcast the " +
        "bounded side, or whitelist with an operational-boundedness reason):\n" +
        offenders.mkString("\n"))
  }

  test("whitelist names stay in sync with the registry") {
    val names = Registry.all.map(_.name).toSet
    val stale = whitelist.keys.filterNot(names)
    assert(stale.isEmpty, s"whitelisted queries no longer registered: ${stale.mkString(", ")}")
  }
}
