package graft

import org.scalatest.funsuite.AnyFunSuite

/** Session-conf hygiene: a registry query must leave the session's SQL
  * conf exactly as it found it — a leaked knob silently changes the
  * semantics or the safety margin of EVERY query that runs after it in
  * the same session (the round-10 finding: gr05 left
  * `spark.sql.cteRecursionRowLimit` at 100M, a 100× weaker
  * runaway-recursion guard for the rest of the session).
  *
  * Execution-time knobs that can't be scoped by try/finally (Spark
  * reads them when the lazy plan RUNS, not when the builder returns)
  * have two sanctioned idioms, both exercised in the registry:
  * eager-materialize inside the raised window (gr05), or a child
  * session via `newSession()` — shared SparkContext and extensions,
  * isolated conf (ad02, sy03).
  *
  * The whitelist below is the documented exception list, kept to
  * session-scoped OPT-INS that are semantics-safe for every other
  * query by construction. Anything else that survives a query is a
  * failure.
  */
class ConfHygieneSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Confs a query may legitimately leave set for the session. */
  private val sessionScoped: Set[String] = Set(
    // MvQueries: MV-rewrite opt-in. Safe to leave on: the rule fires
    // only on plans whose rewrite is exactly semantics-preserving
    // (MvSpec's disqualifier matrix) and ties each MV to its exact
    // fact path, so no other query's results can change.
    "spark.graft.mv.registry",
    // Tables.events: physical-type adapter for TIMESTAMP(NANOS)
    // parquet; a no-op for every non-NANOS column in the corpus.
    "spark.sql.legacy.parquet.nanosAsLong")

  test("every registry query leaves session conf as it found it") {
    val leaks = scala.collection.mutable.ListBuffer.empty[String]
    Registry.all.foreach { q =>
      val before = spark.conf.getAll
      try q.build(spark, sf).count()
      catch {
        case e: Throwable =>
          fail(s"${q.name} failed to run during the conf sweep: $e")
      }
      val after = spark.conf.getAll
      val changed = (before.keySet ++ after.keySet)
        .filter(k => before.get(k) != after.get(k))
        .filterNot(sessionScoped)
      if (changed.nonEmpty)
        leaks += s"${q.name}: " + changed.toSeq.sorted.map(k =>
          s"$k ${before.get(k).getOrElse("<unset>")} -> " +
            s"${after.get(k).getOrElse("<unset>")}").mkString(", ")
      // keep the sweep itself hygienic: a query that persists
      // internally must not squeeze the ones after it
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    assert(leaks.isEmpty,
      "queries leaked session conf:\n  " + leaks.mkString("\n  "))
  }
}
