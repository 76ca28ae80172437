package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe `NOT IN (subquery)` — the shuffle-able rewrite of the
  * NULL-aware anti join.
  *
  * Spark can execute a nullable `x NOT IN (SELECT j FROM B)` ONLY as a
  * broadcast null-aware anti join (BroadcastHashJoin with
  * isNullAwareAntiJoin=true): the three-valued-logic condition
  * `x = j OR x IS NULL OR j IS NULL` is not an equi-join, so without a
  * broadcast build side the planner falls to BroadcastNestedLoopJoin
  * or fails outright. q55 documents that ceiling honestly (fine to a
  * few million subquery keys, measured; impossible at an unbounded
  * 100 TB subquery). This helper is the rewrite a pipeline author
  * reaches for past that ceiling — identical 3VL semantics, composed
  * from scale-safe pieces:
  *
  *   `x NOT IN (S)` ≡  S is empty                       → TRUE
  *                  |  S contains NULL, or x IS NULL     → never TRUE
  *                  |  otherwise                         → x ∉ S
  *
  * so the plan is (1) ONE global aggregate over S producing a 1-row
  * (count, non-null count) stats frame — broadcast by construction at
  * ANY |S|; (2) a filter on the crossed-in stats encoding the first
  * two branches; (3) a plain LEFT ANTI equi-join for the third — the
  * shuffle-able shape (SMJ under a disabled broadcast threshold;
  * PlanSpec pins no BroadcastNestedLoopJoin and no
  * isNullAwareAntiJoin at threshold −1). The nj01 oracle row checks
  * all three branches against DuckDB's native NOT IN.
  */
object NullAwareAnti {

  /** Rows of `probe` whose `probeKey` is NOT IN `sub`'s `subKey`
    * column, under exact SQL NOT IN (3VL) semantics. Output columns =
    * probe's.
    *
    * The empty/null-bearing branches are decided by ONE bounded
    * runtime action — a global (count, non-null count) aggregate over
    * S collapsed to a single driver row — and the surviving branch
    * plans as the plain anti equi-join. This is runtime-adaptive
    * planning of the same class as AQE's (and cm02's sketch-based
    * join sizing): the gate is a planning decision, so no gate
    * operator exists in the executed plan at all — the earlier
    * declarative form (1-row stats crossed into the probe) planned as
    * a BroadcastNestedLoopJoin, which the nj01 pin bans outright to
    * keep the no-BNLJ contract unconditional. The aggregate's scan of
    * S is work every variant pays anyway (the anti join's build side
    * reads S too); the driver state is exactly two longs.
    *
    * BUILD-TIME GATE (static-input contract): the (count, non-null)
    * stats action runs when this method is CALLED, so constructing the
    * returned frame runs a Spark job, and the empty/null-bearing
    * branch decision is frozen at build time. Over the static testdata
    * corpus that is exactly right; callers feeding a mutable `sub`
    * must rebuild via this method after the input changes — the
    * returned frame does not re-evaluate the 3VL branch on re-execute. */
  def notIn(probe: DataFrame, probeKey: String, sub: DataFrame,
      subKey: String): DataFrame = {
    val stats = sub.agg(
      count(lit(1)).as("__naa_n"),
      count(col(subKey)).as("__naa_nn")).head()
    val (n, nonNull) = (stats.getLong(0), stats.getLong(1))
    if (n == 0L) probe // empty S: NOT IN is TRUE for every row
    else if (nonNull < n) probe.filter(lit(false)) // a NULL in S: never TRUE
    else probe
      .filter(col(probeKey).isNotNull) // UNKNOWN for NULL keys
      // plain equi anti join — shuffles, never a required broadcast
      .join(sub.select(col(subKey).as("__naa_k")),
        col(probeKey) === col("__naa_k"), "left_anti")
  }
}
