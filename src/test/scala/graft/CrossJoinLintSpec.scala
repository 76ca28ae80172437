package graft

import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical._
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide scale lint: the ONLY sanctioned cross-join shape in
  * this library is the scalar-join idiom — `crossJoin(broadcast(x))`
  * where `x` is a ≤1-row aggregate or a tiny fixed grid. An
  * unconditioned join whose both sides grow with the corpus is the
  * classic 100 TB killer (it works at sf0.01, detonates at sf10), and
  * it can creep in silently as the registry grows: this spec walks the
  * OPTIMIZED logical plan of every registry query and fails the build
  * if any cross/unconditioned join has no provably-bounded side.
  *
  * Boundedness is a conservative structural recursion (not Catalyst
  * statistics, which are estimates): grouping-free aggregates are 1
  * row; LocalRelation/Range are their literal sizes; limits cap;
  * Generate (explode) and leaf relations are unbounded; joins multiply
  * and unions add. Anything unproven is unbounded — so a passing lint
  * is a real guarantee, not a hope. Queries with a legitimately
  * unbounded-side cross join must be whitelisted HERE with a reason,
  * making every exception reviewable in one place. */
class CrossJoinLintSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Cross-join exceptions: name → why the shape is safe anyway.
    * Bounded in fact but not by plan structure alone — each reason
    * names the bound the estimator can't see. */
  private val whitelist: Map[String, String] = Map(
    "it02_locf_resample" ->
      ("grid side is explode(sequence(min ts, max ts, 6h)) over a 1-row " +
        "aggregate: bounded by the data's TIME SPAN (~120 points), not " +
        "row count; output is |users|x|grid|, linear in users"),
    "mx03_budget_mix" ->
      ("water-filling policy math over the per-source frame (~20 rows, " +
        "source-cardinality-bounded); the k/theta scalars come from a " +
        "right-join against a 1-row frame the estimator can't bound"),
    "kn01_knn_classifier" ->
      ("held-out query side is the fixed vec_id < 64 prefix (64 rows, " +
        "scale-invariant) broadcast against the reference slice — the " +
        "sm01/pq01 bounded-query-side precedent; the slices are disjoint " +
        "so there is genuinely no join condition to condition on"),
    "pq01_pq_adc_search" ->
      ("ADC scoring joins the code table against the QUERY-side distance " +
        "tables — 3 rows by the vec_id < 3 prefix filter (sm01's bounded-" +
        "query-side precedent), a value bound the structural estimator " +
        "can't see; output is |codes| x 3, linear in the corpus"))

  /** Conservative upper bound on a plan's row count, or None. */
  private def est(p: LogicalPlan): Option[Long] = p match {
    case l: LocalRelation => Some(l.data.length.toLong)
    case r: Range => Some(r.numElements.toLong)
    case _: OneRowRelation => Some(1L)
    case a: Aggregate =>
      if (a.groupingExpressions.isEmpty) Some(1L) else est(a.child)
    case l: GlobalLimit => litValue(l.limitExpr) orElse est(l.child)
    case l: LocalLimit => litValue(l.limitExpr) orElse est(l.child)
    case e: Expand => est(e.child).map(_ * e.projections.size)
    case j: Join =>
      for (a <- est(j.left); b <- est(j.right)) yield a * b
    case u: Union =>
      val bs = u.children.map(est)
      if (bs.forall(_.isDefined)) Some(bs.flatten.sum) else None
    case _: Generate => None // explode expands unboundedly
    case d: Distinct => est(d.child)
    case d: Deduplicate => est(d.child)
    case w: Window => est(w.child)
    case p: Project => est(p.child)
    case f: Filter => est(f.child)
    case s: Sort => est(s.child)
    case h: ResolvedHint => est(h.child)
    case a: SubqueryAlias => est(a.child)
    case r: RepartitionOperation => est(r.child)
    case s: Sample => est(s.child)
    case _ => None // any unrecognized node: assume unbounded
  }

  private def litValue(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[Long] = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
      Some(v.toLong)
    case _ => None
  }

  test("every cross/unconditioned join in every registry query has a provably-bounded side") {
    val bad = scala.collection.mutable.Buffer[String]()
    Registry.all.foreach { gq =>
      val df =
        try gq.build(spark, sf)
        catch {
          case e: Throwable => fail(s"${gq.name} failed to build: $e")
        }
      df.queryExecution.optimizedPlan.foreach {
        case j: Join if j.condition.isEmpty || j.joinType == Cross =>
          val lb = est(j.left)
          val rb = est(j.right)
          val bound = (lb ++ rb).minOption
          val ok = bound.exists(_ <= 64) || whitelist.contains(gq.name)
          if (!ok)
            bad += s"${gq.name}: cross join with no bounded side " +
              s"(left=$lb right=$rb)\n  ${j.simpleString(2)}"
        case _ => ()
      }
      // iterative builders pin per-round frames; release between queries
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    assert(bad.isEmpty,
      s"\n${bad.size} unbounded cross join(s):\n${bad.mkString("\n")}")
  }
}
