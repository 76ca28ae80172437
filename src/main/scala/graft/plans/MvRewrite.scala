package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** Transparent MATERIALIZED-VIEW REWRITE — an injected optimizer rule
  * that redirects matching aggregates over the raw `lineitem` scan to
  * a pre-aggregated summary table, merging partial aggregates instead
  * of re-scanning the fact table.
  *
  * Why this is a scale feature and not a convenience: at 100 TB the
  * summary table for (l_returnflag, l_linestatus) is SIX ROWS. A
  * dashboard-shaped aggregate that would scan the whole fact table
  * every run instead reads kilobytes — the classic Calcite/warehouse
  * summary-table serving path — and because the rewrite happens in the
  * optimizer, user SQL gets it with zero code changes. The rewrite is
  * CORRECT BY ALGEBRA, not by query identity: any aggregate whose
  * grouping is a subset of the MV's dimensions and whose measures are
  * derivable from the MV's partial states (COUNT(*) → SUM(cnt),
  * SUM(x) → SUM(partial_sum_x)) produces identical results, including
  * roll-ups to coarser grains than the MV was built at.
  *
  * Scope contract (documented, enforced structurally — anything
  * outside it is left untouched):
  *  - the child must be the lineitem scan behind any stack of
  *    column-pruning Projects and AT MOST dimension-only Filters: a
  *    predicate that references only MV grain columns commutes with
  *    the grain aggregation (σ_dims ∘ γ_dims = γ_dims ∘ σ_dims — it
  *    selects whole groups), so it is replayed verbatim over the MV;
  *    any predicate touching a non-dim column (a measure, a date)
  *    disqualifies the plan, since the MV pre-aggregated those rows
  *    away. Relations here are path-identified (`lineitem.parquet`),
  *    the honest analog of catalog-table identity for a path-based
  *    corpus;
  *  - grouping keys ⊆ {l_returnflag, l_linestatus}, non-empty (a
  *    grand-total aggregate over an EMPTY fact table would need
  *    COUNT's 0-vs-null special case; with grouping keys the group
  *    rows simply don't exist, so SUM-of-partials is exact);
  *  - measures: COUNT(1) and SUM over the Det.dec2-cast quantity /
  *    extendedprice columns — the engine's deterministic-sum idiom —
  *    with no DISTINCT and no FILTER clause. The merged SUM re-casts
  *    to the original result type so every output attribute keeps its
  *    exprId AND dataType, leaving parent plans untouched.
  *
  * Opt-in per session: `spark.graft.mv.lineitemAgg=<parquet path>`
  * (empty = rule disabled). The MV itself carries grain columns
  * (l_returnflag, l_linestatus) and partial states (cnt BIGINT,
  * sum_qty / sum_price DECIMAL) written by [[graft.operators.MvQueries]].
  */
object MvRewrite extends Rule[LogicalPlan] {
  private val Dims = Set("l_returnflag", "l_linestatus")
  /** fact column (under the dec2 cast) -> MV partial-sum column */
  private val Measures = Map(
    "l_quantity" -> "sum_qty",
    "l_extendedprice" -> "sum_price")

  private object NoRewrite extends Exception

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mvPath = conf.getConfString("spark.graft.mv.lineitemAgg", "")
    if (mvPath.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(groups, _, child, _)
          if groups.nonEmpty && destructure(child).isDefined =>
        rewrite(agg, mvPath).getOrElse(agg)
    }
  }

  /** Unwrap the fact scan from any stack of attribute-only Projects
    * and Filters, collecting filter conditions on the way down.
    * Returns None unless the leaf is the lineitem relation. Whether
    * the collected conditions are dim-only (hence replayable over the
    * MV) is the caller's check — it needs the attribute names. */
  private def destructure(p: LogicalPlan): Option[Seq[Expression]] = p match {
    case lr: LogicalRelation if isLineitemRelation(lr) => Some(Nil)
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      destructure(child)
    case Filter(cond, child) => destructure(child).map(cond +: _)
    case _ => None
  }

  private def isLineitemRelation(lr: LogicalRelation): Boolean =
    lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(_.toString.contains("lineitem.parquet"))
      case _ => false
    }

  private def rewrite(agg: Aggregate, mvPath: String): Option[Aggregate] = {
    val childOutput = agg.child.outputSet
    // every collected filter condition must touch ONLY grain columns —
    // those select whole groups, so they replay verbatim over the MV
    val conds = destructure(agg.child).get
    if (!conds.forall(_.references.forall(a => Dims.contains(a.name))))
      return None
    // fresh relation over the summary table; attribute ids are new, so
    // every original output is re-derived under its ORIGINAL exprId
    val mvPlan = SparkSession.active.read.parquet(mvPath)
      .queryExecution.analyzed
    val mvOut: Map[String, Attribute] = mvPlan.output.map(a => a.name -> a).toMap

    def rewriteAgg(ae: AggregateExpression): Expression = {
      if (ae.isDistinct || ae.filter.isDefined) throw NoRewrite
      ae.aggregateFunction match {
        // COUNT(1) over fact rows == SUM of the MV's per-group counts
        case Count(Seq(Literal(1, _))) =>
          ae.copy(aggregateFunction = Sum(mvOut("cnt")))
        case s: Sum => s.child match {
          // SUM(CAST(x AS DECIMAL(12,2))) == SUM of MV partial sums,
          // re-cast to the original (narrower) result type
          case c: Cast => c.child match {
            case a: AttributeReference
                if childOutput.contains(a) && Measures.contains(a.name) &&
                  c.dataType == DecimalType(12, 2) =>
              Cast(ae.copy(aggregateFunction =
                s.copy(child = mvOut(Measures(a.name)))), ae.dataType)
            case _ => throw NoRewrite
          }
          // a merge node this rule already built (transformDown also
          // visits the children of every replacement it makes): Sum
          // over an MV attribute — not a fact column — is ours already
          case a: AttributeReference if !childOutput.contains(a) => ae
          case _ => throw NoRewrite
        }
        case _ => throw NoRewrite
      }
    }

    try {
      val okGroups = agg.groupingExpressions.forall {
        case a: AttributeReference => Dims.contains(a.name)
        case _ => false
      }
      if (!okGroups) return None
      val newGroups = agg.groupingExpressions.map {
        case a: AttributeReference => mvOut(a.name)
      }
      val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
        // top-level grouping attribute: alias the MV column under the
        // original exprId so parent references still resolve
        case a: AttributeReference if childOutput.contains(a) =>
          if (Dims.contains(a.name)) Alias(mvOut(a.name), a.name)(exprId = a.exprId)
          else throw NoRewrite
        case other =>
          other.transformDown {
            case ae: AggregateExpression => rewriteAgg(ae)
            case a: AttributeReference if childOutput.contains(a) =>
              if (Dims.contains(a.name)) mvOut(a.name) else throw NoRewrite
          }.asInstanceOf[NamedExpression]
      }
      val newChild =
        if (conds.isEmpty) mvPlan
        else Filter(
          conds.map(_.transform {
            case a: AttributeReference => mvOut(a.name)
          }).reduce(And), mvPlan)
      Some(Aggregate(newGroups, newAggExprs, newChild))
    } catch {
      case NoRewrite => None
    }
  }
}
