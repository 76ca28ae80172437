package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** Transparent MATERIALIZED-VIEW REWRITE — an injected optimizer rule
  * that redirects matching aggregates over a registered fact-table
  * scan to a pre-aggregated summary table, merging partial aggregates
  * instead of re-scanning the fact table.
  *
  * Why this is a scale feature and not a convenience: at 100 TB the
  * summary table for (l_returnflag, l_linestatus) is SIX ROWS. A
  * dashboard-shaped aggregate that would scan the whole fact table
  * every run instead reads kilobytes — the classic Calcite/warehouse
  * summary-table serving path — and because the rewrite happens in the
  * optimizer, user SQL gets it with zero code changes. The rewrite is
  * CORRECT BY ALGEBRA, not by query identity: any aggregate whose
  * grouping is a subset of an MV's dimensions and whose measures are
  * derivable from that MV's partial states (COUNT(*) → SUM(cnt),
  * SUM(x) → SUM(partial_sum_x)) produces identical results, including
  * roll-ups to coarser grains than the MV was built at.
  *
  * MV REGISTRY (the subsystem form — the round-10 rule hard-coded one
  * lineitem MV): `spark.graft.mv.registry` holds `;`-separated specs
  *   `<mvPath>|<factPath>|<dim,dim,...>|<factCol:mvCol,...>`
  * each defining one summary table: where it lives, WHICH EXACT fact
  * table it was built from, its grain columns, and the fact-column →
  * partial-sum-column measure map (the COUNT partial is always the
  * `cnt` column by convention). Candidates are tried in registry
  * order; the first whose dims cover the grouping and whose measures
  * cover the aggregates serves the query.
  *
  * Scope contract per MV (documented, enforced structurally —
  * anything outside it is left untouched):
  *  - the child must be THE fact scan the MV was built from — the
  *    relation's rootPaths must equal the registered factPath exactly
  *    (never "any file named lineitem.parquet": in a multi-corpus JVM
  *    a name-only match would silently serve sf-dir B's query from
  *    sf-dir A's MV) — behind any stack of column-pruning Projects
  *    and AT MOST dimension-only Filters: a DETERMINISTIC,
  *    subquery-free predicate referencing only MV grain columns
  *    commutes with the grain aggregation (σ_dims ∘ γ_dims = γ_dims ∘
  *    σ_dims — it selects whole groups), so it is replayed verbatim
  *    over the MV. A predicate touching a non-dim column (a measure,
  *    a date outside the grain) disqualifies the plan, since the MV
  *    pre-aggregated those rows away; so does a non-deterministic one
  *    (rand() < 0.5 over the MV would sample GROUPS, not fact rows)
  *    or one carrying a subquery (its semantics depend on cardinality
  *    the MV collapsed);
  *  - grouping keys ⊆ the MV's dims, non-empty (a grand-total
  *    aggregate over an EMPTY fact table would need COUNT's 0-vs-null
  *    special case; with grouping keys the group rows simply don't
  *    exist, so SUM-of-partials is exact);
  *  - measures: COUNT(1) and SUM over the Det.dec2-cast registered
  *    fact columns — the engine's deterministic-sum idiom — with no
  *    DISTINCT and no FILTER clause. The merged SUM re-casts to the
  *    original result type so every output attribute keeps its exprId
  *    AND dataType, leaving parent plans untouched.
  *
  * Empty/unset registry = rule disabled. MVs are written by
  * [[graft.operators.MvQueries]]; each carries its grain columns plus
  * partial states (`cnt` BIGINT, one DECIMAL partial sum per measure).
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** One registered summary table. */
  final case class MvSpec(
      mvPath: String,
      factPath: String,
      dims: Set[String],
      measures: Map[String, String])

  def parseRegistry(conf: String): Seq[MvSpec] =
    conf.split(';').toSeq.map(_.trim).filter(_.nonEmpty).flatMap { entry =>
      entry.split('|') match {
        case Array(mv, fact, dims, meas) =>
          val kvs = meas.split(',').map(_.trim).filter(_.nonEmpty)
            .map(_.split(':'))
          // a measure token that isn't exactly alias:agg poisons the
          // whole entry — skip it rather than bind a half-parsed spec
          if (kvs.exists(_.length != 2)) None
          else Some(MvSpec(mv, normalize(fact),
            dims.split(',').map(_.trim).filter(_.nonEmpty).toSet,
            kvs.map(a => a(0) -> a(1)).toMap))
        case _ => None // malformed entry: skip, never crash planning
      }
    }

  /** Scheme-insensitive path identity ("file:/x" ≡ "/x"). */
  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  private object NoRewrite extends Exception

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val specs = parseRegistry(conf.getConfString("spark.graft.mv.registry", ""))
    if (specs.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(groups, _, child, _) if groups.nonEmpty =>
        specs.iterator
          .flatMap { spec =>
            destructure(child, spec) match {
              case Some(conds) => rewrite(agg, spec, conds)
              case None => None
            }
          }
          .nextOption()
          .getOrElse(agg)
    }
  }

  /** Unwrap the fact scan from any stack of attribute-only Projects
    * and Filters, collecting filter conditions on the way down.
    * Returns None unless the leaf is EXACTLY this spec's fact
    * relation. Whether the collected conditions are dim-only (hence
    * replayable over the MV) is the caller's check — it needs the
    * attribute names. */
  private def destructure(p: LogicalPlan, spec: MvSpec): Option[Seq[Expression]] =
    p match {
      case lr: LogicalRelation if isFactRelation(lr, spec) => Some(Nil)
      case Project(projList, child)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        destructure(child, spec)
      case Filter(cond, child) => destructure(child, spec).map(cond +: _)
      case _ => None
    }

  /** The relation serves this MV iff its rootPaths are exactly the
    * registered fact path — path identity, not file-name matching. */
  private def isFactRelation(lr: LogicalRelation, spec: MvSpec): Boolean =
    lr.relation match {
      case fs: HadoopFsRelation =>
        val roots = fs.location.rootPaths.map(r => normalize(r.toString))
        roots.nonEmpty && roots.forall(_ == spec.factPath)
      case _ => false
    }

  private def rewrite(
      agg: Aggregate,
      spec: MvSpec,
      conds: Seq[Expression]): Option[Aggregate] = {
    val childOutput = agg.child.outputSet
    // every collected filter condition must be deterministic,
    // subquery-free, and touch ONLY grain columns — those select whole
    // groups, so they replay verbatim over the MV
    val condsOk = conds.forall(c =>
      c.deterministic &&
        !c.exists(_.isInstanceOf[SubqueryExpression]) &&
        c.references.forall(a => spec.dims.contains(a.name)))
    if (!condsOk) return None
    val okGroups = agg.groupingExpressions.forall {
      case a: AttributeReference => spec.dims.contains(a.name)
      case _ => false
    }
    if (!okGroups) return None

    // structural checks passed: NOW pay the MV read (schema from the
    // summary table's footer; a fresh read per rewrite keeps exprIds
    // unique if one query matches twice). A stale registration — the
    // MV file deleted while the conf still points at it — must degrade
    // to the fact scan, not fail the user's query: an optimizer rule
    // may improve a plan, never break one.
    val mvPlan =
      try SparkSession.active.read.parquet(spec.mvPath).queryExecution.analyzed
      catch { case _: Exception => return None }
    val mvOut: Map[String, Attribute] = mvPlan.output.map(a => a.name -> a).toMap
    def mvCol(name: String): Attribute = mvOut.getOrElse(name, throw NoRewrite)

    def rewriteAgg(ae: AggregateExpression): Expression = {
      if (ae.isDistinct || ae.filter.isDefined) throw NoRewrite
      ae.aggregateFunction match {
        // COUNT(1) over fact rows == SUM of the MV's per-group counts
        case Count(Seq(Literal(1, _))) =>
          ae.copy(aggregateFunction = Sum(mvCol("cnt")))
        case s: Sum => s.child match {
          // SUM(CAST(x AS DECIMAL(12,2))) == SUM of MV partial sums,
          // re-cast to the original (narrower) result type
          case c: Cast => c.child match {
            case a: AttributeReference
                if childOutput.contains(a) && spec.measures.contains(a.name) &&
                  c.dataType == DecimalType(12, 2) =>
              Cast(ae.copy(aggregateFunction =
                s.copy(child = mvCol(spec.measures(a.name)))), ae.dataType)
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
      val newGroups = agg.groupingExpressions.map {
        case a: AttributeReference => mvCol(a.name)
      }
      val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
        // top-level grouping attribute: alias the MV column under the
        // original exprId so parent references still resolve
        case a: AttributeReference if childOutput.contains(a) =>
          if (spec.dims.contains(a.name)) Alias(mvCol(a.name), a.name)(exprId = a.exprId)
          else throw NoRewrite
        case other =>
          other.transformDown {
            case ae: AggregateExpression => rewriteAgg(ae)
            case a: AttributeReference if childOutput.contains(a) =>
              if (spec.dims.contains(a.name)) mvCol(a.name) else throw NoRewrite
          }.asInstanceOf[NamedExpression]
      }
      val newChild =
        if (conds.isEmpty) mvPlan
        else Filter(
          conds.map(_.transform {
            case a: AttributeReference => mvCol(a.name)
          }).reduce(And), mvPlan)
      Some(Aggregate(newGroups, newAggExprs, newChild))
    } catch {
      case NoRewrite => None
    }
  }
}
