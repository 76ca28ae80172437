package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `COUNT(DISTINCT x)` into the
  * HLL++ sketch aggregate when the session sets
  * `spark.graft.approxDistinct=true`.
  *
  * Why a RULE and not a code change: at 100 TB an exact distinct is
  * the single most state-hungry aggregate in the engine — the
  * deduplicating hash set is O(distinct keys) per group and usually
  * forces an extra Expand+shuffle round — while the sketch is 2^p
  * registers of CONSTANT state with map-side partial merge. Making
  * the swap an injected `Rule[LogicalPlan]` means any query — user
  * SQL included, with no code access — can flip the whole workload to
  * approximate mode per session, and the default stays exact. This is
  * the third Catalyst extension surface in the engine, next to the
  * injected functions (VectorExpressions/NfcNormalize) and the
  * injected TopKPerGroup physical strategy.
  *
  * Type-safe by construction: both Count and HyperLogLogPlusPlus
  * return LongType, and the AggregateExpression keeps its resultId so
  * upstream references still resolve. RewriteSpec pins plan shape and
  * accuracy (default 5% rsd) against the exact answer.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.approxDistinct", "false").toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate => agg.transformExpressions {
        case ae @ AggregateExpression(c: Count, _, true, _, _)
            if c.children.length == 1 =>
          ae.copy(
            aggregateFunction = HyperLogLogPlusPlus(c.children.head),
            isDistinct = false)
      }
    }
}
