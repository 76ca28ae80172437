package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.GraftDatasetBridge
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: top-k rows per group — the §7.4 path (c)
  * (LogicalPlan + Strategy + SparkPlan) for the one relational shape
  * where Spark's built-in plan is structurally wasteful: the
  * window-function idiom (`row_number().over(partitionBy(g).orderBy(o))
  * <= k`) sorts EVERY row of every group, while top-k needs only a
  * k-bounded heap per group.
  *
  * Physical shape mirrors partial/final aggregation: a map-side
  * partial TopK (≤ k rows per group per partition — this is the
  * operator's shuffle reduction: the exchange carries k·groups·tasks
  * rows instead of everything), then a shuffle clustered on the group
  * keys (inserted automatically by EnsureRequirements from
  * `requiredChildDistribution`), then a final TopK. Ties must be
  * broken by the caller's order expression (pass a struct ending in a
  * unique key) — same contract as a deterministic ORDER BY.
  *
  * Memory bound: the partial stage keeps ≤ k rows for EVERY group its
  * partition sees, in an in-memory map with no spill — per-task memory
  * is O(k · groups-per-partition · row size). That is the operator's
  * intended envelope: low-to-moderate group cardinality where the
  * window idiom's full-group sort is the waste. For an unbounded /
  * very-high-cardinality group key, prefer the spillable window idiom
  * (`row_number().over(...)` ≤ k) — Spark's WindowExec sorts via
  * spillable UnsafeExternalSorter and never holds more than a spill
  * page of groups in memory.
  */
object TopKPerGroup {

  final case class TopKNode(k: Int, groupExprs: Seq[Expression],
      orderExpr: Expression, desc: Boolean, child: LogicalPlan)
    extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
      copy(child = c)
  }

  final case class TopKExec(k: Int, groupExprs: Seq[Expression],
      orderExpr: Expression, desc: Boolean, finalStage: Boolean,
      child: SparkPlan)
    extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def requiredChildDistribution: Seq[Distribution] =
      if (finalStage) ClusteredDistribution(groupExprs) :: Nil
      else UnspecifiedDistribution :: Nil

    override protected def doExecute(): RDD[InternalRow] = {
      val kk = k
      val groupE = groupExprs
      val orderE = orderExpr
      val dsc = desc
      val childOutput = child.output
      child.execute().mapPartitions { iter =>
        val groupProj = UnsafeProjection.create(groupE, childOutput)
        val bound = BindReferences.bindReference(orderE, childOutput)
        val direction = if (dsc) Descending else Ascending
        val better = RowOrdering.create(Seq(SortOrder(bound, direction)), Nil)
        // per group: array of ≤ k rows kept sorted worst-first (k is
        // small; insertion is O(k) with no allocation churn)
        val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow,
          scala.collection.mutable.ArrayBuffer[InternalRow]]
        iter.foreach { row =>
          val key = groupProj(row).copy()
          val buf = heaps.getOrElseUpdate(key,
            new scala.collection.mutable.ArrayBuffer[InternalRow](kk + 1))
          // buf is kept sorted worst-first: buf.head is the weakest of
          // the ≤ k kept rows (compare(a,b) < 0 ⇔ a ranks before b)
          if (buf.size < kk || better.compare(row, buf.head) < 0) {
            val copied = row.copy()
            var i = 0
            while (i < buf.size && better.compare(buf(i), copied) > 0) i += 1
            buf.insert(i, copied)
            if (buf.size > kk) buf.remove(0)
          }
        }
        heaps.iterator.flatMap(_._2.reverseIterator)
      }
    }

    override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
      copy(child = c)
  }

  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKNode(k, g, o, desc, child) =>
        val partial = TopKExec(k, g, o, desc, finalStage = false, planLater(child))
        TopKExec(k, g, o, desc, finalStage = true, partial) :: Nil
      case _ => Nil
    }
  }

  /** Public API: top-k rows per group, ordered by `order` (pass a
    * struct ending in a unique column for deterministic ties). */
  def perGroup(df: DataFrame, groupCols: Seq[Column], order: Column,
      k: Int, desc: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    val resolve = df.select(groupCols :+ order: _*).queryExecution.analyzed
      .expressions
    val node = TopKNode(k,
      resolve.init.map(stripAlias), stripAlias(resolve.last), desc, analyzed)
    GraftDatasetBridge.ofRows(spark, node)
  }

  private def stripAlias(e: Expression): Expression = e match {
    case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
    case other => other
  }
}
