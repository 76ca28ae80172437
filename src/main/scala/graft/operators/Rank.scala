package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact-rank selection — the value at integer rank
  * `ceil(pct·n/100)` per group WITHOUT a per-group global sort.
  *
  * The naive plan (`row_number() OVER (PARTITION BY group ORDER BY v)`)
  * sorts each group inside ONE task: with a low-cardinality group key
  * (ws01's `l_returnflag` has 3 values) that is the whole table sorted
  * in 3 tasks — a scale-killer at 100 TB. Here the sort is the
  * distributed one:
  *
  *  1. `repartitionByRange(group, v)` — Spark's sampled range exchange
  *     spreads every group across many ordered partitions (parallelism
  *     = `spark.sql.shuffle.partitions`, tuned to data size, NOT to
  *     group-key cardinality);
  *  2. a per-(partition, group) local `row_number` — each window
  *     partition is one range slice of one group, bounded by
  *     rows-per-shuffle-partition;
  *  3. global rank = local rank + the group's total row count in all
  *     lower-range partitions — a (#partitions × #groups)-row
  *     prefix-sum table, broadcast back.
  *
  * The value at a global rank is invariant to where the sampled range
  * boundaries fall (ties may straddle partitions; equal values are
  * interchangeable), so the output is deterministic even though the
  * range sampling is not. The count table and the local ranks both
  * hang off the SAME range exchange, which Catalyst/AQE plan once and
  * reuse (ReusedExchange / AQE stage reuse) — so `spark_partition_id`
  * is observed on one physical shuffle, not two possibly-different
  * ones; RankSpec pins the reuse and the end values.
  */
object Rank {

  /** One row per group: `groupCol` plus one column per `(alias, pct)`
    * — the group's value at discrete rank `(n·pct+99) div 100`
    * (1-based ceil semantics, integer arithmetic, so any engine picks
    * the identical element; no interpolation, no float rank math).
    * `valCol` must be non-null. Output is NOT sorted — callers order. */
  def discretePercentiles(df: DataFrame, groupCol: String, valCol: String,
      pcts: Seq[(String, Int)]): DataFrame = {
    val parted = df.select(col(groupCol).as("g"), col(valCol).as("v"))
      .repartitionByRange(col("g"), col("v"))
      .withColumn("pid", spark_partition_id())
    val cnts = parted.groupBy("pid", "g").agg(count(lit(1)).as("c"))
    val offs = cnts.select(col("pid"), col("g"),
      coalesce(sum("c").over(Window.partitionBy("g").orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off"))
    val tgt = cnts.groupBy("g").agg(sum("c").as("n"))
      .select(col("g") +: pcts.map { case (a, p) =>
        expr(s"(n * $p + 99) div 100").as(s"r_$a") }: _*)
    val isHit: Column = pcts.map { case (a, _) =>
      col("grank") === col(s"r_$a") }.reduce(_ || _)
    val aggs = pcts.map { case (a, _) =>
      max(when(col("grank") === col(s"r_$a"), col("v"))).as(a) }
    parted
      .withColumn("rn", row_number().over(
        Window.partitionBy("pid", "g").orderBy("v")))
      .join(broadcast(offs), Seq("pid", "g"))
      .withColumn("grank", col("off") + col("rn"))
      .join(broadcast(tgt), Seq("g"))
      .filter(isHit)
      .groupBy("g")
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("g", groupCol)
  }
}
