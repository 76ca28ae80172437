package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Mergeable quantile sketch as a NATIVE Catalyst aggregate
  * (`TypedImperativeAggregate`) — the aggregation tier below the typed
  * `Aggregator` API (ua01/ty01): the state object lives directly in the
  * aggregation buffer, partial states stream through Spark's standard
  * partial→merge→final pipeline via `serialize`/`deserialize`, and the
  * function is callable from BOTH the Column API and SQL text once
  * registered (the Datasketches-KLL deployment shape, re-expressed on
  * Catalyst internals; Karnin–Lang–Liberty 2016 and the classic
  * Manku–Rajagopalan–Lindsay buffer scheme are the published designs
  * this follows).
  *
  * Structure: a stack of buffers ("levels"); an item at level i carries
  * weight 2^i. Updates append to level 0; a level reaching `k` items is
  * COMPACTED — sorted, collapsed pairwise (one survivor per adjacent
  * pair, carrying the pair's combined weight) into the level above. An
  * odd element stays put, so total carried weight ALWAYS equals the
  * exact input count. Memory is O(k·log(n/k)) however large the group;
  * each pairwise collapse at level i perturbs any rank by at most 2^i,
  * which is what bounds the final rank error (SketchSpec pins an
  * empirical ε·n envelope under forced-small k, across partitionings).
  *
  * Determinism contract (the repo-wide "degenerates to exact" rule —
  * same as hn01's count-calibrated cells): while every per-group input
  * count stays BELOW k, no compaction ever fires, the sketch carries
  * the exact multiset whatever the partition/merge order, and the
  * estimator below returns the EXACT type-1 discrete quantile — which
  * is how qs01 stays DuckDB-oracle-checkable at every driver scale
  * while the same plan degrades gracefully (bounded error, bounded
  * memory) on 100 TB groups. Pair-collapse keeps the LATER element of
  * each sorted pair — a fixed, documented choice; under compaction the
  * result can depend on merge order (any mergeable sketch's nature),
  * but the error envelope holds for every order.
  *
  * Estimator: integer-exact type-1 (lower) discrete quantile — for
  * percent p over total weight N the target rank is ⌈p·N/100⌉ computed
  * as (p·N+99) div 100 in int64, NEVER in floating point: 0.95·N in
  * IEEE double rounds differently than DuckDB's DECIMAL literal
  * arithmetic exactly when p·N lands on an integer, so both engine and
  * oracle use the same integer formula (the Det-object discipline
  * applied to ranks).
  */
object KllQuantiles {

  /** Aggregation state: one growable buffer per level. Compaction
    * keeps per-level occupancy < k, so a state never exceeds
    * k·(log2(n/k)+2) doubles. */
  final class State(val k: Int) {
    val levels: ArrayBuffer[ArrayBuffer[Double]] =
      ArrayBuffer(ArrayBuffer.empty[Double])
    var count: Long = 0L

    def insert(v: Double): Unit = {
      levels(0) += v
      count += 1L
      if (levels(0).length >= k) compactFrom(0)
    }

    /** Collapse level i into i+1, cascading while any level is full.
      * The buffer is sorted, adjacent pairs collapse to their LATER
      * element with doubled weight; an odd leading element stays at
      * level i (weight conservation — count is never distorted). */
    private def compactFrom(start: Int): Unit = {
      var i = start
      while (i < levels.length && levels(i).length >= k) {
        val buf = levels(i)
        val sorted = buf.toArray
        java.util.Arrays.sort(sorted)
        if (i + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
        val odd = sorted.length % 2
        buf.clear()
        if (odd == 1) buf += sorted(0)
        var j = odd
        while (j + 1 < sorted.length) {
          levels(i + 1) += sorted(j + 1)
          j += 2
        }
        i += 1
      }
    }

    def merge(other: State): Unit = {
      var i = 0
      while (i < other.levels.length) {
        if (i >= levels.length) levels += ArrayBuffer.empty[Double]
        levels(i) ++= other.levels(i)
        i += 1
      }
      count += other.count
      compactFrom(0)
      // compactFrom only cascades through full levels starting at 0;
      // a level made full by the concat above a non-full one still
      // needs its own pass
      var l = 0
      while (l < levels.length) {
        if (levels(l).length >= k) compactFrom(l)
        l += 1
      }
    }

    /** Type-1 discrete quantiles for integer percents, integer-exact
      * rank arithmetic (see object doc). */
    def quantiles(percents: Array[Int]): Array[Double] = {
      val n = levels.iterator.map(_.length).sum
      val vs = new Array[Double](n)
      val ws = new Array[Long](n)
      var idx = 0
      var lvl = 0
      while (lvl < levels.length) {
        val w = 1L << lvl
        val buf = levels(lvl)
        var j = 0
        while (j < buf.length) {
          vs(idx) = buf(j); ws(idx) = w; idx += 1; j += 1
        }
        lvl += 1
      }
      // sort (value, weight) pairs by value — indices sorted indirectly
      val order = Array.range(0, n).sortBy(vs(_))
      percents.map { p =>
        val target = math.max(1L, (p.toLong * count + 99L) / 100L)
        var cum = 0L
        var j = 0
        var out = vs(order(n - 1))
        var found = false
        while (j < n && !found) {
          cum += ws(order(j))
          if (cum >= target) { out = vs(order(j)); found = true }
          j += 1
        }
        out
      }
    }
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"kll_quantiles $what must be an integer literal, got $other")
  }

  /** Registry-face constructor: kll_quantiles(value, k, p1, p2, ...). */
  def fromExprs(exprs: Seq[Expression]): KllQuantilesAgg = {
    require(exprs.length >= 3,
      "kll_quantiles(value, k, percent...) needs at least one percent")
    val k = litInt(exprs(1), "k")
    require(k >= 8, s"kll_quantiles k must be >= 8, got $k")
    val ps = exprs.drop(2).map(litInt(_, "percent"))
    ps.foreach(p => require(p >= 1 && p <= 100,
      s"kll_quantiles percents must be in [1,100], got $p"))
    KllQuantilesAgg(exprs.head, k, ps)
  }
}

/** See [[KllQuantiles]]. Returns array<double>, one entry per requested
  * percent, in argument order. NULL inputs are skipped (SQL aggregate
  * convention); an all-NULL / empty group yields NULL. */
case class KllQuantilesAgg(
    child: Expression,
    k: Int,
    percents: Seq[Int],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllQuantiles.State]
  with UnaryLike[Expression] {

  override def prettyName: String = "kll_quantiles"
  // AbstractDataType (ImplicitCastInputTypes' vocabulary) is
  // private[sql], so the input contract is enforced the same way the
  // repo's other native expressions do it: fail ANALYSIS, not runtime
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantiles requires a double value column, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): KllQuantiles.State =
    new KllQuantiles.State(k)

  override def update(b: KllQuantiles.State, input: InternalRow): KllQuantiles.State = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Double])
    b
  }

  override def merge(b: KllQuantiles.State, o: KllQuantiles.State): KllQuantiles.State = {
    b.merge(o); b
  }

  override def eval(b: KllQuantiles.State): Any =
    if (b.count == 0L) null
    else new GenericArrayData(b.quantiles(percents.toArray))

  override def serialize(b: KllQuantiles.State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeLong(b.count)
    out.writeInt(b.levels.length)
    b.levels.foreach { buf =>
      out.writeInt(buf.length)
      buf.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllQuantiles.State = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new KllQuantiles.State(in.readInt())
    st.count = in.readLong()
    val nLevels = in.readInt()
    st.levels.clear()
    var i = 0
    while (i < nLevels) {
      val sz = in.readInt()
      val buf = new ArrayBuffer[Double](sz)
      var j = 0
      while (j < sz) { buf += in.readDouble(); j += 1 }
      st.levels += buf
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(n: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllQuantilesAgg =
    copy(child = newChild)
}
