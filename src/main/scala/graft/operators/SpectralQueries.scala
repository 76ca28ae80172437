package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spectral / statistical analysis over the embedding corpus: the
  * distributed-linear-algebra family a training-data pipeline uses for
  * embedding QA (dead or drifting dimensions), collection-level
  * structure (dominant principal direction), and centroid-distance
  * outlier mining.
  *
  * Scale shape — the classical two-phase split used by Spark MLlib's
  * `RowMatrix` PCA (computeGramianMatrix): the CORPUS-sized work is one
  * map-side-combinable aggregation producing a d×d Gram matrix (d = 64
  * here → 4 096 numbers, constant in corpus size); the EIGEN work then
  * runs on that bounded d×d object on the driver. Nothing iterative
  * ever touches the corpus; adding rows changes only the one-pass
  * aggregation's input.
  *
  * Determinism (the ivf03 idiom, IvfQueries.scala): embeddings are
  * int64-quantized `round(e·1000)` so every cross-row sum — Gram
  * entries, per-dim moments, outlier scores — is exact integer
  * arithmetic, order-independent across Spark shuffles and engines.
  * The power iteration itself runs in scaled-integer arithmetic
  * (truncating div toward zero, identical in Java `/` and DuckDB `//`)
  * so Spark's driver loop and the oracle's unrolled CTE chain produce
  * bit-identical vectors; the only floating-point ops are one final
  * exactly-rounded divide/sqrt per output value.
  */
object SpectralQueries {
  import VectorSql.Dim
  /** embedding dimensionality, re-exported for specs */
  val EmbDim: Int = Dim

  /** Fixed power-iteration round count — part of the QUERY CONTRACT
    * (the oracle unrolls exactly this many rounds): the result is the
    * exact k-step iterate, not "the converged eigenvector". On real
    * embedding corpora the dominant direction is strongly anisotropic
    * ("all-but-the-top", Mu & Viswanath 2018) and (λ₂/λ₁)^8 ≪ 1; the
    * synthetic sf tables are near-isotropic (λ₂/λ₁ ≈ 0.98), where ANY
    * k converges slowly — the driver check verifies both engines
    * compute the identical iterate, and SpectralSpec verifies the
    * Rayleigh quotient improves monotonically with k. */
  private val ITERS = 8
  /** per-iteration rescale bound: keeps u = G·v inside Long — with
    * |q| ≤ 2e4 and n ≤ 1e8 rows, |G| ≤ n·q² = 4e16 is out of reach of
    * the sf ladder (actual sf0.1: |G| ≤ 2000·600² ≈ 7.2e8), and
    * |u| ≤ Dim·|G|·V = 64·|G|·256 stays far below 2^63 for every
    * corpus this engine is oracle-checked on. The overflow-governing
    * bound is documented rather than runtime-checked: BIGINT overflow
    * raises in both engines, it never wraps silently. */
  private val V = 256L
  /** final rescales: SHIFT drops low bits so the ×2^20 loading
    * numerator (and the ×16 Rayleigh vector) cannot overflow. */
  private val SHIFT = 65536L
  private val WSCALE = 1048576L // 2^20 — loading resolution ~1e-6
  private val RSCALE = 16L // Rayleigh vector bound: terms ≤ 16²·|G|·Dim²

  private def q(name: String, doc: String, sql: String)(
      build: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, build, Some(sql), doc)

  /** int64-quantized embedding rows (the ivf03 quantizer). */
  private def quantized(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      transform(col("embedding"),
        e => round(e.cast(DoubleType) * 1000).cast(LongType)).as("q"))

  /** DuckDB-side exploded quantized view: (vec_id, i, q).
    * MATERIALIZED: DuckDB inlines plain CTEs per reference — in the
    * pc01 oracle's unrolled iteration chain that inlining is
    * exponential in the round count, so every multiply-referenced CTE
    * there is pinned explicitly. */
  private val sqlX =
    s"""x AS MATERIALIZED (
       |  SELECT vec_id, CAST(t.i AS BIGINT) AS i,
       |    CAST(ROUND(CAST(embedding[t.i] AS DOUBLE) * 1000) AS BIGINT) AS q
       |  FROM embeddings CROSS JOIN generate_series(1, $Dim) t(i))""".stripMargin

  // ------------------------------------------------------------- Gram

  /** Distributed Gram accumulator: one pass, buffer = flat d×d Long
    * array plus a row count (slot d²) — 32 KB of state per task
    * REGARDLESS of corpus size, merged exactly (integer adds commute).
    * Partial aggregation runs map-side; only ~#partitions buffers ever
    * shuffle. The d² inner loop is per-row CPU, not data movement —
    * the same cost profile as MLlib's RowMatrix Gramian. */
  private object GramAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](Dim * Dim + 1)
    def reduce(b: Array[Long], row: Seq[Long]): Array[Long] = {
      val a = row.toArray
      var i = 0
      while (i < Dim) {
        val qi = a(i)
        var j = 0
        while (j < Dim) { b(i * Dim + j) += qi * a(j); j += 1 }
        i += 1
      }
      b(Dim * Dim) += 1L
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder = Encoders.kryo[Array[Long]]
    def outputEncoder = implicitly[org.apache.spark.sql.Encoder[Seq[Long]]](
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
  }

  /** truncating-toward-zero rescale u → u·k div max(|u|,1): Java `/`
    * and DuckDB `//` share truncation semantics, so this is the
    * engine-portable normalization step. */
  private def rescale(u: Array[Long], k: Long): Array[Long] = {
    val m = math.max(u.map(math.abs).max, 1L)
    u.map(x => x * k / m)
  }

  /** The driver-side eigensolve over a flat d×d Gram: `iters`
    * integer power-iteration rounds from the all-ones start, returning
    * (w — the ×2^20 exact integer loading numerators, loading — the
    * unit direction, eig — the Rayleigh-quotient estimate de-quantized
    * per row). Pure integer until the final exactly-rounded
    * divide/sqrt, so it mirrors the SQL oracle bit-for-bit; public so
    * SpectralSpec can drive it at varying round counts. */
  def powerIterate(gram: Array[Long], n: Long, iters: Int)
      : (Array[Long], Array[Double], Double) = {
    def matvec(v: Array[Long]): Array[Long] =
      Array.tabulate(Dim)(i =>
        (0 until Dim).foldLeft(0L)((acc, j) => acc + gram(i * Dim + j) * v(j)))
    var v = Array.fill(Dim)(1L)
    for (_ <- 1 until iters) v = rescale(matvec(v), V)
    val u = matvec(v)
    val sv = u.map(_ / SHIFT)
    val ms = math.max(sv.map(math.abs).max, 1L)
    val w = sv.map(x => x * WSCALE / ms)
    val w16 = sv.map(x => x * RSCALE / ms)
    val n2 = w.foldLeft(0L)((acc, x) => acc + x * x)
    val num = (0 until Dim).foldLeft(0L)((acc, i) =>
      acc + (0 until Dim).foldLeft(0L)((a2, j) =>
        a2 + w16(i) * gram(i * Dim + j) * w16(j)))
    val den = w16.foldLeft(0L)((acc, x) => acc + x * x)
    val eig = num.toDouble / den.toDouble / n.toDouble / 1000000.0
    (w, w.map(_.toDouble / math.sqrt(n2.toDouble)), eig)
  }

  /** One-pass distributed Gram + row count over a quantized embedding
    * Dataset — public for SpectralSpec. */
  def gramOf(rows: org.apache.spark.sql.Dataset[Seq[Long]]): (Array[Long], Long) = {
    val flat: Seq[Long] = rows.select(GramAgg.toColumn).head()
    (flat.take(Dim * Dim).toArray, flat(Dim * Dim))
  }

  /** Top principal direction of the quantized embedding Gram via
    * 3 power-iteration rounds. Output: per-dimension exact integer
    * loading numerator `w` (scaled ×2^20), the unit loading, and the
    * Rayleigh-quotient eigenvalue estimate normalized per row and
    * de-quantized (÷n÷1000²) — constant across the 64 rows.
    *
    * The driver-side loop touches ONLY the d×d Gram (4 096 longs —
    * the bounded collect MLlib's PCA also performs); the corpus is
    * read exactly once by the Gram aggregation. The oracle unrolls
    * the identical integer iteration as CTEs. */
  val pc01PowerIteration: GraftQuery = {
    // one unrolled integer power-iteration round (SQL side)
    def round_(r: Int, vin: String): String =
      s"""u$r AS MATERIALIZED (
         |  SELECT g.i AS i, CAST(SUM(g.g * $vin.v) AS BIGINT) AS u
         |  FROM g JOIN $vin ON $vin.i = g.j GROUP BY g.i),
         |m$r AS (SELECT GREATEST(MAX(ABS(u)), 1) AS m FROM u$r),
         |v$r AS MATERIALIZED (SELECT i, (u * $V) // m AS v FROM u$r, m$r)""".stripMargin
    val rounds = (1 to ITERS - 1).map(r =>
      round_(r, if (r == 1) "v0" else s"v${r - 1}")).mkString(",\n")
    val last = ITERS // final matvec, un-rescaled
    q("pc01_power_iteration",
      "top principal direction: one-pass exact-integer Gram + bounded driver eigensolve",
      s"""WITH $sqlX,
         |g AS MATERIALIZED (
         |  SELECT a.i AS i, b.i AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS g
         |  FROM x a JOIN x b ON a.vec_id = b.vec_id
         |  GROUP BY a.i, b.i),
         |nn AS (SELECT COUNT(*) AS n FROM embeddings),
         |v0 AS (SELECT CAST(i AS BIGINT) AS i, CAST(1 AS BIGINT) AS v
         |  FROM generate_series(1, $Dim) t(i)),
         |$rounds,
         |u$last AS MATERIALIZED (
         |  SELECT g.i AS i, CAST(SUM(g.g * v${last - 1}.v) AS BIGINT) AS u
         |  FROM g JOIN v${last - 1} ON v${last - 1}.i = g.j GROUP BY g.i),
         |s AS MATERIALIZED (SELECT i, u // $SHIFT AS sv FROM u$last),
         |ms AS (SELECT GREATEST(MAX(ABS(sv)), 1) AS m FROM s),
         |w AS MATERIALIZED (
         |  SELECT i, (sv * $WSCALE) // m AS w, (sv * $RSCALE) // m AS w16
         |  FROM s, ms),
         |nrm AS (SELECT CAST(SUM(w * w) AS BIGINT) AS n2 FROM w),
         |ray AS (
         |  SELECT CAST(SUM(wa.w16 * g.g * wb.w16) AS BIGINT) AS num
         |  FROM g JOIN w wa ON wa.i = g.i JOIN w wb ON wb.i = g.j),
         |den AS (SELECT CAST(SUM(w16 * w16) AS BIGINT) AS den FROM w)
         |SELECT w.i AS dim_idx, w.w AS w,
         |  CAST(w.w AS DOUBLE) / SQRT(CAST(nrm.n2 AS DOUBLE)) AS loading,
         |  CAST(ray.num AS DOUBLE) / CAST(den.den AS DOUBLE)
         |    / CAST(nn.n AS DOUBLE) / 1000000.0 AS eigval_row
         |FROM w, nrm, ray, den, nn ORDER BY dim_idx""".stripMargin) { (s, d) =>
      import s.implicits._
      val (gram, n) = gramOf(quantized(s, d).select(col("q")).as[Seq[Long]])
      val (w, loading, eig) = powerIterate(gram, n, ITERS)
      val rows = (0 until Dim).map(i => Row((i + 1).toLong, w(i), loading(i), eig))
      s.createDataFrame(
        s.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("dim_idx", LongType, nullable = false),
          StructField("w", LongType, nullable = false),
          StructField("loading", DoubleType, nullable = false),
          StructField("eigval_row", DoubleType, nullable = false))))
        .orderBy("dim_idx")
    }
  }

  // -------------------------------------------------------- dim stats

  /** Per-dimension embedding health: count, de-quantized mean/variance,
    * min/max — the QA table that catches dead dimensions (var ≈ 0) and
    * scale drift between embedding model versions. One corpus pass,
    * map-side-combinable integer moments, 64 output rows; the explode
    * inflates rows ×d but partial aggregation collapses them inside the
    * map task, so only #partitions × d partials ever shuffle (at 100 TB
    * the same result could be produced as d agg columns with zero
    * inflation — the shuffle shape is identical). */
  val em01DimStats: GraftQuery = q(
    "em01_dim_stats",
    "per-dimension embedding moments (dead-dim / drift QA)",
    s"""WITH $sqlX
       |SELECT i AS dim_idx, COUNT(*) AS n,
       |  CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000.0 AS mean,
       |  (CAST(SUM(q * q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       |    - (CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
       |      * (CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)))
       |    / 1000000.0 AS variance,
       |  CAST(MIN(q) AS DOUBLE) / 1000.0 AS lo,
       |  CAST(MAX(q) AS DOUBLE) / 1000.0 AS hi
       |FROM x GROUP BY i ORDER BY dim_idx""".stripMargin) { (s, d) =>
    val n = count(lit(1)).cast(DoubleType)
    val sq = sum(col("q")).cast(DoubleType)
    quantized(s, d)
      .select(posexplode(col("q")).as(Seq("i0", "q")))
      .select((col("i0") + 1).cast(LongType).as("dim_idx"), col("q"))
      .groupBy("dim_idx")
      .agg(count(lit(1)).as("n"),
        (sq / n / 1000.0).as("mean"),
        ((sum(col("q") * col("q")).cast(DoubleType) / n - (sq / n) * (sq / n))
          / 1000000.0).as("variance"),
        (min(col("q")).cast(DoubleType) / 1000.0).as("lo"),
        (max(col("q")).cast(DoubleType) / 1000.0).as("hi"))
      .orderBy("dim_idx")
  }

  /** Centroid-distance outliers, all-integer: score(v) = Σᵢ (n·qᵢ−Sᵢ)²
    * — n² × the squared distance to the corpus centroid, exact BIGINT
    * (no float accumulation to drift). Two bounded shuffles: the 64-row
    * per-dim sum table (broadcast back) and the per-vector score
    * aggregation. `dist` de-scales to the real centroid distance with
    * one exactly-rounded sqrt + divides. Top-20 by the EXACT integer
    * score, so the ranking itself is engine-identical. (The n·q product
    * bounds Long for n ≤ ~1e8 rows at |q| ≤ 2e4; beyond that a real
    * deployment divides first and accepts float scores.) */
  val em02CentroidOutliers: GraftQuery = q(
    "em02_centroid_outliers",
    "exact-integer centroid-distance outlier mining (top-20)",
    s"""WITH $sqlX,
       |st AS (SELECT i, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sq FROM x GROUP BY i),
       |sc AS (
       |  SELECT x.vec_id,
       |    CAST(SUM((st.n * x.q - st.sq) * (st.n * x.q - st.sq)) AS BIGINT) AS score,
       |    MAX(st.n) AS n
       |  FROM x JOIN st ON st.i = x.i GROUP BY x.vec_id)
       |SELECT vec_id, score,
       |  SQRT(CAST(score AS DOUBLE)) / CAST(n AS DOUBLE) / 1000.0 AS dist
       |FROM sc ORDER BY score DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
    val x = quantized(s, d)
      .select(col("vec_id"), posexplode(col("q")).as(Seq("i0", "q")))
      .select(col("vec_id"), (col("i0") + 1).cast(LongType).as("i"), col("q"))
    val st = x.groupBy("i").agg(count(lit(1)).as("n"), sum("q").as("sq"))
    val diff = col("n") * col("q") - col("sq")
    x.join(broadcast(st), Seq("i"))
      .groupBy("vec_id")
      .agg(sum(diff * diff).as("score"), max("n").as("n"))
      .select(col("vec_id"), col("score"),
        (sqrt(col("score").cast(DoubleType)) / col("n").cast(DoubleType) / 1000.0)
          .as("dist"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(20)
  }

  /** Input-sized shuffle width for the embeddings-bounded em01 — the
    * IvfQueries.embSized rule. r16 quiet probe at width 1 (min-of-5,
    * sf0.1): em01 0.74x — its posexplode partials collapse map-side so
    * only #partitions x 64 rows shuffle, and near-empty reduce tasks
    * were pure scheduling cost. em02 measured neutral (0.96x) and
    * pc01 1.46x WORSE (the iteration's matrix-vector join wants the
    * width) — both stay at session width. */
  private def sizedEmb(g: GraftQuery): GraftQuery =
    g.copy(build = (s0, d) => g.build(IvfQueries.embSized(s0, d), d))

  val all: Seq[GraftQuery] =
    Seq(pc01PowerIteration, sizedEmb(em01DimStats), em02CentroidOutliers)
}
