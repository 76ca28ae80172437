package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One named engine query: a Spark DataFrame builder over a testdata
  * scale-factor directory, plus (when SQL-expressible) the equivalent
  * DuckDB oracle SQL the driver cross-checks against.
  *
  * Contract (driver): result column names must match the oracle SQL's
  * exactly; the compare sorts columns by name and hashes values, so
  * every computed column is aliased identically on both sides, every
  * query ends in a deterministic ORDER BY, and floating-point
  * aggregation goes through [[Det]] so both engines compute
  * bit-identical doubles.
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** Table loaders for the driver-generated parquet corpus (TESTDATA.md).
  * Plain `spark.read.parquet` — Catalyst handles column pruning and
  * filter pushdown into the scan; at cluster scale these would be
  * partitioned/bucketed table reads behind the same API.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String) = t(s, d, "region")
  def nation(s: SparkSession, d: String) = t(s, d, "nation")
  def customer(s: SparkSession, d: String) = t(s, d, "customer")
  def supplier(s: SparkSession, d: String) = t(s, d, "supplier")
  def part(s: SparkSession, d: String) = t(s, d, "part")
  def orders(s: SparkSession, d: String) = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String) = t(s, d, "lineitem")

  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across testdata generations, so the loader is
    * schema-adaptive (the reference's LoaderFunc seam,
    * filesystem.go:10-12, exists for exactly this: absorbing physical
    * representation drift at load time). The nanosAsLong conf only
    * affects NANOS-annotated columns; under it a nanos file reads as
    * LongType (convert, truncating to micros — matching what DuckDB
    * does with the same file) and a micros file reads as a timestamp.
    * Either way the column is normalized to session-zoned TIMESTAMP
    * (every engine session pins UTC, so an NTZ→LTZ cast preserves the
    * wall-clock DuckDB sees): downstream queries use instant functions
    * like unix_micros that reject TIMESTAMP_NTZ. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  /** Spread a small-file scan across the cluster before row-inflating
    * work. A parquet row group is an unsplittable input unit, so a
    * single-file table scans as ONE task no matter how many cores
    * exist — and every downstream explode/transform (shingles, n-grams,
    * signatures, decodes) then runs single-threaded. One cheap shuffle
    * of the compact base rows buys full parallelism for the inflation
    * stage.
    *
    * CONDITIONAL: a 100 TB table already scans as thousands of splits,
    * and an unconditional repartition there is a pointless full-corpus
    * shuffle on the hot ingest path (round-2 bench regression). We only
    * pay the shuffle when the scan genuinely under-parallelizes —
    * fewer input partitions than cores. `rdd.getNumPartitions` on a
    * fresh file scan is planning-time metadata (split enumeration),
    * not a job. */
  def fanout(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < parallelism)
      // HASH repartition on the leading column (every corpus table
      // leads with its high-cardinality key), NOT round-robin
      // repartition(n): a keyless repartition first pays a local sort
      // of its whole input (sortBeforeRepartition, SPARK-23207 — so
      // retried tasks reproduce the same row placement), and that sort
      // runs inside the ONE scan task this helper exists to relieve —
      // measured 1.7x slower than the hash route on the widest-row
      // caller (av01). A deterministic key column gives retry-safe
      // placement with no sort, the optimization guide's own
      // recommendation (§2.5). CONTRACT: callers pass BASE TABLE
      // frames, whose leading column is the high-cardinality key —
      // fanout(df.select(...)) with a low-cardinality lead (a flag, a
      // label) would hash into as many non-empty partitions as the
      // lead has values and silently defeat the spread. Project AFTER
      // fanout, never before.
      df.repartition(parallelism, col(df.columns.head))
    else df
  }

  def documents(s: SparkSession, d: String) = fanout(t(s, d, "documents"))
  def embeddings(s: SparkSession, d: String) = fanout(t(s, d, "embeddings"))
}

/** Cross-engine deterministic numerics.
  *
  * Summing doubles is order-dependent, and Spark's shuffle order differs
  * from DuckDB's scan order, so `SUM(double)` would drift in the last
  * bits (≈1e-3 absolute at sf0.1 magnitudes). All money/rate columns in
  * the corpus carry ≤2 decimal places, so we sum EXACT decimals and cast
  * the final exact value to double — both engines then produce the same
  * IEEE-754 bits regardless of aggregation order.
  *
  * Scales are chosen so chained decimal arithmetic never exceeds
  * precision 38 in either engine (Spark: p1+p2+1; DuckDB: w1+w2):
  * prices decimal(12,2), rates decimal(9,4).
  */
object Det {
  /** price-like column (|x| < 1e10, 2dp) as exact decimal */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** rate-like column (|x| < 1e5, ≤4dp) as exact decimal */
  def dec4(c: Column): Column = c.cast(DecimalType(9, 4))
  /** deterministic SUM(double) — exact decimal sum, then one cast */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)
  /** deterministic AVG(double) — exact sum / exact count, one fp divide */
  def davg(c: Column): Column = sum(dec2(c)).cast(DoubleType) / count(lit(1))

  /** Tighter casts for multiply chains: per-row prices < 1e7 (2dp) and
    * rates < 10 (2dp). A (9,2)·(13,2)·(13,2) chain peaks at precision
    * 37 in Spark / width 35 in DuckDB — below 38, so no precision-loss
    * rounding in either engine and the product stays exact. */
  def price(c: Column): Column = c.cast(DecimalType(9, 2))
  def rate(c: Column): Column = c.cast(DecimalType(3, 2))

  /** SQL mirrors (DuckDB side) of the above */
  def sqlDec2(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def sqlPrice(e: String): String = s"CAST($e AS DECIMAL(9,2))"
  def sqlRate(e: String): String = s"CAST($e AS DECIMAL(3,2))"
  def sqlDec4(e: String): String = s"CAST($e AS DECIMAL(9,4))"
  def sqlDsum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(12,2))) AS DOUBLE)"
  def sqlDavg(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)"
}

/** Scratch directories for queries that exercise the write path
  * (layout rewrites, bucketed warehouses, schema-evolution
  * generations, view state). All land under ONE per-JVM root that a
  * shutdown hook deletes recursively, so repeated Verify/Bench sweeps
  * can't accumulate unbounded disk — the round-5 leak where every
  * build of q49/q50/q51 left fresh `createTempDirectory` debris
  * behind (q49 writes the 1995 lineitem subset twice per run). */
object Scratch {
  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(r)))
    r
  }
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString
  private def delete(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
  }
}

/** Pluggable mid-query materialization for multi-pass and iterative
  * operators (selection passes, LSH label propagation, PageRank/BFS
  * rounds, k-means iterations).
  *
  * `localCheckpoint` — the local[*] fast path — stores blocks WITHOUT
  * lineage on the executors that computed them: on a real cluster one
  * executor loss makes every consumer of the pinned frame fail
  * unrecoverably. The cluster-safe default is therefore
  * `persist(MEMORY_AND_DISK)`: the FIRST action over the pinned frame
  * populates the cache, every later pass reads it, and an evicted or
  * lost block silently recomputes from lineage (all pinned plans here
  * are deterministic — see [[Det]]). Deliberately NO eager
  * materialization in this mode — persist is semantically transparent,
  * and an eager count() is one wasted full evaluation whenever the
  * frame feeds a single downstream action (measured 1.4–2.6× per-query
  * overhead across the iterative graph/rank/ivf family at sf0.1).
  * Long iterative chains at real scale should opt into `checkpoint`:
  * reliable, lineage-TRUNCATING (keeps round-N plans round-sized and
  * stops recovery cascading to round 0), at the price of a
  * checkpoint-dir write per round — requires
  * `SparkContext.setCheckpointDir`.
  *
  * Mode per session via `spark.graft.materialize`:
  * `persist` (default) | `checkpoint` | `local` (pre-round-6 behavior).
  */
object Pin {
  def apply(df: DataFrame): DataFrame = pin(df, eager = true)
  /** Lazy variant — for frames consumed exactly once per loop round,
    * where pinning only guards against cross-round lineage growth. */
  def lazily(df: DataFrame): DataFrame = pin(df, eager = false)

  private def pin(df: DataFrame, eager: Boolean): DataFrame =
    df.sparkSession.conf.get("spark.graft.materialize", "persist") match {
      case "local"      => df.localCheckpoint(eager)
      case "checkpoint" => df.checkpoint(eager)
      // persist is get-or-compute at first use; eager would only add a
      // count() pass, so the flag is intentionally ignored here
      case _ => df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Lineage-CUTTING eager materialization for write-over-self paths
    * (a dynamic partition overwrite refuses a plan that reads the
    * path it writes, so persist — semantically transparent, lineage
    * kept — cannot serve here). Reliable `checkpoint` when the
    * deployment set a checkpoint dir (an executor loss mid-write then
    * recovers instead of failing the batch — the round-15 verdict's
    * cluster-grade seam), executor-local blocks otherwise (local
    * mode; batch-replay idempotence covers the remaining window).
    *
    * The reliable branch persists THROUGH the checkpoint: RDD
    * checkpointing writes its files in a separate job that would
    * otherwise recompute the whole plan a second time (the RDD API
    * doc's own warning) — cache, checkpoint (the write job reads the
    * cache), release. The returned frame reads the checkpoint files,
    * so the unpersist cannot starve it. Retention: Spark only deletes
    * reliable checkpoint dirs when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (off by
    * default) — a deployment that sets a checkpoint dir for this seam
    * should set that too, or reap the dir operationally. */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val cached =
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try cached.checkpoint(eager = true)
      finally { cached.unpersist(blocking = false); () }
    } else df.localCheckpoint(eager = true)

  /** Postfix syntax at call sites: `df.pinned` / `df.pinnedLazily`. */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pinned: DataFrame = Pin(df)
    def pinnedLazily: DataFrame = Pin.lazily(df)
  }
}

/** Child sessions (the ad02 idiom): same SparkContext, cache, and
  * injected extensions, but an ISOLATED conf so a query-local opt-in
  * (SPJ bucketing, approx-distinct rewrite, a shuffle-partition pin)
  * can never leak into later registry queries. `newSession()` starts
  * from the CONTEXT defaults, not the parent's runtime conf — so
  * probe overrides (Bench's SPARK_GRAFT_BENCH_CONF) and spark.graft.*
  * flags set on the parent would silently vanish inside the child,
  * and a conf experiment on hn03/ad02/sy03 would report unchanged
  * numbers with no indication. This helper copies the parent's
  * runtime SQL confs onto the child FIRST, then applies the caller's
  * isolated overrides; static confs that refuse a runtime set are
  * skipped (they cannot differ within one context anyway). */
object Sessions {
  /** Child session whose shuffle width derives from an input-row
    * estimate — rows/50k + 1, capped at the parent's width (the
    * starContraction loop-sizing rule extended to whole query spans;
    * r16). Iterative/micro-stage operators over input-bounded frames
    * pay a fixed scheduling cost per near-empty task at the session's
    * fact-table width; deriving the width from the INPUT keeps it
    * scale-adaptive — a 100 TB input saturates the cap and nothing
    * narrows. Returns the parent unchanged when the estimate already
    * fills the width.
    *
    * ONE sized child per (parent, key), memoized: builders that
    * memoize per-session state (index dirs, collected fixtures — all
    * keyed by session) need the SAME session across a bench's timed
    * runs or every run would rebuild its setup state. `rows` is
    * by-name so the input count runs once, on first use. The parent's
    * runtime confs are RE-COPIED on every access (then the width
    * override re-applied): a conf set on the parent after the child
    * was created — a guard key, a probe override — must still reach
    * the wrapped query, exactly as it would an unwrapped one. */
  private val sizedChildren = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), SparkSession]

  def sizedFor(parent: SparkSession, key: String, rows: => Long): SparkSession =
    sizedChildren.synchronized {
      val cur = parent.conf.get("spark.sql.shuffle.partitions").toLong
      val parts = math.max(1L, math.min(cur, rows / 50000L + 1L))
      if (parts >= cur) parent
      else {
        val c = sizedChildren.getOrElseUpdate((parent, key), parent.newSession())
        val pc = parent.conf.getAll
        // removals must propagate too: a key UNSET on the parent (a
        // test's guard/probe conf restored in its finally) would
        // otherwise stay live in the child forever — observed as a
        // stale hn05 deltaMod tripping the oracle pin a suite later
        c.conf.getAll.keys.filterNot(pc.contains).foreach { k =>
          try c.conf.unset(k)
          catch { case _: org.apache.spark.sql.AnalysisException => () }
        }
        pc.foreach { case (k, v) =>
          try c.conf.set(k, v)
          catch { case _: org.apache.spark.sql.AnalysisException => () }
        }
        c.conf.set("spark.sql.shuffle.partitions", parts.toString)
        c
      }
    }

  def child(parent: SparkSession, overrides: (String, String)*): SparkSession = {
    val s = parent.newSession()
    parent.conf.getAll.foreach { case (k, v) =>
      // static confs refuse a runtime set (AnalysisException — they
      // cannot differ within one context anyway); anything ELSE that
      // fails to copy must surface, not silently vanish from the child
      try s.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    overrides.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }
}

/** Wall-clock sub-phase recorder for queries whose single timing mixes
  * unlike costs (zo01/q47 each pay a full layout WRITE before the read
  * path under test). The write phase records itself here; the bench
  * then reports write and read separately so a layout-write cost swing
  * can't mask a read-path regression. Last-run-wins per key — the
  * bench reads the value left by its final timed run. */
object Phases {
  private val t = new java.util.concurrent.ConcurrentHashMap[String, Double]()
  def timed[A](query: String, phase: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body finally t.put(s"$query.$phase", (System.nanoTime() - t0) / 1e9)
  }
  def get(query: String, phase: String): Option[Double] =
    Option(t.get(s"$query.$phase"))
}

/** Single registry the driver contract ([[SparkEntry]]) is generated
  * from; every module contributes its queries here. */
object Registry {
  def all: Seq[GraftQuery] =
    graft.operators.RelationalQueries.all ++
      graft.operators.DedupQueries.all ++
      graft.operators.TextQueries.all ++
      graft.operators.SimilarityQueries.all ++
      graft.operators.EventQueries.all ++
      graft.operators.MultimodalQueries.all ++
      graft.operators.AsofJoin.all ++
      graft.operators.TypedQueries.all ++
      graft.operators.IvfQueries.all ++
      graft.operators.AnalyticsQueries.all ++
      graft.operators.CorpusQueries.all ++
      graft.operators.BloomJoin.all ++
      graft.operators.GraphQueries.all ++
      graft.operators.ZOrder.all ++
      graft.operators.HierarchyQueries.all ++
      graft.operators.SpectralQueries.all ++
      graft.operators.SetSimJoin.all ++
      graft.operators.ManifestSkipping.all ++
      graft.operators.MvQueries.all ++
      graft.sources.SynthQueries.all
}
