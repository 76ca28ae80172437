package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fail-fast budget for pair-emitting self-joins.
  *
  * dd10 (doc-level LSH) and ss01 (exact prefix-filtered set-sim) are
  * CORRECTNESS contracts: they emit every qualifying pair, so a
  * twin-heavy corpus makes their OUTPUT Θ(copies²) — no candidate
  * scheme escapes that, and at the 100× twin-heavy replica the pair
  * set heap-OOMs the executors (SCALING.md fourth-decade table). The
  * scale-safe dedup route is the representative-collapse twins
  * (dd19 / ss03), which cap per-group output at the group size.
  *
  * This guard turns that documented cliff from a raw
  * `java.lang.OutOfMemoryError` minutes in into an immediate,
  * actionable diagnostic: before the pair join runs, ONE cheap keyed
  * aggregate over the already-pinned key frame computes the exact
  * upper bound Σ_key c·(c−1)/2 on emitted pairs (every pair must
  * collide on at least one key — that is what makes the key a
  * candidate key), and the query aborts naming the twin-safe
  * alternative when the bound exceeds the budget.
  *
  * Budget conf: `spark.graft.pairGuard.maxPairs` (default 20M pairs ≈
  * low-GB of pair rows; 0 disables). The aggregate costs one
  * key-sized shuffle over a frame the caller already materialized —
  * measured noise next to the pair join it protects.
  */
object PairGuard {
  val ConfKey = "spark.graft.pairGuard.maxPairs"
  val Default = 20000000L

  /** PASSED verdicts, keyed by (session, caller, input-plan
    * digest, budget): the bound is a pure function of the input
    * frame, so a frame that passed once cannot fail later — re-running
    * the eager aggregate on every DataFrame build made the guard the
    * dominant cost of small pair queries (dd03: 0.43 → 0.75 s/run at
    * sf0.1; the bench rebuilds the frame per timed run). The plan
    * digest distinguishes corpus dirs and the budget rides the key, so
    * a tightened budget or a different input re-checks — exceeded
    * budgets are never memoized and abort every build (fail-fast is
    * the contract). Plans key by a 128-bit MD5 of the CANONICALIZED
    * plan string, not the 32-bit `semanticHash`: this memo skips a
    * fail-fast SAFETY guard, so a same-session Int collision would
    * silently disarm it — the digest makes that class unreachable.
    * STATIC-INPUT ASSUMPTION (same as NullAwareAnti's documented
    * build-time gate): the key identifies the plan, not the bytes
    * under it, so a caller scanning a mutable scratch dir whose
    * contents change under an unchanged path must not rely on the
    * memo — no registry caller does; every guarded input is a fixture
    * of the static testdata corpus. Keying by the session object
    * retains sessions for the JVM lifetime — the same bounded
    * retention as every memoized index/MV builder in this engine
    * (h3Dirs et al.), and sessions here number in the tens per
    * process. */
  private val passed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(org.apache.spark.sql.SparkSession, String, String, Long)]()

  /** 128-bit hex digest of the canonicalized analyzed plan PLUS the
    * plan's file-source root paths — the collision-proof replacement
    * for `semanticHash` in memo keys. The paths must ride explicitly:
    * a canonicalized plan STRING renders a parquet relation as just
    * its format name (`HadoopFsRelation.toString` is "parquet"), so
    * two scans of different corpus dirs stringify identically and a
    * string-only digest would falsely hit across dirs — silently
    * disarming a fail-fast guard for multi-dir sessions (the spec
    * suites run sf0.001 and sf0.01 in one session). */
  private def planDigest(df: DataFrame): String = {
    val plan = df.queryExecution.analyzed
    val canon = plan.canonicalized.toString
    // EVERY leaf kind contributes a source discriminator, not just V1
    // file relations: LogicalRDD / LocalRelation / DSv2 leaves all
    // canonicalize to path-free strings, so two distinct inputs with
    // identical plan shapes (e.g. two checkpointed frames) would
    // otherwise share a digest and a PASSED verdict — silently
    // disarming a fail-fast safety guard.
    val paths = plan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.mkString(",")
          case other => other.toString
        }
      case rdd: org.apache.spark.sql.execution.LogicalRDD =>
        s"rdd:${rdd.rdd.id}" // checkpoint/localCheckpoint identity
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        // literal inline data: hash the rows themselves (bounded —
        // LocalRelations here are query fixtures, never corpora)
        s"local:${lr.data.hashCode}"
      case dsv2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        s"dsv2:${dsv2.table.name}:${dsv2.options.hashCode}"
    }.mkString(";")
    java.security.MessageDigest.getInstance("MD5")
      .digest((canon + "\n" + paths).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Abort with a diagnostic if Σ_key c·(c−1)/2 over `keyed` grouped
    * by `keys` exceeds the budget. `query` names the caller in the
    * message; `alternative` names the scale-safe variant to use. */
  def check(keyed: DataFrame, keys: Seq[Column], query: String,
      alternative: String): Unit = {
    val budget = keyed.sparkSession.conf.get(ConfKey, Default.toString).toLong
    if (budget <= 0) return
    val memoKey = (keyed.sparkSession, query, planDigest(keyed), budget)
    if (passed.contains(memoKey)) return
    val est = keyed.groupBy(keys: _*).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") * (col("c") - 1)), lit(0L)).as("p2"))
      .head().getLong(0) / 2
    if (est <= budget) { passed.add(memoKey); return }
    throw new IllegalStateException(
      s"$query: candidate-pair upper bound $est exceeds the pair budget " +
        s"$budget ($ConfKey). This query's contract emits EVERY qualifying " +
        s"pair — Θ(copies²) output on a duplicate-heavy corpus, which no " +
        s"candidate scheme can bound. At scale use $alternative " +
        s"(bounded per-row output instead of pair rows), " +
        s"or raise the budget explicitly if the full pair set is intended.")
  }

  /** Cross-product variant for query-against-corpus scoring contracts
    * (sm01's brute-force baseline): the pair stream is |L|·|R| by
    * construction — no key histogram exists to bound it tighter — and
    * a per-query window sort additionally materializes |R| rows in ONE
    * partition per query. Two bounded count jobs (both sides are
    * frames the caller scans anyway). */
  def checkCross(left: DataFrame, right: DataFrame, query: String,
      alternative: String): Unit = {
    val budget = left.sparkSession.conf.get(ConfKey, Default.toString).toLong
    if (budget <= 0) return
    // same pass-memo as check(): both input plans key the verdict —
    // the two digests concatenate, so distinct (left, right) pairs
    // can never collide
    val memoKey = (left.sparkSession, query,
      planDigest(left) + planDigest(right), budget)
    if (passed.contains(memoKey)) return
    val est = BigInt(left.count()) * BigInt(right.count())
    if (est <= BigInt(budget)) { passed.add(memoKey); return }
    throw new IllegalStateException(
      s"$query: brute-force pair stream |L|x|R| = $est exceeds the pair " +
        s"budget $budget ($ConfKey). Every (query, candidate) pair is " +
        s"scored and each query's candidates sort in one partition. At " +
        s"scale use $alternative (bucketed candidates bound the per-query " +
        s"stream), or raise the budget if the exhaustive scan is intended.")
  }
}
