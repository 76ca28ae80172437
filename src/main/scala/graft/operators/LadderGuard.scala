package graft.operators

import org.apache.spark.sql.SparkSession

/** Cost-based upsert-vs-rebuild guard — the [[PairGuard]] fail-fast
  * discipline applied to index IVM.
  *
  * The incremental ladder upsert's cost is ∝ affected-bucket MASS, and
  * past a measured crossover that mass makes the incremental path
  * strictly worse than rebuilding: at the 1000× probe a uniform 0.47%
  * delta landed in ~45% of the base buckets and the affected-bucket
  * recompute cost 2.3× the full per-layer rebuild, while the sparse
  * deployment regime (a 95-vector ingest batch → ~0.6% of buckets) ran
  * at 0.12× (SCALING.md, `BENCH_1000X_hn05_*`). This guard turns that
  * documented crossover from a silently-paid 2.3× into an immediate,
  * actionable diagnostic: before admitting, compare affected-member
  * mass ÷ total ladder mass against a conf threshold and abort naming
  * the rebuild path.
  *
  * Conf: `spark.graft.ladder.maxAffectedFrac` ∈ (0, 1]. The DEFAULT is
  * 1.0 — admit everything, compute nothing — because the oracle
  * harness's fixed `% 211` split IS a uniform (dense) delta by
  * construction: a strict default would refuse the very query the
  * DuckDB oracle checks. Deployments ingesting real (clustered, small)
  * batches set ~0.25–0.5; both sides of the mass ratio are lazy
  * by-name arguments, so a disabled guard costs zero actions.
  *
  * Ratio semantics (threshold guidance): the NUMERATOR is the
  * affected buckets' post-operation member mass — for an admit it
  * INCLUDES the incoming delta's exploded rows, for a delete it
  * counts survivors — while the DENOMINATOR is the PRE-operation
  * stored mass. The two populations differ by the delta itself, so
  * for a delta that is large relative to the store the measured
  * fraction skews HIGH on admits (a conservative bias: the guard
  * refuses slightly early, never late) and can exceed 1.0 outright
  * when the delta outweighs the base. Thresholds calibrated from the
  * 1000× receipts (where |delta| ≪ |store|, skew ≈ 0) transfer
  * directly to the sparse-ingest regime they describe; for
  * bulk-load-sized deltas the rebuild path is the right tool anyway,
  * and the early refusal says so.
  */
object LadderGuard {
  val ConfKey = "spark.graft.ladder.maxAffectedFrac"

  /** Abort with a rebuild-naming diagnostic when the affected-bucket
    * member mass exceeds `threshold × total mass`. `affectedMass` and
    * `totalMass` are evaluated ONLY when the guard is enabled (conf
    * below 1.0) — callers pass bounded aggregates over frames they
    * already built (the pinned members frame; the nsum summary). */
  def check(s: SparkSession, query: String,
      affectedMass: => Long, totalMass: => Long): Unit = {
    val threshold = s.conf.get(ConfKey, "1.0").toDouble
    if (threshold >= 1.0) return
    val (am, tm) = (affectedMass, totalMass)
    if (tm <= 0L || am.toDouble / tm <= threshold) return
    throw new IllegalStateException(
      f"$query: incremental upsert would recompute $am of $tm ladder member " +
        f"rows (${am.toDouble / tm}%.2f > $ConfKey=$threshold). Past the " +
        "measured crossover an affected-bucket recompute costs MORE than the " +
        "rebuild it replaces (SCALING.md: a uniform 0.47% delta touching " +
        "~45% of buckets ran above rebuild cost at 1000x). Route this delta " +
        "through the full per-layer rebuild (hn05: h5IndexDir; streaming: " +
        "rebuild the snapshot and resume ingest), batch it into sparser " +
        "ingests, or raise the threshold if the incremental path is intended.")
  }
}
