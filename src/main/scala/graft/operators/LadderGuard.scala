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
  * Ratio semantics: BOTH sides measure the POST-operation ladder —
  * the numerator is the affected buckets' post-operation member mass
  * (admits include the delta's exploded rows, deletes count
  * survivors), the denominator the post-operation TOTAL mass (every
  * caller: hn05 nsum+delta, hn06 nsum−deleted, the streaming faces
  * Σ lvl+1 over the computed membership). One population on both
  * sides keeps the ratio ≤ 1 and — because the post-operation
  * membership is a pure function of (pre-mutation store, batch) —
  * REPLAY-STABLE: a streaming micro-batch admitted once measures the
  * identical ratio when replayed after a crash at any point of the
  * two-store commit, so the guard can never crash-loop a committed
  * batch (a pre-operation denominator breaks exactly there for
  * delete-heavy batches: the replay would re-measure against the
  * already-shrunk store and refuse). Thresholds calibrated from the
  * 1000× receipts (|delta| ≪ |store|) transfer directly to the
  * sparse-ingest regime they describe.
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
