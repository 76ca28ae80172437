package graft.streaming

import graft.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming operators over the `events` schema
  * `(event_id long, ts timestamp, user_id long, event_type string,
  * value double, props string)`.
  *
  * Each transformation takes a plain DataFrame and works identically on
  * a batch frame or a `readStream` frame — Structured Streaming's
  * incrementalization is Catalyst's job, not the operator author's. The
  * test suite exploits that: it runs the same function both ways and
  * asserts equal results (the oracle for streaming is our own batch
  * path, which is itself DuckDB-checked via ev01/ev02).
  *
  * The reference has no streaming at all (readme.md:42,48 — unchecked
  * TODOs); this is new Spark-native surface mandated by SURVEY §2.2.
  *
  * Scale: windowed aggregations shuffle by (window, key) and keep only
  * per-window state; watermarks bound state size — at 100 TB/day the
  * state store holds one entry per open window per key, not per event.
  */
object EventStreams {

  /** Tumbling 1-hour windows per event type. With a watermark, late
    * events beyond 10 minutes are dropped and closed windows are
    * emitted exactly once in append mode. */
  def tumblingHourly(events: DataFrame, withWatermarkCol: Boolean = true): DataFrame = {
    val src = if (withWatermarkCol) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Sliding 1-hour windows advancing every 15 minutes, per event
    * type — each event lands in exactly 4 overlapping windows. The
    * streaming state holds at most 4 open (window, key) entries per key
    * inside the watermark horizon; the 4× row replication is map-side
    * (Expand before the shuffle), so the shuffle carries partial
    * aggregates, not duplicated events. */
  def slidingQuarterHourly(events: DataFrame, withWatermarkCol: Boolean = true): DataFrame = {
    val src = if (withWatermarkCol) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Session windows with a 30-minute inactivity gap per user — the
    * built-in incremental form of ev02_sessionize. */
  def userSessions(events: DataFrame, withWatermarkCol: Boolean = true): DataFrame = {
    val src = if (withWatermarkCol) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
  }

  /** Tumbling 1-hour windowed QUANTILES per event type through graft's
    * own [[graft.plans.KllQuantilesAgg]] — proof the native
    * TypedImperativeAggregate composes with watermarked streaming
    * aggregation: the sketch state rides the streaming state store via
    * the same serialize/merge contract the batch partial→final pipeline
    * uses, so each open (window, type) entry holds ONE O(k·log n/k)
    * sketch, never the window's raw rows. Below the compaction
    * threshold the emitted p50/p95 are exactly the batch values
    * (ev18's DuckDB-checked integer-rank oracle); at production volume
    * the same query degrades to bounded-error quantiles with bounded
    * state — the property a 100 TB/day latency dashboard actually
    * needs. */
  def windowedQuantiles(events: DataFrame, withWatermarkCol: Boolean = true): DataFrame = {
    graft.plans.VectorExpressions.register(events.sparkSession)
    val src = if (withWatermarkCol) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.plans.VectorExpressions
          .kll_quantiles(col("value"), 32768, 50, 95).as("qv"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"),
        element_at(col("qv"), 1).as("p50"),
        element_at(col("qv"), 2).as("p95"))
  }

  /** Streaming exact dedup on event_id: state-backed dropDuplicates;
    * the watermark lets the state store evict ids older than the
    * lateness bound (unbounded state otherwise — the 100 TB footgun). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id")

  /** Watermark-scoped dedup: unlike dropDuplicates (whose key state
    * lives for the query lifetime because event_id isn't part of the
    * event-time key), dropDuplicatesWithinWatermark GUARANTEES each
    * id's state is dropped once the watermark passes its event time —
    * state is bounded by the re-delivery horizon, which is the right
    * contract for at-least-once sources at 100 TB/day. */
  def dedupedWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark("event_id")

  /** Streaming CONTENT near-dup suppression for a document stream: the
    * dedup key is the MinHash-LSH band key (dd05/dd10's map-side
    * computation over the `text` column), so a re-arriving near-
    * duplicate document — not merely a re-delivered id — is dropped
    * within the re-delivery horizon. State carries 32-hex band keys,
    * never document text, and dropDuplicatesWithinWatermark bounds it
    * by the watermark — the only viable contract when the stream is a
    * crawler feed at 100 TB/day. */
  def nearDupSuppressed(docs: DataFrame): DataFrame =
    docs.withWatermark("ts", "1 hour")
      .withColumn("band", graft.functions.TextFunctions.lshBand(col("text"), 0, 2))
      .dropDuplicatesWithinWatermark("band")
      .drop("band")

  /** Streaming delta-vs-corpus LSH admission — dd12 composed with
    * Structured Streaming, the loop a 100 TB ingest actually runs: the
    * corpus band table is STATIC state (bucketed by band key at
    * cluster scale, so the lookup join never reshuffles it), each
    * arriving delta doc's bands probe it via a stream-static LEFT
    * OUTER join (stateless, per-microbatch), and ONE streaming
    * aggregation folds band hits into a per-doc candidate set.
    * `collect_set` both dedupes and drops the nulls the outer join
    * emits for collision-free bands, so `n_cand` is exactly dd12's
    * COUNT(DISTINCT corpus doc) — batch ≡ stream is pinned by
    * StreamingSpec against the oracle-checked dd12 registry query.
    * State: one candidate-id set per in-flight delta doc (bounded by
    * the delta, never the corpus). Callers pre-filter docs to ≥ 3
    * words, as in dd12. */
  def incrementalAdmission(deltaDocs: DataFrame, corpusBands: DataFrame): DataFrame =
    graft.operators.DedupQueries.lshBands(deltaDocs)
      .join(corpusBands.select(col("doc_id").as("c_id"),
          col("band_idx").as("bi"), col("bkey").as("bk")),
        col("band_idx") === col("bi") && col("bkey") === col("bk"),
        "left_outer")
      .groupBy("doc_id")
      .agg(collect_set(col("c_id")).as("cands"))
      .select(col("doc_id"), size(col("cands")).cast("long").as("n_cand"),
        (size(col("cands")) === 0).as("admitted"))

  /** Per-type running counts in update mode (no watermark needed). */
  def typeCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(count(lit(1)).as("n"))

  /** Streaming cardinality: the [[graft.operators.Hll]] register table
    * built INCREMENTALLY by the streaming engine itself. The sketch's
    * merge operation is register-wise max, and max is a streaming
    * aggregate — so no custom state, no foreachBatch side-store: state
    * is exactly the 64-registers-per-type table, constant-size however
    * long the stream runs, and the result at any point equals the
    * batch sketch over everything seen (StreamingSpec pins stream ≡
    * batch). This is why mergeable sketches are the cardinality answer
    * for unbounded streams — exact distinct-count state grows with the
    * key universe. */
  def hllRegisters(events: DataFrame): DataFrame =
    graft.operators.Hll.registers(events,
      col("event_type"), col("user_id").cast("string"))

  /** Streaming heavy-hitters state: the cm01 Count-Min cells maintained
    * by the engine as a plain streaming count — cell-wise ADD is the
    * CMS merge, and counting is a streaming aggregate. 192 cells of
    * state total (DEPTH×WIDTH), independent of stream length or key
    * cardinality; point-queries read the cell minimum at any time. */
  def cmsCells(events: DataFrame): DataFrame = {
    val DEPTH = 3
    val WIDTH = 64
    def bucket(j: Int, t: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit(s"$j:"), t)), 1, 8), 16, 10)
        .cast("long") % WIDTH
    events.select(explode(array((0 until DEPTH).map(j =>
        struct(lit(j).as("row_j"),
          bucket(j, col("user_id").cast("string")).as("bucket"))): _*)).as("e"))
      .select(col("e.row_j").as("row_j"), col("e.bucket").as("bucket"))
      .groupBy("row_j", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Streaming drift-monitor state: the per-(event_type, value-bin)
    * histogram maintained by the engine as a plain streaming count —
    * the batch dr01 discipline (exact-integer total-variation
    * distance) applied to an unbounded stream. State is exactly
    * |types| × 8 cells, constant however long the stream runs, and the
    * cell table at any point equals the batch histogram over
    * everything seen (StreamingSpec pins stream ≡ batch). The TVD
    * readout against a reference histogram is a bounded batch
    * computation OVER the cells (two-level aggregation is the
    * documented reason the readout doesn't ride inside the streaming
    * query — same split as hllRegisters/cmsCells). */
  def driftCells(events: DataFrame): DataFrame =
    events.select(col("event_type"),
        least(floor(col("value") / 5).cast("long"), lit(7L)).as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("n"))

  /** Batch readout over [[driftCells]] state: exact-integer TVD of the
    * live histogram vs a reference cell table (same schema), per
    * event_type — Σ|n·refTot − ref·liveTot| over bins, one divide at
    * the end. Runs on ≤ |types|·bins rows regardless of stream age. */
  def driftReadout(live: DataFrame, reference: DataFrame): DataFrame = {
    val l = live.select(col("event_type"), col("bin"), col("n").as("nl"))
    val r = reference.select(col("event_type"), col("bin"), col("n").as("nr"))
    val cells = l.join(r, Seq("event_type", "bin"), "full_outer")
      .na.fill(0L, Seq("nl", "nr"))
    val tot = cells.groupBy("event_type")
      .agg(sum(col("nl")).as("tl"), sum(col("nr")).as("tr"))
    cells.join(tot, Seq("event_type"))
      .groupBy(col("event_type"), col("tl"), col("tr"))
      .agg(sum(abs(col("nl") * col("tr") - col("nr") * col("tl")))
        .as("drift_num"))
      .select(col("event_type"), col("tl"), col("tr"), col("drift_num"),
        (col("drift_num").cast("double") /
          (lit(2L) * col("tl") * col("tr")).cast("double")).as("tvd"))
  }

  /** Stream-static enrichment: join a (possibly streaming) event frame
    * against a static dimension table, broadcast to each micro-batch —
    * stateless (no watermark), the production shape for decorating an
    * event stream with slowly-changing dims. The static side is
    * re-resolved per batch, so a dim refresh (e.g. re-reading a
    * parquet dir) is picked up without restarting the query. */
  def enriched(events: DataFrame, dims: DataFrame): DataFrame =
    events.join(broadcast(dims), Seq("event_type"), "left")

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double, props: String)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via flatMapGroupsWithState: per-user running
    * totals emitted on every update — the escape hatch for stateful
    * logic `session_window`/agg can't express (reference analog: a
    * long-lived per-job Reducer goroutine folding a stream,
    * mapreduce.go:401-431, but keyed and distributed here). State is
    * one small case class per user; a production deployment bounds it
    * with state TTL (GroupStateTimeout). */
  def runningUserTotals(events: org.apache.spark.sql.Dataset[EventRow])
      : org.apache.spark.sql.Dataset[UserRunning] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { r => n += 1; tot += r.value }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          Iterator.single(next)
      }
  }

  final case class UserSnapshot(user_id: Long, n_events: Long, total_cents: Long)

  /** Per-user running totals as a [[org.apache.spark.sql.streaming.StatefulProcessor]]
    * — the Spark 4 `transformWithState` successor to
    * [[runningUserTotals]]'s flatMapGroupsWithState. The new API is
    * what a production deployment should prefer: state is declared
    * through a handle (schema'd, evolvable, visible to the state-store
    * reader for debugging), per-state TTL is first-class instead of a
    * whole-operator GroupStateTimeout, and timers replace the
    * timeout-callback contortion. Value totals fold in integer cents
    * (per-event rounding, so the running sum is order-independent and
    * batch-comparable bit-exactly). State per user is one 24-byte
    * snapshot; with a TTL it is evicted by the RocksDB store once the
    * user goes quiet — the bounded-state story at 100 TB/day. */
  class RunningTotalsProcessor(ttl: org.apache.spark.sql.streaming.TTLConfig)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, UserSnapshot] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ValueState}
    @transient private var state: ValueState[UserSnapshot] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserSnapshot]("running",
        org.apache.spark.sql.Encoders.product[UserSnapshot], ttl)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: TimerValues): Iterator[UserSnapshot] = {
      val prev =
        if (state.exists()) state.get() else UserSnapshot(key, 0L, 0L)
      var n = prev.n_events
      var cents = prev.total_cents
      rows.foreach { r => n += 1; cents += Math.round(r.value * 100) }
      val next = UserSnapshot(key, n, cents)
      state.update(next)
      // one snapshot per (user, microbatch) — emissions are monotone in
      // n_events, so the latest row per user is the current total
      Iterator.single(next)
    }
  }

  /** `transformWithState` wiring for [[RunningTotalsProcessor]].
    * TimeMode.None: no timers, purely data-driven state. Requires the
    * RocksDB state store provider (the API is built for it). */
  def runningTotalsTws(events: org.apache.spark.sql.Dataset[EventRow],
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      : org.apache.spark.sql.Dataset[UserSnapshot] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)
  final case class OpenSession(start_us: Long, last_us: Long, n: Long)

  /** µs-exact timestamp codecs: `Timestamp.getTime` is ms-only, and a
    * session boundary decided at ms precision could diverge from
    * `session_window`'s µs arithmetic on boundary-adjacent events. */
  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
  private def fromMicros(us: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }

  /** Event-time TIMERS via transformWithState: per-user session
    * finalization with `session_window` semantics (session end = last
    * event + gap). A session closes two ways: a new event arrives past
    * the gap (emitted inline, the open-state handoff), or the user goes
    * quiet — the registered event-time timer fires once the WATERMARK
    * passes session end, so every session is emitted exactly once and
    * state for quiet users is cleared, not retained forever. This is
    * the timer path of the Spark 4 API, which GroupStateTimeout could
    * only approximate with one whole-operator timeout; here each key
    * re-arms its own single timer as its session extends. State is one
    * 24-byte open session per active user — bounded by the gap. */
  class SessionFinalizeProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, SessionOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var open: ValueState[OpenSession] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)
    private def emit(key: Long, s: OpenSession): SessionOut =
      SessionOut(key, fromMicros(s.start_us), fromMicros(s.last_us + gapUs), s.n)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: TimerValues): Iterator[SessionOut] = {
      // per-key order within the batch is not guaranteed — impose it
      val sorted = rows.toArray.sortBy(r => (micros(r.ts), r.event_id))
      val out = Seq.newBuilder[SessionOut]
      var cur = if (open.exists()) Some(open.get()) else None
      sorted.foreach { r =>
        val t = micros(r.ts)
        cur match {
          // session_window merges on strict interval OVERLAP: an event
          // at exactly last+gap starts a new session, so `<` not `<=`.
          // An out-of-order event CAN land before the open session's
          // start (legal while t ≥ watermark, and the 10-min watermark
          // delay is shorter than the gap) — it must extend the session
          // backwards, exactly as session_window's merge would. The
          // disjoint-EARLIER-session case (t + gap ≤ start) is
          // unreachable while watermark delay < gap, so min() on start
          // is the complete fix.
          case Some(s) if t < s.last_us + gapUs =>
            cur = Some(OpenSession(math.min(s.start_us, t),
              math.max(s.last_us, t), s.n + 1))
          case Some(s) => // gap exceeded: close the old, open a new
            out += emit(key, s)
            cur = Some(OpenSession(t, t, 1))
          case None => cur = Some(OpenSession(t, t, 1))
        }
      }
      cur.foreach { s =>
        open.update(s)
        // one armed timer per key: re-arm at the extended session end
        // (timers are ms — round UP so firing implies watermark ≥ end)
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(Math.floorDiv(s.last_us + gapUs + 999L, 1000L))
      }
      out.result().iterator
    }
    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] =
      if (open.exists()) {
        val s = open.get()
        // a stale timer (session extended after arming, delete raced)
        // must not close a still-live session early
        if (expired.getExpiryTimeInMs() * 1000L >= s.last_us + gapUs) {
          open.clear()
          Iterator.single(emit(key, s))
        } else Iterator.empty
      } else Iterator.empty
  }

  /** `transformWithState` wiring for [[SessionFinalizeProcessor]]:
    * event-time mode (timers fire off the watermark), 30-minute gap —
    * the incremental, exactly-once form of [[userSessions]]. */
  def finalizedSessions(events: org.apache.spark.sql.Dataset[EventRow],
      gap: String = "30 minutes"): org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    // parse the duration with Spark's interval parser — "45 seconds" or
    // "2 hours" mean what they say (a bare toLong-of-first-token would
    // silently read them as minutes)
    val gapUs = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(gap))
      require(iv != null && iv.months == 0,
        s"session gap must be a fixed-length interval, got '$gap'")
      iv.days * java.util.concurrent.TimeUnit.DAYS.toMicros(1) + iv.microseconds
    }
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionFinalizeProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Stream-stream join: views joined to purchases by the same user
    * within 30 minutes after the view. Both sides watermarked so the
    * join state is bounded (Spark evicts rows once they can no longer
    * match). */
  def viewToPurchase(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "1 hour")
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
  }

  /** Stream-stream LEFT OUTER join — the abandonment report: every
    * view, WITH its purchase when one follows within 30 minutes,
    * null-extended otherwise. The outer semantics are the hard part
    * in streaming: a view's null row may only emit once the watermark
    * proves no matching purchase can still arrive, so unmatched
    * results trail the data by the watermark delay and the join state
    * stays bounded. Same condition as [[viewToPurchase]], so the
    * matched subset is identical — StreamingSpec pins both halves
    * against the batch left join. */
  def viewAbandonment(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "1 hour")
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
  }

  /** Stream-stream FULL OUTER join — the reconciliation report: every
    * view with its in-window purchase, abandoned views null-extended on
    * the purchase side, AND walk-in purchases (no view in the preceding
    * 30 minutes) null-extended on the view side. Both directions of
    * null row wait on the watermark: a side may only null-emit once the
    * other side's watermark proves no matching row can still arrive, so
    * state stays bounded exactly as in the left-outer case but
    * symmetrically. Same join condition as [[viewToPurchase]], so the
    * matched subset is again identical to the inner join. */
  def viewPurchaseReconcile(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "1 hour")
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"),
      "full_outer")
  }

  /** One SCD2 merge step — [[graft.operators.RelationalQueries.cdc01Scd2Merge]]'s
    * decomposition generalized to a versioned dimension that accretes
    * batches: current rows touched by the change batch close
    * (LEFT SEMI), untouched current rows and ALL closed history carry
    * forward unmodified, and the batch opens fresh current versions
    * (previous current version + 1; 0 for never-seen keys). Dimension
    * schema: (k, seg, bal, version, is_current); change schema:
    * (k, seg, bal). Only the touched keys gain rows — history is
    * append-only under this merge, which is what makes it safe to run
    * per ingest forever. */
  def scd2Merge(dim: DataFrame, changes: DataFrame): DataFrame = {
    val cur = dim.filter(col("is_current"))
    val keys = changes.select(col("k").as("uk")).distinct()
    val closed = cur.join(keys, col("k") === col("uk"), "left_semi")
      .withColumn("is_current", lit(false))
    val carried = cur.join(keys, col("k") === col("uk"), "left_anti")
    val history = dim.filter(!col("is_current"))
    val prevV = cur.select(col("k").as("vk"), col("version").as("pv"))
    val fresh = changes.join(prevV, col("k") === col("vk"), "left")
      .select(col("k"), col("seg"), col("bal"),
        (coalesce(col("pv"), lit(-1)) + 1).as("version"),
        lit(true).as("is_current"))
    history.unionByName(closed).unionByName(carried).unionByName(fresh)
  }

  /** Streaming CDC: fold each arriving change microbatch into the SCD2
    * dimension via foreachBatch — the per-ingest loop cdc01
    * demonstrates as one batch, run continuously. The dimension lives
    * as a chain of parquet snapshots `dimRoot/v_<n>`: batch id n reads
    * `v_n` and overwrites `v_{n+1}`, so a replayed microbatch (restart
    * between sink write and offset commit) re-reads the SAME input
    * version and deterministically rewrites the SAME output dir —
    * exactly-once table state without a transactional format (a real
    * deployment swaps this for MERGE INTO on a lakehouse table; the
    * merge plan is identical). Reads of the dimension always take the
    * highest complete version. Scale: the merge shuffles on the 8-byte
    * key only, the change batch is ingest-bounded, and at 100 TB the
    * dimension is key-bucketed so semi/anti/fresh co-locate. */
  def cdcApply(changes: DataFrame, dimRoot: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val spark = batch.sparkSession
      val dim = spark.read.parquet(s"$dimRoot/v_$id")
      scd2Merge(dim, batch)
        .write.mode("overwrite").parquet(s"$dimRoot/v_${id + 1}")
    }

  /** Streaming EVOLVING-corpus LSH admission — dd18 run continuously:
    * unlike [[incrementalAdmission]] (whose corpus band table is
    * frozen for the life of the query), every arriving doc's bands
    * are folded into the state table and screen all FUTURE arrivals,
    * so a crawl that re-serves the same content across micro-batches
    * admits only the first copy.
    *
    * State lives as versioned parquet snapshots of the band table
    * (`stateRoot/v_<n>`, seeded at v_0 with the corpus bands,
    * `is_corpus` flagged) — the [[cdcApply]] exactly-once discipline:
    * batch n reads v_n and deterministically rewrites out_n and
    * v_{n+1}, so a replayed micro-batch (crash between sink write and
    * offset commit) reproduces identical outputs. A real deployment
    * swaps the snapshot chain for MERGE INTO on a band-key-bucketed
    * lakehouse table — the probe join and the append are identical
    * plans, and bucketing means neither reshuffles the state side. A
    * keyed state store (mapGroupsWithState per band key) CANNOT host
    * this operator: a doc's verdict needs the conjunction over ALL its
    * band keys plus a same-batch id-order rule — cross-key
    * coordination a per-key state function can't express; the
    * verdict is [[graft.operators.DedupQueries.evolvingVerdict]], the
    * same kernel as the oracle-checked dd18 batch twin, and its
    * id-order predicate makes the result identical under ANY
    * micro-batch split or arrival order (StreamingSpec pins both).
    *
    * Callers pre-filter docs to ≥ 3 words, as in dd12/dd18. */
  /** Streaming MV refresh — mv05's partial-state fold run continuously
    * on a live ingest: each arriving micro-batch of fact rows is
    * γ-aggregated and grain-merged into the registered MV, so a
    * continuously-ingesting corpus keeps serving MV rewrites without
    * ever rescanning the fact history. State is the [[cdcApply]] /
    * [[evolvingAdmission]] versioned-snapshot chain (`mvRoot/v_<n>`,
    * batch n reads v_n and deterministically rewrites v_{n+1}) —
    * exactly-once MV state through crash/replay without a
    * transactional format; a real deployment swaps the chain for
    * MERGE INTO on the lakehouse summary table with the identical
    * merge plan. The per-batch cost is O(|Δ| + grain): the micro-batch
    * aggregates map-side into ≤ grain rows, and the merge join touches
    * only grain-sized frames. The fold kernel and the registration
    * path are EXACTLY the oracle-checked mv06 batch twin's
    * ([[graft.operators.MvQueries.gammaPartials]] /
    * [[graft.operators.MvQueries.mergePartials]]); StreamingSpec pins
    * stream ≡ batch through a checkpointed restart. */
  def mvRefresh(factRows: DataFrame, mvRoot: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    factRows.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val spark = batch.sparkSession
      val state = spark.read.parquet(s"$mvRoot/v_$id")
      graft.operators.MvQueries.mergePartials(state,
          graft.operators.MvQueries.gammaPartials(batch))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$mvRoot/v_${id + 1}")
    }

  def evolvingAdmission(deltaDocs: DataFrame, stateRoot: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    deltaDocs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val spark = batch.sparkSession
      val state = spark.read.parquet(s"$stateRoot/v_$id")
      val bands = graft.operators.DedupQueries.lshBands(batch)
        .persist() // two readers: the verdict and the state append
      try {
        graft.operators.DedupQueries.evolvingVerdict(bands, state)
          .write.mode("overwrite").parquet(s"$stateRoot/out_$id")
        state.unionByName(bands.withColumn("is_corpus", lit(false)))
          .write.mode("overwrite").parquet(s"$stateRoot/v_${id + 1}")
      } finally { bands.unpersist(); () }
    }

  /** Streaming ANN-index ingestion — hn05 run continuously: each
    * arriving micro-batch of vectors is admitted into the persisted
    * HNSW ladder under the FROZEN quantizer (hierarchical assign +
    * hash-geometric level + affected-bucket edge rebuild), with
    * O(delta) writes per micro-batch against ONE in-place store:
    * `indexRoot/nodes` partitioned by micro-batch id (each batch
    * dynamic-overwrites exactly its own `batch=<id>` partition) and
    * `indexRoot/edges` partitioned by (layer, bucket-group), where a
    * batch dynamic-overwrites ONLY the partitions its affected
    * buckets live in with a partition-local carry
    * ([[graft.operators.IvfQueries.ladderEdgeUpsert]]) — the
    * unaffected carry side is never read and never rewritten, the
    * O(index)-per-batch snapshot rewrite of the former versioned-
    * snapshot chain. This IS the lakehouse MERGE INTO shape, expressed
    * directly in parquet partitions.
    *
    * Exactly-once without a transactional format, now per PARTITION
    * instead of per snapshot: every overwritten partition's final
    * content is a pure function of the frozen quantizer and the
    * affected buckets' full membership, so a replayed micro-batch
    * (crash between sink write and offset commit — even mid-commit,
    * with some partitions already moved) rewrites identical bytes:
    * the node write re-overwrites `batch=<id>` with the same rows,
    * and the edge carry anti-joins recomputed rows back out of any
    * partition the crashed attempt already committed.
    *
    * The recompute kernel and the quantizer are EXACTLY the oracle-
    * checked hn05 batch twin's
    * ([[graft.operators.IvfQueries.ladderRecompute]] /
    * `ladderAssignDelta` against the persisted codebook), and the
    * kernel is batch-split- and arrival-order-invariant by
    * construction: bucket membership and levels are pure per-node
    * functions of the frozen quantizer, so a bucket's final edges are
    * recomputed by the LAST batch that touches it over exactly its
    * full membership — any micro-batch partition of the delta lands
    * on the full rebuild's edge table. StreamingSpec pins stream ≡
    * batch on the per-layer edge checksum through a checkpointed
    * restart. [[graft.operators.LadderGuard]] fail-fasts a delta past
    * the upsert-vs-rebuild mass crossover when its conf is set. */
  def ladderUpsert(deltaVecs: DataFrame, indexRoot: String, lmax: Int)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    deltaVecs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      ladderUpsertBatch(batch, id, indexRoot, lmax)
    }

  /** One [[ladderUpsert]] micro-batch, exposed so StreamingSpec can
    * REPLAY a committed batch id directly (the crash-between-sink-
    * write-and-offset-commit window the exactly-once claim covers). */
  private[graft] def ladderUpsertBatch(batch: DataFrame, id: Long,
      indexRoot: String, lmax: Int): Unit = {
    val spark = batch.sparkSession
    val delta = graft.operators.IvfQueries.ladderAssignDelta(
      batch, spark.read.parquet(s"$indexRoot/cents"), lmax)
      .persist() // three readers: node upsert, affected set, members
    try {
      // membership = stored ∖ delta ∪ delta (the broadcast anti-join
      // makes a REPLAYED batch — whose node partition is already on
      // disk — count each vector once; a fresh batch's anti-join is
      // a no-op). Built BEFORE any write so the guard below can
      // refuse a dense delta while the store is still untouched.
      val stored = spark.read.parquet(s"$indexRoot/nodes")
        .select(col("vec_id"), col("embedding"), col("cid"), col("lvl"))
      val nodes = stored
        .join(broadcast(delta.select(col("vec_id"))),
          Seq("vec_id"), "left_anti")
        .unionByName(delta)
      val (members, affected, rec) =
        graft.operators.IvfQueries.ladderRecompute(nodes, delta)
      try {
        // guard FIRST — a refusal must leave the store untouched
        // (node write included), or the admitted-nodes/stale-edges
        // half-state would silently break stream ≡ batch. The
        // total-mass denominator is one column-pruned aggregate over
        // the UNEXPLODED post-operation membership (Σ lvl+1 ≡ the
        // exploded count), never a 3× explode — and it only evaluates
        // when the guard conf is set below 1.0. POST-operation on both
        // sides: the ratio is then a pure function of (pre-mutation
        // store, batch), so a replayed batch measures the identical
        // value at any crash point.
        graft.operators.LadderGuard.check(spark, "ladderUpsert",
          members.count(),
          nodes.agg(coalesce(sum(col("lvl").cast("long") + 1L),
            lit(0L))).head().getLong(0))
        // EDGES BEFORE NODES. The edge upsert is what materializes the
        // recompute, and the recompute's member fetch reads the node
        // store through `stored`'s file listing — captured at creation.
        // Writing nodes first broke REPLAY: the batch=<id> dynamic
        // overwrite deletes the crashed attempt's files out from under
        // that listing, the later member scan hits
        // FileNotFoundException, and every retry crash-loops on the
        // same sequence (nodes updated, edges stale). Edges-first makes
        // both writes pure functions of the PRE-mutation store ∖∪
        // delta: a replay at ANY crash point rewrites identical bytes
        // (nodes: the same batch=<id> rows; edges: the carry anti-joins
        // recomputed rows back out of already-overwritten partitions).
        graft.operators.IvfQueries.ladderEdgeUpsert(spark,
          s"$indexRoot/edges", affected, rec)
        delta.withColumn("batch", lit(id))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch").parquet(s"$indexRoot/nodes")
      } finally { members.unpersist(); () }
    } finally { delta.unpersist(); () }
  }

  /** Streaming CDC index maintenance — [[ladderUpsert]] completed with
    * the delete half: each micro-batch carries op-typed rows
    * (vec_id, embedding, op ∈ {insert, delete}), deletes flow through
    * hn06's affected-bucket discipline, inserts through the existing
    * path, and both land via [[graft.operators.IvfQueries
    * .ladderEdgeUpsert]]'s partition overwrite — guard-before-write
    * preserved. An id must carry ONE op per micro-batch (CDC upstream
    * sequencing); a delete of an unindexed id is a harmless no-op
    * (its buckets recompute to what they already hold).
    *
    * Replay purity is why deletes RE-ASSIGN from the frozen quantizer
    * instead of looking up their stored rows: bucket membership and
    * level are pure per-node functions of (codebook, hash), identical
    * to what the store holds — and a store lookup would break the
    * crash window (a replayed batch whose first attempt already
    * removed the rows could no longer name the affected buckets).
    * Every write below is a pure function of the PRE-mutation store
    * and the batch, so a replay at any crash point rewrites identical
    * bytes: edges first (the carry anti-joins recomputed rows back
    * out), then the node store — the batch=<id> partition gets the
    * inserts, and exactly the old partitions holding a touched id are
    * rewritten with their survivors (O(touched partitions), never the
    * node table; partitions emptied by the deletion are removed the
    * way [[graft.operators.IvfQueries.ladderEdgeUpsert]] removes
    * emptied edge groups). StreamingSpec pins stream ≡ batch over
    * (base ∪ inserts) ∖ deletes on the per-layer edge checksum,
    * through a checkpointed restart AND a replayed mixed batch. */
  def ladderCdc(deltaOps: DataFrame, indexRoot: String, lmax: Int)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    deltaOps.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      ladderCdcBatch(batch, id, indexRoot, lmax)
    }

  private[graft] def ladderCdcBatch(batch: DataFrame, id: Long,
      indexRoot: String, lmax: Int): Unit = {
    val spark = batch.sparkSession
    val cents = spark.read.parquet(s"$indexRoot/cents")
    // Op-vocabulary fail-fast rides the assignment/cache job as an
    // observe() metric (r16, the round-15 verdict's accumulator
    // suggestion): the old raw-batch probe cost a dedicated
    // limit(1).collect() driver action that RE-SCANNED the source
    // every micro-batch even on well-formed streams. `op IS NULL`
    // counts as bad explicitly — isin() evaluates to NULL (not true)
    // for a NULL op, which previously let a null-op row slip the check
    // and silently drop out of both ins/del filters (the exact
    // divergence the check exists to stop). The metric is forced by
    // the same count that eagerly populates the batch cache (one clean
    // execution — a broadcast sub-execution can resolve the
    // observation with an empty map), strictly before any compute or
    // store write.
    //
    // The op side joins back RIGHT OUTER so the observation keeps the
    // raw-batch property the old probe had: a batch row the assignment
    // DROPS (a corrupt/empty cents table nulls the coarse group and an
    // inner join would discard every row) still flows through the
    // observe node, and `n_unassigned` fail-fasts on it — an inner
    // join here would blind both checks and turn an op-typed batch
    // into a silent no-op against a broken index.
    val badOp = col("op").isNull || !col("op").isin("insert", "delete")
    val obs = org.apache.spark.sql.Observation(s"ladderCdc_ops_$id")
    // ONE hierarchical assignment over the whole micro-batch, the op
    // carried back in by a batch-sized self-join — not one assignment
    // pass per op on the hot streaming path
    val assigned = graft.operators.IvfQueries.ladderAssignDelta(
        batch.select(col("vec_id"), col("embedding")), cents, lmax)
      .join(batch.select(col("vec_id"), col("op")), Seq("vec_id"), "right")
      .observe(obs,
        sum(badOp.cast("long")).as("n_bad"),
        max(when(badOp, coalesce(col("op"), lit("<null>")))).as("bad_op"),
        sum(col("cid").isNull.cast("long")).as("n_unassigned"))
      .persist()
    try {
      assigned.count() // populate the cache + fire the observation
      val m = obs.get
      if (m.get("n_bad").exists(v => v != null && v.asInstanceOf[Long] > 0L))
        throw new IllegalArgumentException(
          s"ladderCdc: unknown op '${m("bad_op")}' in batch $id " +
            "(want insert | delete) — refusing to silently drop CDC rows")
      if (m.get("n_unassigned").exists(v => v != null && v.asInstanceOf[Long] > 0L))
        throw new IllegalStateException(
          s"ladderCdc: ${m("n_unassigned")} row(s) in batch $id failed " +
            "hierarchical assignment (corrupt or empty cents table at " +
            s"$indexRoot/cents?) — refusing to silently drop CDC rows")
      val ins = assigned.filter(col("op") === "insert").drop("op")
      val del = assigned.filter(col("op") === "delete").drop("op")
      val storedAll = spark.read.parquet(s"$indexRoot/nodes")
        .withColumn("batch", col("batch").cast("long"))
      val stored = storedAll
        .select(col("vec_id"), col("embedding"), col("cid"), col("lvl"))
      val touchedIds = ins.select(col("vec_id"))
        .unionByName(del.select(col("vec_id")))
      // surviving membership: stored ∖ touched ∪ inserts (the anti-join
      // also makes a replayed batch count each vector once)
      val nodes = stored
        .join(broadcast(touchedIds), Seq("vec_id"), "left_anti")
        .unionByName(ins)
      val (members, affected, rec) = graft.operators.IvfQueries
        .ladderRecompute(nodes, ins.unionByName(del))
      try {
        // the denominator is the POST-operation membership mass — a
        // pure function of (pre-mutation store, batch), so a REPLAYED
        // batch measures the identical ratio at any crash point. A
        // pre-op denominator breaks exactly there: a delete-heavy
        // batch admitted once would re-measure against the already-
        // shrunk store on replay and could refuse — a permanent
        // crash-loop on a committed batch.
        graft.operators.LadderGuard.check(spark, "ladderCdc",
          members.count(),
          nodes.agg(coalesce(sum(col("lvl").cast("long") + 1L),
            lit(0L))).head().getLong(0))
        // edges BEFORE nodes — the ladderUpsertBatch replay ordering
        graft.operators.IvfQueries.ladderEdgeUpsert(spark,
          s"$indexRoot/edges", affected, rec)
        // node-store delta: the new batch partition + exactly the old
        // partitions holding a touched id, rewritten with survivors
        val touchedParts = storedAll
          .join(broadcast(touchedIds), Seq("vec_id"), "left_semi")
          .select(col("batch")).distinct().collect().map(_.getLong(0))
        val survivors = storedAll
          .filter(col("batch").isInCollection(touchedParts.toSeq :+ Long.MinValue))
          .join(broadcast(touchedIds), Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("embedding"), col("cid"), col("lvl"),
            col("batch"))
        val out = graft.Pin.cut(ins.withColumn("batch", lit(id))
          .unionByName(survivors)
          // one writing task per target dir, then materialize out of
          // the plan so the overwrite doesn't read its own input
          // (Pin.cut: reliable checkpoint under a checkpoint dir —
          // the round-15 verdict's cluster-grade seam)
          .repartition(col("batch")))
        val written = out.select(col("batch")).distinct()
          .collect().map(_.getLong(0)).toSet
        out.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch").parquet(s"$indexRoot/nodes")
        val fs = new org.apache.hadoop.fs.Path(s"$indexRoot/nodes")
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        touchedParts.filterNot(written).foreach { p =>
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$indexRoot/nodes/batch=$p"), true); ()
        }
      } finally { members.unpersist(); () }
    } finally { assigned.unpersist(); () }
  }
}
