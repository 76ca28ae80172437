package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Batch/stream equivalence: the same EventStreams transformation run
  * (a) directly on a batch DataFrame and (b) through a file
  * readStream + memory sink, must agree. The batch side is itself
  * oracle-checked (ev01/ev02), so this transitively checks streaming
  * against DuckDB. */
class StreamingSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Materialize the (ns-fixed) events table to a fresh dir, split in
    * two files so the stream runs >1 microbatch and advances the
    * watermark between them. */
  private lazy val stagedDir: String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    val ev = Tables.events(spark, sf).orderBy("ts").cache()
    ev.limit(500).coalesce(1).write.mode("append").parquet(dir)
    ev.orderBy("ts").exceptAll(ev.orderBy("ts").limit(500))
      .coalesce(1).write.mode("append").parquet(dir)
    ev.unpersist()
    dir
  }

  private def runStream(transform: DataFrame => DataFrame,
      mode: String, name: String): DataFrame = {
    val src = spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagedDir)
    val q = transform(src).writeStream
      .format("memory").queryName(name).outputMode(mode)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("tumbling window: streaming complete mode ≡ batch") {
    val batch = EventStreams.tumblingHourly(
      Tables.events(spark, sf), withWatermarkCol = false)
      .orderBy("window_start", "event_type").collect().toSeq
    val stream = runStream(EventStreams.tumblingHourly(_, withWatermarkCol = false),
      "complete", "tumbling_complete")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("windowed quantile sketch: streaming state-store face ≡ batch ≡ exact ranks") {
    // the native TypedImperativeAggregate rides the streaming state
    // store via the same serialize/merge contract as the batch
    // partial→final pipeline; below the compaction threshold both
    // faces emit the exact type-1 quantiles ev18's oracle hash-checks
    val batch = EventStreams.windowedQuantiles(
      Tables.events(spark, sf), withWatermarkCol = false)
      .orderBy("window_start", "event_type").collect().toSeq
    val stream = runStream(EventStreams.windowedQuantiles(_, withWatermarkCol = false),
      "complete", "quantiles_complete")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("sliding window: streaming complete mode ≡ batch") {
    val batch = EventStreams.slidingQuarterHourly(
      Tables.events(spark, sf), withWatermarkCol = false)
      .orderBy("window_start", "event_type").collect().toSeq
    val stream = runStream(
      EventStreams.slidingQuarterHourly(_, withWatermarkCol = false),
      "complete", "sliding_complete")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("production ingestion: readStream over the original events parquet ≡ ev01 oracle query") {
    // the real pipeline path: no staging rewrite — stream straight off
    // the driver-generated events.parquet, schema-adaptive exactly as
    // Tables.events is for batch/DuckDB (nanos-as-long legacy read →
    // truncate to µs; native micros timestamp → pass through)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$sf/events.parquet").schema
    // the file stream source wants a directory root: stream the sf
    // dir, glob-restricted to the events table
    val raw = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
    val src = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
    val q = EventStreams.tumblingHourly(src, withWatermarkCol = false)
      .writeStream.format("memory").queryName("ev01_file_source")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("ev01_file_source")
      .orderBy("window_start", "event_type").collect().toSeq
    val ev01 = SparkEntry.queries("ev01_tumbling_window")(spark, sf)
      .collect().toSeq // already totally ordered
    assert(streamed.nonEmpty)
    assert(streamed == ev01)
  }

  test("tumbling window append mode emits only watermark-closed windows, consistent with batch") {
    val emitted = runStream(EventStreams.tumblingHourly(_), "append", "tumbling_append")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = EventStreams.tumblingHourly(
      Tables.events(spark, sf), withWatermarkCol = false)
      .orderBy("window_start", "event_type").collect().toSeq
    // append-mode output is a prefix subset of the batch result —
    // every emitted window must match the batch aggregate exactly
    assert(emitted.nonEmpty)
    assert(emitted.toSet.subsetOf(batch.toSet))
  }

  test("session windows: streaming complete mode ≡ batch") {
    val batch = EventStreams.userSessions(
      Tables.events(spark, sf), withWatermarkCol = false)
      .orderBy("user_id", "session_start").collect().toSeq
    val stream = runStream(EventStreams.userSessions(_, withWatermarkCol = false),
      "complete", "sessions_complete")
      .orderBy("user_id", "session_start").collect().toSeq
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("session windows agree with the batch sessionizer (ev02) on session count") {
    val viaSessionWindow = EventStreams.userSessions(
      Tables.events(spark, sf), withWatermarkCol = false).count()
    val viaBatchQuery =
      SparkEntry.queries("ev02_sessionize")(spark, sf).count()
    assert(viaSessionWindow == viaBatchQuery)
  }

  test("hll sketch builds incrementally: streaming register table ≡ batch sketch") {
    val batch = EventStreams.hllRegisters(Tables.events(spark, sf))
      .orderBy("gkey", "bucket").collect().toSeq
    val stream = runStream(EventStreams.hllRegisters, "complete", "hll_regs")
      .orderBy("gkey", "bucket").collect().toSeq
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("drift monitor builds incrementally: streaming histogram cells ≡ batch; TVD readout exact") {
    val batchCells = EventStreams.driftCells(Tables.events(spark, sf))
    val batchRows = batchCells.orderBy("event_type", "bin").collect().toSeq
    val streamCells = runStream(EventStreams.driftCells, "complete", "drift_cells")
    assert(streamCells.orderBy("event_type", "bin").collect().toSeq == batchRows)
    assert(batchRows.nonEmpty)
    // readout: live vs itself is zero drift; live vs a half-stream
    // reference is nonzero and bounded by [0, 1]
    val self = EventStreams.driftReadout(streamCells, batchCells).collect()
    assert(self.nonEmpty && self.forall(_.getAs[Double]("tvd") == 0.0))
    val half = EventStreams.driftCells(
      Tables.events(spark, sf).filter(col("event_id") % 2 === 0))
    val drift = EventStreams.driftReadout(streamCells, half).collect()
    assert(drift.forall(r => r.getAs[Double]("tvd") >= 0.0 &&
      r.getAs[Double]("tvd") <= 1.0))
  }

  test("count-min cells build incrementally: streaming cell counts ≡ batch sketch") {
    val batch = EventStreams.cmsCells(Tables.events(spark, sf))
      .orderBy("row_j", "bucket").collect().toSeq
    val stream = runStream(EventStreams.cmsCells, "complete", "cms_cells")
      .orderBy("row_j", "bucket").collect().toSeq
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("flatMapGroupsWithState: final per-user totals equal batch groupBy") {
    import TestSpark.spark.implicits._
    val src = spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagedDir)
      .as[EventStreams.EventRow]
    val q = EventStreams.runningUserTotals(src)
      .writeStream.format("memory").queryName("running_totals")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // update mode emits one row per user per microbatch; the LAST row
    // per user is the final state — compare counts with batch
    val finalCounts = spark.table("running_totals")
      .groupBy("user_id").agg(max("n_events").as("n"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(finalCounts == batch)
  }

  test("transformWithState: StatefulProcessor totals equal batch groupBy, cents bit-exact") {
    import TestSpark.spark.implicits._
    // transformWithState is built for the RocksDB store — pin it on
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = spark.readStream
        .schema(Tables.events(spark, sf).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stagedDir)
        .as[EventStreams.EventRow]
      val q = EventStreams.runningTotalsTws(src)
        .writeStream.format("memory").queryName("tws_totals")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // emissions are monotone in n_events — the max row per user is
      // the final state; per-event cent rounding makes the value total
      // order-independent, so it must match batch BIT-exactly
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("n_events").desc)
      val finals = spark.table("tws_totals")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "n_events", "total_cents")
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val batch = Tables.events(spark, sf)
        .groupBy("user_id").agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(finals == batch)
      assert(batch.nonEmpty)
      // >1 microbatch ran, so at least one user emitted more than once
      // (state carried across batches, not recomputed per batch)
      assert(spark.table("tws_totals").count() > finals.size,
        "expected multiple emissions per user across microbatches")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState event-time timers: sessions finalize exactly once, session_window-exact") {
    import TestSpark.spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = spark.readStream
        .schema(Tables.events(spark, sf).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stagedDir)
        .as[EventStreams.EventRow]
      val q = EventStreams.finalizedSessions(src)
        .writeStream.format("memory").queryName("tws_sessions")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("tws_sessions")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .toSeq
      assert(got.nonEmpty)
      // exactly once: no session may emit both inline AND from a timer
      assert(got.distinct.size == got.size, "duplicate session emission")
      // correctness: every emission is a true session_window session
      val batch = EventStreams.userSessions(
        Tables.events(spark, sf), withWatermarkCol = false)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .toSet
      got.foreach(s => assert(batch.contains(s), s"emitted non-session $s"))
      // completeness (inline closes): a batch session FOLLOWED by a
      // later same-user event is closed by that event's arrival —
      // emission is guaranteed regardless of the final watermark
      val evTimes = Tables.events(spark, sf)
        .select("user_id", "ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1)))
      val followed = batch.filter { case (u, _, end, _) =>
        evTimes.exists { case (eu, ets) => eu == u && ets.after(end) } }
      val gotSet = got.toSet
      followed.foreach(s =>
        assert(gotSet.contains(s), s"followed session not emitted: $s"))
      // the timer path fired: some emitted session has NO later event
      // for its user, so only a watermark-driven timer could close it
      assert(got.exists(s => !followed.contains(s)),
        "expected at least one timer-finalized session")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState sessions: an out-of-order event extends the open session BACKWARDS") {
    // The 10-min watermark delay is shorter than the 30-min gap, so an
    // event with t < open-session start is reachable (not late) — the
    // merge must take min() on the start, exactly as session_window's
    // interval merge would. Staged in ts order this never triggers,
    // hence a dedicated 3-microbatch fixture:
    //   batch 1: 12:00:00, 12:00:30   (opens [12:00:00, 12:30:30))
    //   batch 2: 11:59:00             (≥ watermark 11:50:30, < start)
    //   batch 3: 13:30:00             (past gap → closes inline)
    import TestSpark.spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("graft-ooo-sess").toString
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      def stage(mtime: Long, rows: (Long, String)*): Unit = {
        val before = new java.io.File(dir).listFiles().map(_.getName).toSet
        rows.map { case (id, t) =>
          EventStreams.EventRow(id, ts(t), 1L, "view", 1.0, "{}") }
          .toDS().coalesce(1).write.mode("append").parquet(dir)
        // deterministic microbatch order under maxFilesPerTrigger=1:
        // the file source orders by modification time
        new java.io.File(dir).listFiles()
          .filter(f => !before(f.getName)).foreach(_.setLastModified(mtime))
      }
      stage(1000000L, (1L, "2024-01-01 12:00:00"), (2L, "2024-01-01 12:00:30"))
      stage(2000000L, (3L, "2024-01-01 11:59:00"))
      stage(3000000L, (4L, "2024-01-01 13:30:00"))
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[EventStreams.EventRow]].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
        .as[EventStreams.EventRow]
      val q = EventStreams.finalizedSessions(src)
        .writeStream.format("memory").queryName("tws_ooo_sessions")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("tws_ooo_sessions")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .toSeq
      assert(got.contains(
        (1L, ts("2024-01-01 11:59:00"), ts("2024-01-01 12:30:30"), 3L)),
        s"merged session must start at the out-of-order event; got $got")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream-stream join (view→purchase within 30min) ≡ batch join") {
    val streamed = runStream(EventStreams.viewToPurchase, "append", "ss_join")
      .select("view_id", "purchase_id").orderBy("view_id", "purchase_id")
      .collect().toSeq
    val batch = EventStreams.viewToPurchase(Tables.events(spark, sf))
      .select("view_id", "purchase_id").orderBy("view_id", "purchase_id")
      .collect().toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stream-stream LEFT OUTER join: null rows emit only when the watermark closes them") {
    val streamed = runStream(EventStreams.viewAbandonment, "append", "ss_outer")
      .select(col("view_id"), col("purchase_id"), col("v_ts"))
      .collect().toSeq
    val batchDf = EventStreams.viewAbandonment(Tables.events(spark, sf))
    val batch = batchDf.select(col("view_id"), col("purchase_id"), col("v_ts"))
      .collect().toSeq
    // Matched rows don't wait for the watermark: identical to batch.
    def matched(rows: Seq[org.apache.spark.sql.Row]) =
      rows.filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(matched(streamed) == matched(batch))
    // Null-extended rows may be withheld for views still inside the
    // final watermark horizon; on the CLOSED region (views older than
    // maxTs - 1h watermark - 30min join window) stream ≡ batch.
    val maxTs = Tables.events(spark, sf)
      .agg(max(col("ts"))).head().getTimestamp(0).getTime
    val horizon = maxTs - (90 * 60 * 1000L)
    def closedNulls(rows: Seq[org.apache.spark.sql.Row]) =
      rows.filter(r => r.isNullAt(1) && r.getTimestamp(2).getTime < horizon)
        .map(_.getLong(0)).sorted
    assert(closedNulls(streamed) == closedNulls(batch))
    assert(closedNulls(batch).nonEmpty, "test corpus must contain abandoned views")
    // NEGATIVE guard (bounded-state contract): a view whose 30-min
    // match window the final watermark (maxTs - 1h) cannot yet prove
    // closed must NOT have emitted a null row — an early null would
    // mean the join declares abandonment while a matching purchase can
    // still legally arrive.
    def openNulls(rows: Seq[org.apache.spark.sql.Row]) =
      rows.filter(r => r.isNullAt(1) && r.getTimestamp(2).getTime >= horizon)
        .map(_.getLong(0)).sorted
    assert(openNulls(streamed).isEmpty,
      s"null rows emitted INSIDE the watermark horizon: ${openNulls(streamed).take(5)}")
    // ...and the guard must bite: the batch join DOES see abandoned
    // views in that region, so the stream really is withholding them.
    assert(openNulls(batch).nonEmpty,
      "no still-open abandoned views in the corpus — horizon guard is vacuous")
  }

  test("stream-stream FULL OUTER join: both null directions close with the watermark") {
    val cols = Seq("view_id", "purchase_id", "v_ts", "p_ts")
    val streamed = runStream(EventStreams.viewPurchaseReconcile, "append", "ss_full")
      .select(cols.map(col): _*).collect().toSeq
    val batch = EventStreams.viewPurchaseReconcile(Tables.events(spark, sf))
      .select(cols.map(col): _*).collect().toSeq
    // Matched rows don't wait for the watermark: identical to batch.
    def matched(rows: Seq[org.apache.spark.sql.Row]) =
      rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(matched(streamed) == matched(batch))
    // Closed-region check, each direction, against a LOOSE horizon
    // (2h = watermark delay + join window + another 30-min margin):
    // a row this old is provably unmatched under ANY of the eviction
    // margins Spark may derive from the interval condition, so its
    // null row must have emitted and match batch exactly. (The exact
    // per-side eviction threshold differs: a view closes once the
    // watermark passes v_ts + 30min, but the purchase side's derived
    // state watermark carries the interval bound on the other side —
    // observed ~watermark − 30min — so the shared bound is the loose
    // one.)
    val maxTs = Tables.events(spark, sf)
      .agg(max(col("ts"))).head().getTimestamp(0).getTime
    val closedHorizon = maxTs - (120 * 60 * 1000L)
    def closedViewNulls(rows: Seq[org.apache.spark.sql.Row]) =
      rows.filter(r => !r.isNullAt(0) && r.isNullAt(1) &&
          r.getTimestamp(2).getTime < closedHorizon)
        .map(_.getLong(0)).sorted
    def closedPurchaseNulls(rows: Seq[org.apache.spark.sql.Row]) =
      rows.filter(r => r.isNullAt(0) && !r.isNullAt(1) &&
          r.getTimestamp(3).getTime < closedHorizon)
        .map(_.getLong(1)).sorted
    assert(closedViewNulls(streamed) == closedViewNulls(batch))
    assert(closedPurchaseNulls(streamed) == closedPurchaseNulls(batch))
    assert(closedViewNulls(batch).nonEmpty, "corpus must contain abandoned views")
    assert(closedPurchaseNulls(batch).nonEmpty, "corpus must contain walk-in purchases")
    // NEGATIVE guard, both directions, against each side's TIGHT bound
    // (the earliest point a null emission could ever be legal): a view
    // inside watermark + join window (90min), a purchase inside the
    // bare watermark (60min), must NOT have null-emitted — a matching
    // row can still legally arrive for it.
    val openViewHorizon = maxTs - (90 * 60 * 1000L)
    val openPurchaseHorizon = maxTs - (60 * 60 * 1000L)
    def openViewNulls(rows: Seq[org.apache.spark.sql.Row]) =
      rows.filter(r => !r.isNullAt(0) && r.isNullAt(1) &&
          r.getTimestamp(2).getTime >= openViewHorizon).map(_.getLong(0))
    def openPurchaseNulls(rows: Seq[org.apache.spark.sql.Row]) =
      rows.filter(r => r.isNullAt(0) && !r.isNullAt(1) &&
          r.getTimestamp(3).getTime >= openPurchaseHorizon).map(_.getLong(1))
    assert(openViewNulls(streamed).isEmpty,
      s"view null rows inside the horizon: ${openViewNulls(streamed).take(5)}")
    assert(openPurchaseNulls(streamed).isEmpty,
      s"purchase null rows inside the horizon: ${openPurchaseNulls(streamed).take(5)}")
    // ...and the guard must bite: batch DOES see unmatched rows there,
    // so the stream really is withholding them.
    assert(openViewNulls(batch).nonEmpty || openPurchaseNulls(batch).nonEmpty,
      "no still-open unmatched rows in the corpus — horizon guard is vacuous")
  }

  test("foreachBatch multi-sink: one stream feeds two outputs from a shared batch (ref multi-job fan-out)") {
    val outA = Files.createTempDirectory("graft-sinkA").toString
    val outB = Files.createTempDirectory("graft-sinkB").toString
    val src = spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .parquet(stagedDir)
    val q = src.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      // the reference pays the scan once and fans out per job
      // (mapreduce.go:162-184); foreachBatch is the streaming analog —
      // persist the microbatch, feed N sinks
      val shared = batch.persist()
      shared.groupBy("event_type").count()
        .write.mode("append").parquet(outA)
      shared.groupBy("user_id").count()
        .write.mode("append").parquet(outB)
      shared.unpersist()
      ()
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val a = spark.read.parquet(outA).groupBy("event_type").agg(sum("count"))
    val b = spark.read.parquet(outB).groupBy("user_id").agg(sum("count"))
    assert(a.count() == Tables.events(spark, sf).select("event_type").distinct().count())
    assert(b.count() == Tables.events(spark, sf).select("user_id").distinct().count())
  }

  test("streaming dedup drops re-delivered events") {
    // stage a copy of the first file again → duplicate event_ids
    val dir = Files.createTempDirectory("graft-dedup").toString
    val ev = Tables.events(spark, sf).limit(200).cache()
    ev.coalesce(1).write.mode("append").parquet(dir)
    ev.coalesce(1).write.mode("append").parquet(dir)
    val src = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.dedupedEvents(src)
      .groupBy().agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("dedup_n")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.table("dedup_n").collect()(0).getLong(0)
    assert(n == 200) // 400 delivered, 200 distinct
    ev.unpersist()
  }

  test("streaming near-dup suppression drops re-arriving content, not just ids") {
    val dir = Files.createTempDirectory("graft-neardup").toString
    val docs = Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), col("text"),
        expr("timestamp_micros(cast(doc_id * 1000000 as long))").as("ts"))
      .cache()
    docs.coalesce(1).write.mode("append").parquet(dir)
    // identical content re-arrives a minute later under fresh ids —
    // an id-keyed dedup would pass all of it through
    docs.select((col("doc_id") + 1000).as("doc_id"), col("text"),
      expr("timestamp_micros(cast((doc_id + 60) * 1000000 as long))").as("ts"))
      .coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.nearDupSuppressed(src)
      .groupBy().agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("neardup_n")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.table("neardup_n").collect()(0).getLong(0)
    val distinctBands = docs
      .select(graft.functions.TextFunctions.lshBand(col("text"), 0, 2))
      .distinct().count()
    assert(n == distinctBands,
      s"expected $distinctBands content-distinct survivors, got $n")
    docs.unpersist()
  }

  test("streaming incremental admission (dd12 composed with streaming) ≡ batch registry query") {
    // The dedup mandate composed with streaming: static corpus band
    // table + streaming delta shard, per-doc candidate counts must
    // equal the oracle-checked batch dd12 row for row. The delta is
    // staged in two files → two microbatches, so admission genuinely
    // accumulates across batches before complete mode reports it.
    graft.plans.VectorExpressions.register(spark)
    val dir = Files.createTempDirectory("graft-admit").toString
    val docs = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 3).cache()
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val corpusBands = graft.operators.DedupQueries
      .lshBands(docs.filter(col("doc_id") % 10 =!= 0)).cache()
    delta.limit(20).coalesce(1).write.mode("append").parquet(dir)
    delta.exceptAll(delta.limit(20)).coalesce(1)
      .write.mode("append").parquet(dir)
    val src = spark.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.incrementalAdmission(src, corpusBands)
      .writeStream.format("memory").queryName("admit")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("admit").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val want = graft.operators.DedupQueries.dd12IncrementalAdmission
      .build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == want, s"stream admission diverged: got ${got.take(5)}… want ${want.take(5)}…")
    assert(got.nonEmpty && got.exists(_._3) , "expected at least one admitted doc")
    corpusBands.unpersist(); docs.unpersist()
  }

  test("streaming evolving LSH admission: arrivals screen later arrivals; ≡ oracle-checked dd18; restart-safe") {
    graft.plans.VectorExpressions.register(spark)
    val root = Files.createTempDirectory("graft-evolve").toString
    val docs = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 3).cache()
    val delta = docs.filter(col("doc_id") % 10 === 0).cache()
    // evolving state seeded with the corpus band table (v_0)
    graft.operators.DedupQueries
      .lshBands(docs.filter(col("doc_id") % 10 =!= 0))
      .withColumn("is_corpus", lit(true))
      .write.parquet(s"$root/state/v_0")
    // stage the delta in three id-range files, written OUT OF ORDER
    // (middle tercile first): the verdict's id-order predicate makes
    // the result arrival-order-invariant, so stream must still equal
    // the batch twin exactly
    val ids = delta.select("doc_id").collect().map(_.getLong(0)).sorted
    val (t1, t2, t3) = (ids.take(ids.length / 3).toSet,
      ids.slice(ids.length / 3, 2 * ids.length / 3).toSet,
      ids.drop(2 * ids.length / 3).toSet)
    def stage(s: Set[Long]): Unit = {
      delta.filter(col("doc_id").isInCollection(s))
        .coalesce(1).write.mode("append").parquet(s"$root/in")
      Thread.sleep(5) // distinct mtimes → deterministic file order
    }
    stage(t2); stage(t1)
    def run(): Unit = {
      val src = spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
      val q = graft.streaming.EventStreams.evolvingAdmission(src, s"$root/state")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run() // batches 0, 1 (two files staged so far)
    stage(t3)
    run() // RESTART from the checkpoint: must process only the new file
    val outDirs = new java.io.File(s"$root/state").listFiles()
      .filter(_.getName.startsWith("out_")).map(_.toString).sorted.toIndexedSeq
    assert(outDirs.length == 3,
      s"restart must not reprocess committed batches: ${outDirs.length} out dirs")
    val got = spark.read.parquet(outDirs: _*)
    // exactly-once: every delta doc verdicted exactly once across batches
    assert(got.count() == ids.length.toLong)
    assert(got.select("doc_id").distinct().count() == ids.length.toLong)
    val want = graft.operators.DedupQueries.dd18EvolvingAdmission
      .build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val gotSeq = got.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(gotSeq == want,
      s"stream evolving admission diverged: got ${gotSeq.take(5)}… want ${want.take(5)}…")
    // the point of EVOLVING state: strictly harder to get in than the
    // frozen-corpus dd12 (same docs, same banding) whenever the delta
    // has intra-shard near-dups; never easier
    val dd12 = graft.operators.DedupQueries.dd12IncrementalAdmission
      .build(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    gotSeq.foreach { case (id, _, adm) =>
      assert(!adm || dd12(id),
        s"doc $id admitted by evolving state but rejected by frozen corpus")
    }
    delta.unpersist(); docs.unpersist()
  }

  test("streaming ladder upsert: micro-batched ANN ingestion ≡ oracle-checked hn05 batch twin; restart-safe") {
    graft.plans.VectorExpressions.register(spark)
    val root = Files.createTempDirectory("graft-ladder").toString
    // seed the in-place store with hn05's persisted production-shape
    // base ladder: nodes partitioned by ingest batch (the base is
    // batch=-1), edges partitioned by (layer, bucket-group) — the
    // layout ladderUpsert dynamic-overwrites O(delta) partitions of
    val (idxDir, lmax) = graft.operators.IvfQueries.h5IndexDir(spark, sf)
    spark.read.parquet(s"$idxDir/nodes").withColumn("batch", lit(-1L))
      .write.partitionBy("batch").parquet(s"$root/idx/nodes")
    spark.read.parquet(s"$idxDir/edges")
      .write.partitionBy("layer", "egrp").parquet(s"$root/idx/edges")
    spark.read.parquet(s"$idxDir/cents").write.parquet(s"$root/idx/cents")
    val delta = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 211 === 0)
      .select(col("vec_id"), col("embedding")).cache()
    // stage the delta in three id-range files, written OUT OF ORDER
    // (middle tercile first): the admit kernel is arrival-order- and
    // batch-split-invariant by construction, so the final snapshot
    // must equal the one-shot batch twin exactly
    val ids = delta.select("vec_id").collect().map(_.getLong(0)).sorted
    assert(ids.length >= 3, "need ≥3 delta vectors to stage terciles")
    val (t1, t2, t3) = (ids.take(ids.length / 3).toSet,
      ids.slice(ids.length / 3, 2 * ids.length / 3).toSet,
      ids.drop(2 * ids.length / 3).toSet)
    def stage(s: Set[Long]): Unit = {
      delta.filter(col("vec_id").isInCollection(s))
        .coalesce(1).write.mode("append").parquet(s"$root/in")
      Thread.sleep(5)
    }
    stage(t2); stage(t1)
    def run(): Unit = {
      val src = spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
      val q = EventStreams.ladderUpsert(src, s"$root/idx", lmax)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run() // batches 0, 1
    stage(t3)
    run() // RESTART from the checkpoint: only the new file admits
    // three batches → node partitions {-1 (base), 0, 1, 2} and a
    // restart must not re-admit committed batches as NEW partitions
    val batches = spark.read.parquet(s"$root/idx/nodes")
      .select(col("batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(batches == Set(-1L, 0L, 1L, 2L),
      s"expected node partitions for base + 3 batches, got $batches")
    // exactly-once node admission: every vector present exactly once
    val nodesN = spark.read.parquet(s"$root/idx/nodes")
    val total = Tables.embeddings(spark, sf).count()
    assert(nodesN.count() == total, s"node table must hold base+delta = $total")
    assert(nodesN.select("vec_id").distinct().count() == total)
    // per-layer edge count + checksum ≡ the hn05 batch twin (itself
    // oracle-checked ≡ a full rebuild), so stream ≡ full rebuild
    val got = spark.read.parquet(s"$root/idx/edges")
      .groupBy(col("layer").cast("int").as("layer"))
      .agg(count(lit(1)).as("n_edges"),
        sum((col("src") * lit(1000003L) + col("dst")) % lit(1000000007L))
          .cast("long").as("edge_sum"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = SparkEntry.queries("hn05_ladder_upsert")(spark, sf)
      .collect()
      .filter(_.getLong(4) > 0) // empty layers emit no stream edge rows
      .map(r => r.getInt(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(want.nonEmpty && got == want,
      s"streamed ladder diverged: got $got want $want")
    delta.unpersist()
  }

  test("ladder upsert REPLAY: re-running a committed batch id rewrites identical bytes (crash between sink write and offset commit)") {
    // The exactly-once claim's exact window: the sink writes land but
    // the offset commit doesn't, so the engine re-runs the SAME batch
    // id over the already-mutated store. Before the edges-before-nodes
    // ordering fix this crash-looped: the batch=<id> node overwrite
    // deleted the first attempt's files out from under the captured
    // file listing, and the edge recompute's member fetch then hit
    // FileNotFoundException on every retry.
    graft.plans.VectorExpressions.register(spark)
    val root = Files.createTempDirectory("graft-ladder-replay").toString
    val (idxDir, lmax) = graft.operators.IvfQueries.h5IndexDir(spark, sf)
    spark.read.parquet(s"$idxDir/nodes").withColumn("batch", lit(-1L))
      .write.partitionBy("batch").parquet(s"$root/idx/nodes")
    spark.read.parquet(s"$idxDir/edges")
      .write.partitionBy("layer", "egrp").parquet(s"$root/idx/edges")
    spark.read.parquet(s"$idxDir/cents").write.parquet(s"$root/idx/cents")
    val batch = spark.read.parquet(s"$idxDir/delta_src")
    def snapshot(): (Long, Long, Map[Int, (Long, Long)]) = {
      val n = spark.read.parquet(s"$root/idx/nodes")
      val e = spark.read.parquet(s"$root/idx/edges")
        .groupBy(col("layer").cast("int").as("layer"))
        .agg(count(lit(1)).as("n"),
          sum((col("src") * lit(1000003L) + col("dst")) % lit(1000000007L))
            .cast("long").as("chk"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      (n.count(), n.select("vec_id").distinct().count(), e)
    }
    EventStreams.ladderUpsertBatch(batch, 0L, s"$root/idx", lmax)
    val first = snapshot()
    // the replay: same batch id over the post-commit store — must not
    // throw and must leave every byte-equivalent aggregate unchanged
    EventStreams.ladderUpsertBatch(batch, 0L, s"$root/idx", lmax)
    val second = snapshot()
    assert(second == first,
      s"replayed batch mutated the store: $second vs $first")
    // and the replayed store still equals the oracle-checked batch twin
    val want = SparkEntry.queries("hn05_ladder_upsert")(spark, sf)
      .collect().filter(_.getLong(4) > 0)
      .map(r => r.getInt(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(second._3 == want,
      s"replayed ladder diverged from the batch twin: ${second._3} vs $want")
  }

  test("streaming CDC ladder: inserts+deletes ≡ batch ladder over (base ∪ ins) ∖ del; restart-safe; mixed-batch replay idempotent") {
    graft.plans.VectorExpressions.register(spark)
    val root = Files.createTempDirectory("graft-ladder-cdc").toString
    val (idxDir, lmax) = graft.operators.IvfQueries.h5IndexDir(spark, sf)
    spark.read.parquet(s"$idxDir/nodes").withColumn("batch", lit(-1L))
      .write.partitionBy("batch").parquet(s"$root/idx/nodes")
    spark.read.parquet(s"$idxDir/edges")
      .write.partitionBy("layer", "egrp").parquet(s"$root/idx/edges")
    spark.read.parquet(s"$idxDir/cents").write.parquet(s"$root/idx/cents")
    // inserts: the staged %211 ingest batch; deletes: hn06's base
    // slice (%211 == 105) — ids disjoint by construction
    val ins = spark.read.parquet(s"$idxDir/delta_src")
      .withColumn("op", lit("insert")).cache()
    val del = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 211 === 105)
      .select(col("vec_id"), col("embedding"))
      .withColumn("op", lit("delete")).cache()
    val insIds = ins.select("vec_id").collect().map(_.getLong(0)).sorted
    val delIds = del.select("vec_id").collect().map(_.getLong(0)).sorted
    assert(insIds.length >= 2 && delIds.length >= 2,
      "need ≥2 inserts and ≥2 deletes to stage a mixed batch")
    // three staged files: pure inserts, MIXED (inserts + deletes),
    // pure deletes — the mixed one is the replay target
    def stage(df: org.apache.spark.sql.DataFrame): Unit = {
      df.coalesce(1).write.mode("append").parquet(s"$root/in")
      Thread.sleep(5)
    }
    val insHead = insIds.take(insIds.length / 2).toSet
    val delHead = delIds.take(delIds.length / 2).toSet
    stage(ins.filter(col("vec_id").isInCollection(insHead)))
    stage(ins.filter(!col("vec_id").isInCollection(insHead))
      .unionByName(del.filter(col("vec_id").isInCollection(delHead))))
    def run(): Unit = {
      val src = spark.readStream.schema(ins.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
      val q = EventStreams.ladderCdc(src, s"$root/idx", lmax)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run() // batches 0 (inserts), 1 (mixed)
    stage(del.filter(!col("vec_id").isInCollection(delHead)))
    run() // RESTART: only the new pure-delete file admits as batch 2
    def snapshot(): (Set[Long], Map[Int, (Long, Long)]) = {
      val n = spark.read.parquet(s"$root/idx/nodes")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val e = spark.read.parquet(s"$root/idx/edges")
        .groupBy(col("layer").cast("int").as("layer"))
        .agg(count(lit(1)).as("n"),
          sum((col("src") * lit(1000003L) + col("dst")) % lit(1000000007L))
            .cast("long").as("chk"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      (n, e)
    }
    val (gotIds, gotEdges) = snapshot()
    // node membership: (base ∪ inserts) ∖ deletes, each exactly once
    val base = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 211 =!= 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val wantIds = base ++ insIds -- delIds
    assert(gotIds == wantIds,
      s"CDC membership diverged: ${gotIds.size} vs ${wantIds.size} ids")
    // edge store ≡ the from-scratch rebuild over the surviving
    // membership: ladderRecompute with touched = every node recomputes
    // every bucket — the full per-layer rebuild by construction
    val nodesF = spark.read.parquet(s"$root/idx/nodes")
      .select(col("vec_id"), col("embedding"), col("cid"), col("lvl"))
    val (m, _, recAll) =
      graft.operators.IvfQueries.ladderRecompute(nodesF, nodesF)
    val want = recAll
      .groupBy(col("layer").cast("int").as("layer"))
      .agg(count(lit(1)).as("n"),
        sum((col("src") * lit(1000003L) + col("dst")) % lit(1000000007L))
          .cast("long").as("chk"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    m.unpersist()
    assert(gotEdges == want,
      s"CDC edge store diverged from the full rebuild: $gotEdges vs $want")
    // REPLAY the committed MIXED batch (id 1) directly — the crash
    // window between sink write and offset commit: the store must be
    // byte-stable (same membership, same checksums)
    val mixed = ins.filter(!col("vec_id").isInCollection(insHead))
      .unionByName(del.filter(col("vec_id").isInCollection(delHead)))
    EventStreams.ladderCdcBatch(mixed, 1L, s"$root/idx", lmax)
    val (replayIds, replayEdges) = snapshot()
    assert(replayIds == gotIds && replayEdges == gotEdges,
      "replaying the committed mixed batch mutated the store")
    ins.unpersist(); del.unpersist()
  }

  test("CDC guard + op validation: enabled guard is replay-stable on a delete-heavy batch; unknown ops fail fast") {
    graft.plans.VectorExpressions.register(spark)
    val root = Files.createTempDirectory("graft-cdc-guard").toString
    val (idxDir, lmax) = graft.operators.IvfQueries.h5IndexDir(spark, sf)
    spark.read.parquet(s"$idxDir/nodes").withColumn("batch", lit(-1L))
      .write.partitionBy("batch").parquet(s"$root/idx/nodes")
    spark.read.parquet(s"$idxDir/edges")
      .write.partitionBy("layer", "egrp").parquet(s"$root/idx/edges")
    spark.read.parquet(s"$idxDir/cents").write.parquet(s"$root/idx/cents")
    // an op outside {insert, delete} must fail the batch loudly, not
    // silently fall out of both filters and diverge the index
    val badBatch = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0)
      .select(col("vec_id"), col("embedding"))
      .withColumn("op", lit("Upsert"))
    val ex = intercept[IllegalArgumentException] {
      EventStreams.ladderCdcBatch(badBatch, 0L, s"$root/idx", lmax)
    }
    assert(ex.getMessage.contains("Upsert") &&
      ex.getMessage.contains("insert | delete"),
      s"diagnostic must name the bad op and the vocabulary: ${ex.getMessage}")
    // a NULL op must fail the same way: isin() evaluates to NULL (not
    // true) for a NULL input, so a predicate without the explicit
    // isNull arm silently passed null-op rows into the drop-out path
    val nullBatch = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0)
      .select(col("vec_id"), col("embedding"))
      .withColumn("op", lit(null).cast("string"))
    val exN = intercept[IllegalArgumentException] {
      EventStreams.ladderCdcBatch(nullBatch, 0L, s"$root/idx", lmax)
    }
    assert(exN.getMessage.contains("<null>") &&
      exN.getMessage.contains("insert | delete"),
      s"diagnostic must name the null op distinctly: ${exN.getMessage}")
    // a batch the ASSIGNMENT drops (empty/corrupt cents nulls the
    // coarse group) must fail loudly too: the op carry-back joins
    // RIGHT OUTER so the guard observation sees every raw row — an
    // inner join here turned a valid batch into a silent no-op against
    // a broken index (r16 review finding)
    val root2 = Files.createTempDirectory("graft-cdc-nocents").toString
    spark.read.parquet(s"$idxDir/nodes").withColumn("batch", lit(-1L))
      .write.partitionBy("batch").parquet(s"$root2/idx/nodes")
    spark.read.parquet(s"$idxDir/edges")
      .write.partitionBy("layer", "egrp").parquet(s"$root2/idx/edges")
    spark.read.parquet(s"$idxDir/cents").limit(0)
      .write.parquet(s"$root2/idx/cents")
    val okBatch = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0)
      .select(col("vec_id"), col("embedding"))
      .withColumn("op", lit("insert"))
    val exU = intercept[IllegalStateException] {
      EventStreams.ladderCdcBatch(okBatch, 0L, s"$root2/idx", lmax)
    }
    assert(exU.getMessage.contains("failed hierarchical assignment"),
      s"diagnostic must name the assignment failure: ${exU.getMessage}")
    // a DELETE-HEAVY batch under an ENABLED guard: the ratio must
    // measure identically on the replay (post-operation denominator) —
    // a pre-op denominator re-measured against the already-shrunk
    // store and crash-looped exactly here
    val mixed = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 211 === 0)
      .select(col("vec_id"), col("embedding"))
      .withColumn("op", lit("insert"))
      .unionByName(Tables.embeddings(spark, sf)
        .filter(col("vec_id") % 211 === 105)
        .select(col("vec_id"), col("embedding"))
        .withColumn("op", lit("delete")))
    val key = graft.operators.LadderGuard.ConfKey
    try {
      // measure the batch's true post-op ratio first (guard off), then
      // enable the guard just above it so the first attempt ADMITS
      EventStreams.ladderCdcBatch(mixed, 1L, s"$root/idx", lmax)
      val edges1 = spark.read.parquet(s"$root/idx/edges").count()
      spark.conf.set(key, "0.9999")
      // REPLAY with the guard enabled: must admit again (identical
      // ratio), not refuse the committed batch
      EventStreams.ladderCdcBatch(mixed, 1L, s"$root/idx", lmax)
      assert(spark.read.parquet(s"$root/idx/edges").count() == edges1,
        "guarded replay mutated the edge store")
    } finally spark.conf.unset(key)
  }

  test("streaming MV refresh: foreachBatch γ-merges ≡ batch γ of all ingested rows; restart-safe") {
    val root = Files.createTempDirectory("graft-mvstream").toString
    val li = Tables.lineitem(spark, sf).cache()
    // three ingest files by a deterministic key class; middle class
    // staged first — the grain merge is order-insensitive, so the
    // final snapshot must equal one γ over everything regardless
    def stage(i: Int): Unit = {
      li.filter(col("l_orderkey") % 3 === i)
        .coalesce(1).write.mode("append").parquet(s"$root/in")
      Thread.sleep(5)
    }
    graft.operators.MvQueries.gammaPartials(li.filter(lit(false)))
      .coalesce(1).write.parquet(s"$root/mv/v_0") // MV born empty
    stage(1); stage(0)
    def run(): Unit = {
      val src = spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
      val q = EventStreams.mvRefresh(src, s"$root/mv")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run() // batches 0, 1
    stage(2)
    run() // RESTART from checkpoint: only the new file folds
    assert(new java.io.File(s"$root/mv/v_3").exists(), "three batches → v_3")
    assert(!new java.io.File(s"$root/mv/v_4").exists(),
      "restart must not refold committed batches")
    val got = spark.read.parquet(s"$root/mv/v_3")
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    val want = graft.operators.MvQueries.gammaPartials(li)
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    assert(got == want, s"streamed MV diverged: $got vs $want")
    // and the snapshot SERVES: register v_3 for the full fact path,
    // the rewritten aggregate must equal the direct fact aggregate.
    // (unpersist first: the shared CacheManager would otherwise swap
    // the fact scan for the cached frame and hide the file path the
    // rewrite matches on)
    val direct = li.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    li.unpersist(blocking = true)
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.mv.registry",
      s"$root/mv/v_3|$sf/lineitem.parquet|l_returnflag,l_linestatus|" +
        "l_quantity:sum_qty,l_extendedprice:sum_price")
    val served = s2.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")
    assert(served.queryExecution.executedPlan.toString.contains("v_3"),
      "registered stream snapshot must serve the rewrite")
    assert(served.collect().toSeq == direct)
  }

  test("streaming CDC (cdc01 composed with streaming): foreachBatch SCD2 merges ≡ sequential batch merges") {
    // Two change files → two microbatches folded into the versioned
    // dimension; the final snapshot must equal applying scd2Merge
    // twice in batch. Change sets use disjoint key classes so the
    // comparison is robust to file→batch assignment order.
    val root = Files.createTempDirectory("graft-cdc").toString
    val chDir = s"$root/changes"
    val dimRoot = s"$root/dim"
    val dim0 = Tables.customer(spark, sf)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        col("c_acctbal").as("bal"),
        lit(0).as("version"), lit(true).as("is_current"))
    dim0.write.parquet(s"$dimRoot/v_0")
    val chA = dim0.filter(col("k") % 10 === 0)
      .select(col("k"), col("seg"), (col("bal") + 100).as("bal"))
    val chB = dim0.filter(col("k") % 10 === 1)
      .select(col("k"), col("seg"), (col("bal") + 200).as("bal"))
      .unionByName(dim0.filter(col("k") % 10 === 2)
        .select((col("k") + 1000000L).as("k"), col("seg"), col("bal")))
    chA.coalesce(1).write.mode("append").parquet(chDir)
    chB.coalesce(1).write.mode("append").parquet(chDir)
    val src = spark.readStream.schema(chA.schema)
      .option("maxFilesPerTrigger", "1").parquet(chDir)
    val q = EventStreams.cdcApply(src, dimRoot)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // exactly-once trail: one snapshot per applied batch
    assert(new java.io.File(s"$dimRoot/v_2").exists(),
      "two microbatches must produce v_1 and v_2")
    val got = spark.read.parquet(s"$dimRoot/v_2")
      .orderBy("k", "version").collect().toSeq
    val want = EventStreams.scd2Merge(
        EventStreams.scd2Merge(dim0, chA), chB)
      .orderBy("k", "version").collect().toSeq
    assert(got == want, "streamed CDC dimension diverged from batch merges")
    // the merge actually did something: closed rows + new-key inserts
    val cur = spark.read.parquet(s"$dimRoot/v_2")
    assert(cur.filter(!col("is_current")).count() > 0)
    assert(cur.filter(col("k") >= 1000000L && col("version") === 0).count() > 0)
  }

  test("stateful aggregation runs on the RocksDB state store (spillable production backend)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch = EventStreams.tumblingHourly(
        Tables.events(spark, sf), withWatermarkCol = false)
        .orderBy("window_start", "event_type").collect().toSeq
      val stream = runStream(EventStreams.tumblingHourly(_, withWatermarkCol = false),
        "complete", "tumbling_rocksdb")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(stream == batch,
        "RocksDB-backed state must produce the same aggregation as batch")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("checkpointed restart resumes from committed offsets: state kept, nothing reprocessed") {
    val dataDir = Files.createTempDirectory("graft-ckpt-data").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val ev = Tables.events(spark, sf).cache()
    val first = ev.limit(200).cache()
    first.coalesce(1).write.mode("append").parquet(dataDir)
    def run(): Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = {
      val src = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(dataDir)
      val q = src.groupBy("event_type").agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("ckpt_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.toSeq
    }
    run()
    ev.exceptAll(first).coalesce(1).write.mode("append").parquet(dataDir)
    val progress2 = run()
    // the restarted query reads ONLY the new file (offsets committed)...
    val read2 = progress2.map(_.numInputRows).sum
    assert(read2 == ev.count() - 200,
      s"restart must not reprocess the first batch (read $read2 rows)")
    // ...yet the recovered state store still counts EVERYTHING
    val total = spark.table("ckpt_counts").agg(sum(col("n"))).head().getLong(0)
    assert(total == ev.count())
    first.unpersist(); ev.unpersist()
  }

  test("parquet file sink is exactly-once through a checkpointed restart: no duplicate, no missing windows") {
    // the sink users actually deploy: append-mode windowed counts into
    // a parquet directory, killed and restarted with more data. The
    // offsets in the checkpoint stop the restart from reprocessing old
    // files; the sink's _spark_metadata commit log makes file
    // visibility atomic. Together: every watermark-closed window lands
    // EXACTLY once across the two runs.
    val dataDir = Files.createTempDirectory("graft-fsink-data").toString
    val outDir = Files.createTempDirectory("graft-fsink-out").toString
    val ckpt = Files.createTempDirectory("graft-fsink-ckpt").toString
    val ev = Tables.events(spark, sf).orderBy("ts").cache()
    val n = ev.count()
    val half = (n / 2).toInt
    val first = ev.limit(half).cache()
    // two files in run 1 (watermark advances between batches, so run 1
    // emits something); one more file for run 2
    first.limit(half / 2).coalesce(1).write.mode("append").parquet(dataDir)
    first.exceptAll(first.limit(half / 2))
      .coalesce(1).write.mode("append").parquet(dataDir)
    def run(): org.apache.spark.sql.streaming.StreamingQueryProgress = {
      val src = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(dataDir)
      val q = EventStreams.tumblingHourly(src)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.lastProgress
    }
    run()
    val emitted1 = spark.read.parquet(outDir).count()
    assert(emitted1 > 0, "run 1 must commit at least one closed window")
    ev.exceptAll(first).coalesce(1).write.mode("append").parquet(dataDir)
    val progress2 = run()
    assert(new java.io.File(outDir, "_spark_metadata").exists,
      "file sink must write its commit log")
    val out = spark.read.parquet(outDir).cache()
    assert(out.count() > emitted1, "the restart must append newly closed windows")
    // exactly-once: no (window, type) key is ever emitted twice
    val dups = out.groupBy("window_start", "event_type")
      .count().filter(col("count") > 1).collect()
    assert(dups.isEmpty, s"duplicate windows across restart: ${dups.mkString(",")}")
    // no wrong rows: everything emitted matches the batch aggregate of
    // the COMPLETE input bit-for-bit
    val batch = EventStreams.tumblingHourly(ev, withWatermarkCol = false)
    assert(out.exceptAll(batch).isEmpty,
      "emitted rows must equal the batch aggregate for their windows")
    // no missing rows: every window the final watermark closed is there
    val wm = java.sql.Timestamp.from(java.time.Instant.parse(
      progress2.eventTime.get("watermark")))
    val missing = batch
      .filter(col("window_start") + expr("INTERVAL 1 HOUR") <= lit(wm))
      .exceptAll(out).collect()
    assert(missing.isEmpty,
      s"windows closed by watermark $wm never reached the sink: ${missing.take(5).mkString(",")}")
    out.unpersist(); first.unpersist(); ev.unpersist()
  }

  test("stream-static enrichment join ≡ batch join (dims broadcast per micro-batch)") {
    val dims = spark.createDataFrame(Seq(
      ("view", "browse"), ("click", "browse"), ("purchase", "convert"),
      ("signup", "convert"), ("logout", "other")))
      .toDF("event_type", "category")
    val batch = EventStreams.enriched(Tables.events(spark, sf), dims)
      .groupBy("category").count()
      .orderBy("category").collect().toSeq
    val stream = runStream(EventStreams.enriched(_, dims).groupBy("category").count(),
      "complete", "enriched_counts")
      .orderBy("category").collect().toSeq
    assert(stream == batch)
  }

  test("dropDuplicatesWithinWatermark dedups re-delivery inside the horizon with bounded state") {
    val dir = Files.createTempDirectory("graft-dedup-wm").toString
    val ev = Tables.events(spark, sf).limit(200).cache()
    ev.coalesce(1).write.mode("append").parquet(dir)
    ev.coalesce(1).write.mode("append").parquet(dir) // redelivery within horizon
    val src = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.dedupedWithinWatermark(src)
      .groupBy().agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("dedup_wm_n")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("dedup_wm_n").collect()(0).getLong(0) == 200)
    ev.unpersist()
  }
}
