package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import EventsStreaming.{Ev, SessionOut}

/** Structured Streaming behavior with a controllable source: watermarked
  * windowed aggregation in append mode, and stateful sessionization via
  * flatMapGroupsWithState with event-time timeout.
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("watermarked window aggregation emits closed windows in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val agg = source.toDS()
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_windows")
      .outputMode("append").start()
    try {
      // Two events in window [0,10) and one in [10,20).
      source.addData(Ev(1, ts(1), 1.0), Ev(1, ts(2), 2.0), Ev(1, ts(11), 3.0))
      q.processAllAvailable()
      // Watermark is still behind: nothing final yet.
      assert(spark.table("wm_windows").count() == 0)
      // An event far in the future pushes the watermark past both windows.
      source.addData(Ev(2, ts(60), 0.0))
      q.processAllAvailable()
      val rows = spark.table("wm_windows")
        .select(unix_timestamp(col("window.start")).as("w"), col("user_id"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((0L, 1L, 2L), (600L, 1L, 1L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val sessions = EventsStreaming.sessionize(source.toDS(), gapSecs = 600)
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // User 1: two events 5 min apart (one session, 300s long).
      // User 2: one event.
      source.addData(Ev(1, ts(10), 1.0), Ev(1, ts(15), 2.0), Ev(2, ts(12), 5.0))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0)
      // Advance the watermark far past both sessions' gap windows.
      source.addData(Ev(3, ts(120), 0.0))
      q.processAllAvailable()
      val out = spark.table("sessions_out").as[SessionOut].collect()
        .map(s => (s.user_id, s.n_events, s.duration_secs, s.sum_value)).toSet
      assert(out == Set((1L, 2L, 300L, 3.0), (2L, 1L, 0L, 5.0)))
    } finally q.stop()
  }

  test("sessionization splits multiple sessions arriving in one micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val sessions = EventsStreaming.sessionize(source.toDS(), gapSecs = 600)
    val q = sessions.writeStream.format("memory").queryName("burst_sessions")
      .outputMode("append").start()
    try {
      // One batch carries user 1's events spanning TWO sessions (gap 10
      // min; 10-15 and 40-41 are 25 min apart) — the first must close and
      // be emitted from within the batch, not merged. (Timeline starts at
      // minute 10: an epoch-0 event ties the initial watermark and is
      // dropped by the late-row filter.)
      source.addData(Ev(1, ts(10), 1.0), Ev(1, ts(15), 2.0),
        Ev(1, ts(40), 4.0), Ev(1, ts(41), 8.0))
      q.processAllAvailable()
      val early = spark.table("burst_sessions").as[SessionOut].collect()
        .map(s => (s.user_id, s.n_events, s.duration_secs, s.sum_value)).toSet
      assert(early == Set((1L, 2L, 300L, 3.0)), s"got $early")
      // Watermark push closes the trailing open session too.
      source.addData(Ev(2, ts(120), 0.0))
      q.processAllAvailable()
      val all = spark.table("burst_sessions").as[SessionOut].collect()
        .map(s => (s.user_id, s.n_events, s.duration_secs, s.sum_value)).toSet
      assert(all == Set((1L, 2L, 300L, 3.0), (1L, 2L, 60L, 12.0)), s"got $all")
    } finally q.stop()
  }

  test("sessionization extends BACKWARDS for a cross-batch within-watermark late event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val sessions = EventsStreaming.sessionize(source.toDS(), gapSecs = 600)
    val q = sessions.writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      // Batch 1: user 1 at minutes 20 and 21 (watermark -> minute 11).
      source.addData(Ev(1, ts(20), 1.0), Ev(1, ts(21), 2.0))
      q.processAllAvailable()
      // Batch 2: a LATE event at minute 16 — inside the 10-min watermark
      // (flatMapGroupsWithState does not drop late rows) and within the
      // gap of the open session. The session must extend backwards:
      // start=16, not 20.
      source.addData(Ev(1, ts(16), 4.0))
      q.processAllAvailable()
      source.addData(Ev(2, ts(120), 0.0)) // close user 1 via watermark
      q.processAllAvailable()              // (user 2's own session stays open)
      val out = spark.table("late_sessions").as[SessionOut].collect()
        .map(s => (s.user_id, s.n_events, s.duration_secs, s.sum_value)).toSet
      assert(out == Set((1L, 3L, 300L, 7.0)), s"got $out")
    } finally q.stop()
  }

  test("a late event more than a gap BEFORE the open session's start becomes its own session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val sessions = EventsStreaming.sessionize(source.toDS(), gapSecs = 120)
    val q = sessions.writeStream.format("memory").queryName("backsplit_sessions")
      .outputMode("append").start()
    try {
      // Batch 1: user 1 session [30,31] (watermark -> 21). Batch 2: a
      // within-watermark late event at minute 25 — more than the 2-min gap
      // BEFORE the session's start. Gap semantics place it in a separate
      // session; merging would stretch [30,31] back across a gap.
      source.addData(Ev(1, ts(30), 1.0), Ev(1, ts(31), 2.0))
      q.processAllAvailable()
      source.addData(Ev(1, ts(25), 4.0))
      q.processAllAvailable()
      // Advance the watermark so the open [30,31] session times out.
      source.addData(Ev(2, ts(60), 0.0))
      q.processAllAvailable()
      source.addData(Ev(2, ts(70), 0.0))
      q.processAllAvailable()
      val out = spark.table("backsplit_sessions").as[SessionOut].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.n_events, s.duration_secs, s.sum_value)).toSet
      assert(out == Set((1L, 0L, 4.0), (2L, 60L, 3.0)), s"got $out")
    } finally q.stop()
  }

  test("late merge into a watermark-passed session clamps the timeout instead of crashing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The race this pins: in continuous operation a late event can land in
    // the batch right AFTER another key jumped the watermark past the open
    // session's lastMs+gap (the late-event filter uses the PREVIOUS
    // batch's watermark, eviction uses the current one). With no-data
    // micro-batches enabled, processAllAvailable interposes an eviction
    // batch that fires the timeout first and hides the race — disable
    // them for this query to make the adjacency deterministic.
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prior = spark.conf.get(noDataKey)
    spark.conf.set(noDataKey, "false")
    val source = MemoryStream[Ev]
    val sessions = EventsStreaming.sessionize(source.toDS(), gapSecs = 600)
    val q = sessions.writeStream.format("memory").queryName("clamp_sessions")
      .outputMode("append").start()
    try {
      // Batch 1: user 1 session [20,21] (timeout armed for minute 31).
      source.addData(Ev(1, ts(20), 1.0), Ev(1, ts(21), 2.0))
      q.processAllAvailable()
      // Batch 2: user 2 at minute 60 — the NEXT batch's eviction watermark
      // becomes 50, past user 1's timeout, but no eviction batch runs.
      source.addData(Ev(2, ts(60), 0.0))
      q.processAllAvailable()
      // Batch 3: user 1's late event at 16 passes the late filter (batch
      // 2's 11-minute watermark) and merges backwards — lastMs+gap (31) is
      // below the current watermark (50); an unclamped setTimeoutTimestamp
      // throws IllegalArgumentException and kills the whole query.
      source.addData(Ev(1, ts(16), 4.0))
      q.processAllAvailable() // would throw here without the clamp
      // The clamped timeout (watermark+1ms) fires on later advances.
      source.addData(Ev(2, ts(70), 0.0))
      q.processAllAvailable()
      source.addData(Ev(2, ts(80), 0.0))
      q.processAllAvailable()
      val out = spark.table("clamp_sessions").as[SessionOut].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.n_events, s.duration_secs, s.sum_value)).toSet
      assert(out == Set((3L, 300L, 7.0)), s"got $out")
    } finally { q.stop(); spark.conf.set(noDataKey, prior) }
  }

  test("file-source hourly stream matches the batch aggregation") {
    val streamed = EventsStreaming.hourlyCounts(spark, SparkTestSession.sfDir)
      .collect().toSeq
    val batch = graft.Engine.events(spark, SparkTestSession.sfDir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .orderBy("hour_epoch", "event_type")
      .collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming session_window matches the batch session aggregation") {
    val streamed = EventsStreaming.sessionWindows(spark, SparkTestSession.sfDir)
      .collect().toSeq
    val batch = graft.Engine.events(spark, SparkTestSession.sfDir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start_epoch"),
        col("n_events"))
      .orderBy("user_id", "session_start_epoch")
      .collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("foreachBatch sink lands micro-batches in parquet, replay-exact") {
    // The production sink pattern: arbitrary writers (upserts, multi-table
    // fan-out, JDBC) run per micro-batch with the batch id for idempotence.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = graft.operators.Scratch.freshDir(spark, "fb_sink")
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .schema(EventsStreaming.rawSchema(spark, SparkTestSession.sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(SparkTestSession.sfDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        seen.incrementAndGet()
        batch.write.mode("append").parquet(s"$out/batch_$batchId")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    assert(seen.get() >= 1)
    val landed = spark.read.parquet(s"$out/batch_*").count()
    val source = graft.Engine.events(spark, SparkTestSession.sfDir).count()
    assert(landed == source)
  }

  test("streaming dedup: kept set is batch-boundary invariant and drops planted dups") {
    import spark.implicits._
    // Archive doc 1000 + increment: 10 is an exact copy of archive text,
    // 11/12 are near-copies of each other (greedy keeps 11), 13 unique.
    val body = (1 to 60).map(i => s"tok$i").mkString(" ")
    val other = (1 to 60).map(i => s"alt$i").mkString(" ")
    val archive = Seq((1000L, body)).toDF("doc_id", "text")
    val inc = Seq(
      (10L, body),                                  // exact dup of archive
      (11L, other),                                 // kept (first of pair)
      (12L, other + " tail"),                       // near-dup of 11
      (13L, (1 to 60).map(i => s"uniq$i").mkString(" "))) // kept
      .toDF("doc_id", "text")
    def run(nBatches: Int, bound: Int => (Long, Long)): Set[Long] = {
      val (staging, schema) =
        graft.streaming.StreamingDedup.stageBatches(inc, nBatches, bound)
      graft.streaming.StreamingDedup
        .runFileStream(spark, staging, schema, archive, threshold = 0.8)
        .collect().map(_.getLong(0)).toSet
    }
    val fourBatches = run(4, i => (10L + i, 11L + i))
    assert(fourBatches == Set(11L, 13L), s"got $fourBatches")
    // Seen-based indexing makes the result independent of batching.
    val oneBatch = run(1, _ => (0L, 1000L))
    assert(oneBatch == fourBatches)
  }

  test("streaming dedup standing index: probe scan is partition-pruned, not a full scan") {
    import spark.implicits._
    // Archive big enough that its band table spans every bucket; the
    // probe batch is ONE document, so its band keys touch few buckets.
    val archive = (1000L until 1400L).map(i =>
      (i, (1 to 40).map(j => s"a${i}w$j").mkString(" "))).toDF("doc_id", "text")
    val sess = graft.streaming.StreamingDedup.open(spark, archive,
      threshold = 0.8, buckets = 64, compactEvery = 0)
    val batch = Seq((1L, (1 to 40).map(j => s"probe$j").mkString(" ")))
      .toDF("doc_id", "text")
    val touched = sess.bandTouched(batch)
    // One doc = 32 band keys -> at most 32 of 64 buckets.
    assert(touched.nonEmpty && touched.size <= 32, s"touched=$touched")
    val probe = sess.prunedBandScan(touched)
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in probe plan:\n" +
      probe.queryExecution.executedPlan))
    // The pruning must happen at the SCAN (partition filters), not as a
    // post-scan filter over a full read.
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filters:\n${probe.queryExecution.executedPlan}")
    val filesRead = scan.metrics("numFiles").value
    val filesTotal = sess.bandFiles.size
    assert(filesRead > 0 && filesRead <= touched.size,
      s"read $filesRead files for ${touched.size} buckets")
    assert(filesRead < filesTotal,
      s"probe read all $filesTotal standing files — no pruning")
  }

  test("streaming dedup compaction preserves the kept set and collapses small files") {
    import spark.implicits._
    val body = (1 to 60).map(i => s"tok$i").mkString(" ")
    val other = (1 to 60).map(i => s"alt$i").mkString(" ")
    val archive = Seq((1000L, body)).toDF("doc_id", "text")
    val inc = Seq(
      (10L, body), (11L, other), (12L, other + " tail"),
      (13L, (1 to 60).map(i => s"uniq$i").mkString(" ")))
      .toDF("doc_id", "text")
    // compactEvery=2: the 4-batch run compacts twice mid-stream; the kept
    // set must match the uncompacted spec-pinned result.
    val sess = graft.streaming.StreamingDedup.open(spark, archive,
      threshold = 0.8, buckets = 16, compactEvery = 2)
    (0 until 4).foreach { i =>
      sess.processBatch(inc.filter(col("doc_id") === (10L + i)), i.toLong)
    }
    assert(sess.kept().collect().map(_.getLong(0)).toSet == Set(11L, 13L))
    // batch 4 auto-compacted: the standing band table is one file per
    // touched bucket; a further batch appends new small files on top,
    // and an explicit compact collapses them again.
    val afterAuto = sess.bandFiles.size
    assert(afterAuto <= 16, s"post-auto-compact files=$afterAuto")
    val batch5 = Seq((20L, body)).toDF("doc_id", "text")
    sess.processBatch(batch5, 5L) // exact dup: dropped but still indexed
    val afterAppend = sess.bandFiles.size
    assert(afterAppend > afterAuto, s"append did not add files ($afterAppend)")
    sess.compact()
    assert(sess.bandFiles.size < afterAppend)
    // the standing index still answers probes after the swap
    assert(sess.kept().collect().map(_.getLong(0)).toSet == Set(11L, 13L))
  }

  test("stream-static enrichment broadcasts the dimension in every micro-batch") {
    val q = EventsStreaming.enrichedAgg(spark, SparkTestSession.sfDir)
      .writeStream.format("memory").queryName("enriched_plan_probe")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      val plan = org.apache.spark.sql.graft.StreamingBridge.lastExecutedPlan(q)
        .map(_.toString).getOrElse(fail("no micro-batch executed"))
      // The static customer dimension must come in via broadcast — a
      // shuffled join here re-shuffles the STREAM side every micro-batch.
      assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
    } finally q.stop()
    assert(spark.table("enriched_plan_probe").count() > 0)
  }

  test("streaming dedup of a doubled stream matches the batch per-type aggregate") {
    val streamed = EventsStreaming.dedupCounts(spark, SparkTestSession.sfDir)
      .collect().toSeq
    val batch = graft.Engine.events(spark, SparkTestSession.sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .orderBy("event_type")
      .collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream attribution join matches the batch self-join") {
    val streamed = EventsStreaming.clickAttribution(spark, SparkTestSession.sfDir)
      .collect().toSeq
    val ev = graft.Engine.events(spark, SparkTestSession.sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("event_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("cts"))
    val batch = p.join(c, col("c_user") === col("user_id") &&
        col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES") &&
        col("cts") <= col("pts"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("event_id")).as("n_purchases"))
      .orderBy("user_id")
      .collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream join runs as a symmetric hash join with watermark state") {
    val q = EventsStreaming.attributionJoin(spark, SparkTestSession.sfDir)
      .writeStream.format("memory").queryName("attrib_plan_probe")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      val plan = org.apache.spark.sql.graft.StreamingBridge.lastExecutedPlan(q)
        .map(_.toString).getOrElse(fail("no micro-batch executed"))
      // Both sides are streams: the join must be the stateful symmetric
      // hash join (watermark-bounded buffers), not a batch join operator.
      assert(plan.contains("StreamingSymmetricHashJoin"),
        s"expected a streaming symmetric hash join in:\n$plan")
    } finally q.stop()
  }

  test("autoStateParts sizes state stores to state volume, not core count") {
    assert(EventsStreaming.autoStateParts(-1L) == 8)   // no estimate: tuned default
    assert(EventsStreaming.autoStateParts(0L) == 1)
    assert(EventsStreaming.autoStateParts(16384L) == 1)
    assert(EventsStreaming.autoStateParts(16385L) == 2)
    assert(EventsStreaming.autoStateParts(100000L) == 8)  // the sf0.1 dedup regime
    assert(EventsStreaming.autoStateParts(10000000L) == 64) // local clamp
  }

  test("streamStateParts=auto produces the same results as the tuned default") {
    val prior = spark.conf.getOption("spark.graft.streamStateParts")
    try {
      spark.conf.set("spark.graft.streamStateParts", "auto")
      val auto = EventsStreaming.hourlyCounts(spark, SparkTestSession.sfDir)
        .collect().toSeq
      spark.conf.set("spark.graft.streamStateParts", "8")
      val tuned = EventsStreaming.hourlyCounts(spark, SparkTestSession.sfDir)
        .collect().toSeq
      assert(auto == tuned && auto.nonEmpty)
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.graft.streamStateParts", v)
        case None => spark.conf.unset("spark.graft.streamStateParts")
      }
    }
  }
}
