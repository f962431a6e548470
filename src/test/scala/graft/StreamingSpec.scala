package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  val dir = TestSpark.sfDir

  /** Stage synthetic events in the CURRENT fixture dtype: `ts` =
    * TIMESTAMP_NTZ micros (the post-refresh /root/testdata shape;
    * under the UTC test session the NTZ wall clock equals the epoch).
    * Rows carry (event_id, epochMicros, user_id, event_type). One
    * suite member below stages nanos-long instead — the pre-refresh
    * dtype — to keep the adaptive source's legacy path covered. */
  /** Epoch-micros Column over a RAW fixture frame, branching on the
    * on-disk ts dtype exactly like the adaptive loaders — nanos-long
    * fixtures must integer-truncate (casting a raw nanos long to
    * timestamp would read it as epoch SECONDS and overflow). */
  private def rawTsUs(df: org.apache.spark.sql.DataFrame) =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts DIV 1000")
      case _ => expr("unix_micros(cast(ts AS timestamp))")
    }

  private def stageMicros(dst: java.nio.file.Path, tag: String,
                          rows: Seq[(Long, Long, Long, String)]): Unit = {
    rows.map { case (id, us, u, tpe) => (id, us, u, tpe, 0.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(dst.resolve(tag).toString)
  }

  test("streaming hourly agg over events matches the batch result") {
    // file-stream sources need a directory; stage the single parquet file
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = EventStreams.eventsStream(spark, streamDir.toString)
    val q = EventStreams.hourlyAgg(stream)
      .writeStream.outputMode("append").format("memory").queryName("hourly").start()
    try {
      q.processAllAvailable()
      // append mode only emits windows the watermark has passed; the last
      // window(s) stay open, so compare on the emitted prefix.
      val got = spark.table("hourly")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hr"),
          col("event_type"), col("cnt"), col("val"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = graft.queries.Tables.events(spark, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hr"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("val"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got.nonEmpty)
      assert(got.subsetOf(batch))
    } finally q.stop()
  }

  test("checkpointed agg survives a stop/restart: state resumes, committed files never re-read") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-restart-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-ckpt")
    val acc = new java.util.concurrent.atomic.AtomicReference[Map[String, Long]](Map.empty)
    def start() = EventStreams.eventsStream(spark, streamDir.toString)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        acc.set(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      }
      .start()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), streamDir.resolve("a.parquet"))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    val c1 = acc.get()
    assert(c1.values.sum === graft.queries.Tables.events(spark, dir).count())
    // DELETE the committed file, then restart from the checkpoint with
    // a replay staged as a new file. The only way the totals can come
    // out exactly doubled is state recovery: file a is gone from disk,
    // so its half must come from the restored state store, and the
    // file-source log must skip (not fail on) the vanished file.
    java.nio.file.Files.delete(streamDir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), streamDir.resolve("b.parquet"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(acc.get() === c1.map { case (k, v) => k -> v * 2 },
        "restarted agg must resume from checkpointed state and process only the new file")
    } finally q2.stop()
  }

  test("idempotent batchId-keyed sink absorbs a forced micro-batch replay " +
       "(and the replay provably re-executed)") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-e1o-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-e1o-ckpt")
    val out = java.nio.file.Files.createTempDirectory("graft-e1o-out")
    // two files -> two micro-batches under maxFilesPerTrigger = 1
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), streamDir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), streamDir.resolve("b.parquet"))
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(): Unit = {
      val q = EventStreams
        .eventsStream(spark, streamDir.toString, maxFilesPerTrigger = Some(1))
        .select(col("event_id"), col("event_type"))
        .writeStream.option("checkpointLocation", ckpt.toString)
        .foreachBatch(EventStreams.idempotentBatchWrite(out.toString, Some(calls)))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val firstCalls = calls.get()
    assert(firstCalls >= 2, s"expected >=2 micro-batches, saw $firstCalls")
    val total = spark.read.parquet(out.toString).count()
    // destroy the newest commit record -> restart MUST re-execute that
    // batch (same batchId); the idempotent overwrite absorbs it
    EventStreams.forceReplayOfLastBatch(ckpt.toString)
    run()
    assert(calls.get() > firstCalls,
      "the forced replay did not re-invoke the sink — nothing was proven")
    assert(spark.read.parquet(out.toString).count() === total,
      "replayed batch duplicated rows: the batchId-keyed overwrite is not idempotent")
    // negative control: an APPEND sink under the same replay would
    // have written the replayed batch twice — demonstrate on a copy
    val out2 = java.nio.file.Files.createTempDirectory("graft-e1o-append")
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-e1o-ckpt2")
    def runAppend(): Unit = {
      val q = EventStreams
        .eventsStream(spark, streamDir.toString, maxFilesPerTrigger = Some(1))
        .select(col("event_id"), col("event_type"))
        .writeStream.option("checkpointLocation", ckpt2.toString)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out2.toString)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runAppend()
    val appendTotal = spark.read.parquet(out2.toString).count()
    EventStreams.forceReplayOfLastBatch(ckpt2.toString)
    runAppend()
    assert(spark.read.parquet(out2.toString).count() > appendTotal,
      "control failed: the append sink should have duplicated the replayed batch")
  }

  test("streaming dedup drops a replayed file's duplicate event_ids") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-dedup-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("a.parquet"))
    val q = EventStreams.dedupStream(EventStreams.eventsStream(spark, streamDir.toString))
      .select("event_id")
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()
    try {
      q.processAllAvailable()
      val n1 = spark.table("dedup").count()
      // replay the same file: every event_id is a duplicate
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        streamDir.resolve("b.parquet"))
      q.processAllAvailable()
      val n2 = spark.table("dedup").count()
      assert(n1 === graft.queries.Tables.events(spark, dir).count())
      assert(n2 === n1, "replayed events must be deduplicated")
    } finally q.stop()
  }

  test("event-time timeout emits final sessions once the watermark passes") {
    import org.apache.spark.sql.functions._
    val streamDir = java.nio.file.Files.createTempDirectory("graft-timeout-stream")
    // re-write fixture rows verbatim (ts stays in the fixture's own
    // dtype, so the staged files look exactly like /root/testdata)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // file1: even users (full time range); file2: odd users — even users
    // get no further events, so their final sessions can ONLY surface
    // via the event-time timeout fired as file2 advances the watermark
    raw.where(col("user_id") % 2 === 0).coalesce(1).write
      .parquet(streamDir.resolve("f1").toString)
    val q = EventStreams.sessionize(
      EventStreams.eventsStream(spark, streamDir.toString + "/*")
        .as[EventStreams.Event](org.apache.spark.sql.Encoders.product[EventStreams.Event]))
      .writeStream.outputMode("append").format("memory").queryName("touts").start()
    try {
      q.processAllAvailable()
      val afterF1 = spark.table("touts").where(col("user_id") % 2 === 0).count()
      raw.where(col("user_id") % 2 === 1).coalesce(1).write
        .parquet(streamDir.resolve("f2").toString)
      q.processAllAvailable()
      // one more empty-ish batch so timeouts scheduled in the previous
      // batch fire against the advanced watermark
      raw.where(col("user_id") === -1).coalesce(1).write
        .parquet(streamDir.resolve("f3").toString)
      q.processAllAvailable()
      val afterF3 = spark.table("touts").where(col("user_id") % 2 === 0).count()
      assert(afterF3 > afterF1,
        s"even users' final sessions must be timeout-emitted ($afterF1 -> $afterF3)")
    } finally q.stop()
  }

  test("a cross-batch late event parks in the tail; the open session is NOT split") {
    import org.apache.spark.sql.functions._
    val dir2 = java.nio.file.Files.createTempDirectory("graft-late")
    def write(name: String, rows: Seq[(Long, String, Long, String, Double, String)]): Unit = {
      import spark.implicits._
      rows.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
        .withColumn("ts", to_timestamp(col("tss")).cast("timestamp_ntz")).drop("tss")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(dir2.resolve(name).toString)
    }
    // batch1: user 1 open session at 10:00
    write("b1", Seq((1L, "2024-01-01 10:00:00", 1L, "view", 1.0, "{}")))
    val q = EventStreams.sessionize(
      EventStreams.eventsStream(spark, dir2.toString + "/*")
        .as[EventStreams.Event](org.apache.spark.sql.Encoders.product[EventStreams.Event]))
      .writeStream.outputMode("append").format("memory").queryName("late").start()
    try {
      q.processAllAvailable()
      // batch2: LATE 08:30 (outside envelope, above watermark) + 10:05 continuation
      write("b2", Seq((2L, "2024-01-01 08:30:00", 1L, "view", 1.0, "{}"),
        (3L, "2024-01-01 10:05:00", 1L, "view", 1.0, "{}")))
      q.processAllAvailable()
      // batch3: far-future event (other user) advances watermark, flushing user 1
      write("b3", Seq((4L, "2024-01-02 12:00:00", 2L, "view", 1.0, "{}")))
      q.processAllAvailable()
      write("b4", Seq((5L, "2024-01-03 12:00:00", 2L, "view", 1.0, "{}")))
      q.processAllAvailable()
      val u1 = spark.table("late").where(col("user_id") === 1)
        .select(date_format(col("session_start"), "HH:mm").as("s"),
          date_format(col("session_end"), "HH:mm").as("e"), col("n_events"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // exactly TWO sessions: the parked late one and the intact 10:00-10:05
      assert(u1 === Set(("08:30", "08:30", 1L), ("10:00", "10:05", 2L)),
        s"got $u1 — the open session must not be split by the late event")
    } finally q.stop()
  }

  test("late events bridging two parked sessions coalesce into one") {
    import org.apache.spark.sql.functions._
    val dir3 = java.nio.file.Files.createTempDirectory("graft-bridge")
    def write(name: String, rows: Seq[(Long, String, Long, String, Double, String)]): Unit = {
      import spark.implicits._
      rows.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
        .withColumn("ts", to_timestamp(col("tss")).cast("timestamp_ntz")).drop("tss")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(dir3.resolve(name).toString)
    }
    // b1: open head at 10:00; b2: two LATE events parked as separate tail
    // sessions (60 min apart); b3: a LATE bridge at 08:40 touches both
    // envelopes (30 min = gap, inclusive) — batch semantics says all
    // three are ONE session 08:10-09:10
    write("b1", Seq((1L, "2024-01-01 10:00:00", 1L, "view", 1.0, "{}")))
    val q = EventStreams.sessionize(
      EventStreams.eventsStream(spark, dir3.toString + "/*")
        .as[EventStreams.Event](org.apache.spark.sql.Encoders.product[EventStreams.Event]))
      .writeStream.outputMode("append").format("memory").queryName("bridge").start()
    try {
      q.processAllAvailable()
      write("b2", Seq((2L, "2024-01-01 08:10:00", 1L, "view", 1.0, "{}"),
        (3L, "2024-01-01 09:10:00", 1L, "view", 1.0, "{}")))
      q.processAllAvailable()
      write("b3", Seq((4L, "2024-01-01 08:40:00", 1L, "view", 1.0, "{}")))
      q.processAllAvailable()
      // advance the watermark so user 1's sessions flush
      write("b4", Seq((5L, "2024-01-02 12:00:00", 2L, "view", 1.0, "{}")))
      q.processAllAvailable()
      write("b5", Seq((6L, "2024-01-03 12:00:00", 2L, "view", 1.0, "{}")))
      q.processAllAvailable()
      val u1 = spark.table("bridge").where(col("user_id") === 1)
        .select(date_format(col("session_start"), "HH:mm").as("s"),
          date_format(col("session_end"), "HH:mm").as("e"), col("n_events"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(u1 === Set(("08:10", "09:10", 3L), ("10:00", "10:00", 1L)),
        s"got $u1 — bridged tail sessions must merge into one")
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions with sane bounds") {
    import EventStreams.Event
    val events = graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    // batch-mode flatMapGroupsWithState: single batch == all groups seen once
    val sessions = EventStreams.sessionize(events).collect()
    assert(sessions.nonEmpty)
    sessions.foreach { s =>
      assert(s.session_end.getTime >= s.session_start.getTime)
      assert(s.n_events >= 1)
    }
    // sessions per user ≈ batch windowed query minus the final open session
    val batchSessions = SparkEntry.queries("q_events_sessionize")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap
    val streamed = sessions.groupBy(_.user_id).view.mapValues(_.length.toLong).toMap
    streamed.foreach { case (u, n) =>
      assert(n <= batchSessions(u) && n >= batchSessions(u) - 1,
        s"user $u: streamed-closed $n vs batch ${batchSessions(u)}")
    }
  }

  test("stream-stream interval join matches across batches; beyond-gap clicks don't pair") {
    // deliberately staged as raw NANOS-LONG ts — the pre-refresh
    // fixture dtype — so the adaptive source's legacy branch stays
    // exercised (every other suite member stages micros NTZ)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-join-stream")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = 1700000000L * 1000000000L // raw nanos
    def stage(tag: String, rows: Seq[(Long, Long, Long, String)]): Unit =
      rows.map { case (id, ns, u, tpe) => (id, ns, u, tpe, 0.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(streamDir.resolve(tag).toString)
    // batch 1: one view for users 1 and 2
    stage("b1", Seq((100L, base, 1L, "view"), (200L, base, 2L, "view")))
    val views = EventStreams.eventsStream(spark, streamDir.toString + "/*")
      .where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
    val clicks = EventStreams.eventsStream(spark, streamDir.toString + "/*")
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("cts"))
    val q = EventStreams.intervalJoin(views, clicks, "user_id", "c_user", "vts", "cts")
      .select(col("view_id"), col("click_id"))
      .writeStream.outputMode("append").format("memory").queryName("ivjoin").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ivjoin").count() === 0) // no clicks yet
      // batch 2: user 1 clicks 10 min after the view (pairs — the
      // buffered batch-1 view is still in join state); user 2 clicks
      // 45 min after (beyond the 30-min gap: must NOT pair)
      stage("b2", Seq((101L, base + 600L * 1000000000L, 1L, "click"),
        (201L, base + 2700L * 1000000000L, 2L, "click")))
      q.processAllAvailable()
      val pairs = spark.table("ivjoin").collect()
        .map(r => (r.getAs[Long]("view_id"), r.getAs[Long]("click_id"))).toSet
      assert(pairs === Set((100L, 101L)))
    } finally q.stop()
  }

  test("left-outer interval join null-pads unmatched views once the watermark passes") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-join-outer")
    val base = 1700000000L * 1000000L // epoch micros
    def stage(tag: String, rows: Seq[(Long, Long, Long, String)]): Unit =
      stageMicros(streamDir, tag, rows)
    // user 1: view that will NEVER match; user 2: view that will
    stage("b1", Seq((100L, base, 1L, "view"), (200L, base, 2L, "view")))
    val views = EventStreams.eventsStream(spark, streamDir.toString + "/*")
      .where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
    val clicks = EventStreams.eventsStream(spark, streamDir.toString + "/*")
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("cts"))
    val q = EventStreams.intervalJoin(views, clicks, "user_id", "c_user", "vts", "cts",
        joinType = "left_outer")
      .select(col("view_id"), col("click_id"))
      .writeStream.outputMode("append").format("memory").queryName("ivouter").start()
    try {
      q.processAllAvailable()
      // user 2 clicks 10 min after the view: pairs and emits immediately
      stage("b2", Seq((201L, base + 600L * 1000000L, 2L, "click")))
      q.processAllAvailable()
      val afterB2 = spark.table("ivouter").collect()
        .map(r => r.getAs[Long]("view_id") -> Option(r.getAs[Any]("click_id"))).toMap
      assert(afterB2 === Map(200L -> Some(201L)),
        s"got $afterB2 — user 1's view must NOT null-pad before the watermark proves no match")
      // far-future view+click (user 99) push BOTH sides' watermarks past
      // user 1's interval end + 2h delay; the eviction no-data batch then
      // releases the unmatched view null-padded
      val far = base + 4L * 3600L * 1000000L
      stage("b3", Seq((900L, far, 99L, "view"), (901L, far, 99L, "click")))
      q.processAllAvailable()
      val got = spark.table("ivouter").collect()
        .map(r => r.getAs[Long]("view_id") -> Option(r.getAs[Any]("click_id"))).toMap
      assert(got === Map(100L -> None, 200L -> Some(201L), 900L -> Some(901L)),
        s"got $got — the unmatched view must surface null-padded after eviction")
    } finally q.stop()
  }

  test("streaming SCD-2 folds across micro-batches and matches the batch build") {
    // the gate (q_stream_scd2) delivers all events in ONE batch; this
    // test splits them at the median timestamp so intervals spanning
    // the batch boundary must continue through the carried open-state
    // — the incremental-fold path the gate alone doesn't exercise
    import org.apache.spark.sql.functions._
    val streamDir = java.nio.file.Files.createTempDirectory("graft-scd2-stream")
    // fixture rows re-written verbatim (ts keeps the fixture dtype);
    // the split point is computed on dtype-adaptive epoch micros
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val tsUs = rawTsUs(raw)
    val mid = raw.agg(percentile_approx(tsUs, lit(0.5), lit(1000)))
      .head().getLong(0)
    raw.where(tsUs <= mid).coalesce(1).write.parquet(streamDir.resolve("f1").toString)
    val q = EventStreams.scd2(
      EventStreams.eventsStream(spark, streamDir.toString + "/*")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStreams.Event](org.apache.spark.sql.Encoders.product[EventStreams.Event]))
      .toDF()
      .writeStream.outputMode("append").format("memory").queryName("scd2x").start()
    try {
      q.processAllAvailable()
      raw.where(tsUs > mid).coalesce(1).write.parquet(streamDir.resolve("f2").toString)
      q.processAllAvailable()
      // far-future sentinel advances the watermark so every user's
      // final interval is timeout-emitted
      // TWO sentinel batches (same as the gate's s1/s2): the first
      // advances the watermark at its END, the second lets the
      // now-expired timeouts actually fire
      val maxMicros = raw.agg(max(tsUs)).head().getLong(0)
      def sentinel(tag: String, plusDays: Long): Unit =
        stageMicros(streamDir, tag,
          Seq((-1L, maxMicros + plusDays * 86400L * 1000000L, -1L, "view")))
      sentinel("f3", 30); q.processAllAvailable()
      sentinel("f4", 60); q.processAllAvailable()
      val got = spark.table("scd2x").where(col("user_id").between(0L, 50L))
        .select("user_id", "ver", "event_type", "valid_from", "valid_to", "n_events")
        .collect().map(_.toSeq).toSet
      val expected = SparkEntry.queries("q_events_scd2")(spark, dir)
        .collect().map(_.toSeq).toSet
      assert(got === expected,
        s"streaming fold diverged from batch: ${got.size} vs ${expected.size} rows; " +
          s"extra=${(got -- expected).toSeq.sortBy(_.head.toString.toLong).take(6)} " +
          s"missing=${(expected -- got).toSeq.sortBy(_.head.toString.toLong).take(6)}")
    } finally q.stop()
  }

  test("streaming as-of enrich folds across micro-batches and matches the batch join") {
    // the gate (q_stream_asof) delivers all events in ONE batch; this
    // test splits them at the median timestamp so purchases arriving in
    // batch 1 must enrich left rows arriving in batch 2 through the
    // carried state (including the dominated-purchase pruning path)
    import org.apache.spark.sql.functions._
    val streamDir = java.nio.file.Files.createTempDirectory("graft-asof-stream")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val tsUs = rawTsUs(raw)
    val mid = raw.agg(percentile_approx(tsUs, lit(0.5), lit(1000)))
      .head().getLong(0)
    raw.where(tsUs <= mid).coalesce(1).write.parquet(streamDir.resolve("f1").toString)
    val q = EventStreams.asofEnrich(
      EventStreams.eventsStream(spark, streamDir.toString + "/*")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStreams.Event](org.apache.spark.sql.Encoders.product[EventStreams.Event]))
      .toDF()
      .writeStream.outputMode("append").format("memory").queryName("asofx").start()
    try {
      q.processAllAvailable()
      raw.where(tsUs > mid).coalesce(1).write.parquet(streamDir.resolve("f2").toString)
      q.processAllAvailable()
      val maxMicros = raw.agg(max(tsUs)).head().getLong(0)
      def sentinel(tag: String, plusDays: Long): Unit =
        stageMicros(streamDir, tag,
          Seq((-1L, maxMicros + plusDays * 86400L * 1000000L, -1L, "view")))
      sentinel("f3", 10); q.processAllAvailable()
      sentinel("f4", 20); q.processAllAvailable()
      val got = spark.table("asofx").where(col("user_id") >= 0)
        .select("event_id", "user_id", "purchase_id", "gap_sec")
        .collect().map(_.toSeq).toSet
      val expected = SparkEntry.queries("q_asof_join")(spark, dir)
        .select("event_id", "user_id", "purchase_id", "gap_sec")
        .collect().map(_.toSeq).toSet
      assert(got === expected,
        s"streaming as-of diverged from batch: ${got.size} vs ${expected.size} rows; " +
          s"extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
    } finally q.stop()
  }

  test("scd2 dormant-entity restart continues ver via the tombstone (detectable)") {
    // contract under test (EventStreams.scd2 scaladoc): an entity silent
    // past the finalization horizon has its chain closed, but a resume
    // within ONE further horizon continues version numbering from the
    // tombstone — ver > 1 on the restarted chain's first interval is the
    // downstream-visible restart marker
    val streamDir = java.nio.file.Files.createTempDirectory("graft-scd2-tomb")
    val base = 1600000000L * 1000000L // epoch micros
    val hour = 3600L * 1000000L
    val day = 24L * hour
    def stage(tag: String, rows: Seq[(Long, Long, Long, String)]): Unit =
      stageMicros(streamDir, tag, rows)
    stage("f1", Seq((1L, base, 1L, "a"), (2L, base + hour, 1L, "a")))
    val q = EventStreams.scd2(
      EventStreams.eventsStream(spark, streamDir.toString + "/*")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStreams.Event](org.apache.spark.sql.Encoders.product[EventStreams.Event]))
      .toDF()
      .writeStream.outputMode("append").format("memory").queryName("scd2tomb").start()
    try {
      q.processAllAvailable()
      // two sentinel batches past the horizon: first advances the
      // watermark, second fires the now-expired timeout → chain 1
      // finalized, tombstone (lastVer=1) retained
      stage("f2", Seq((901L, base + 10 * day, 99L, "view"))); q.processAllAvailable()
      stage("f3", Seq((902L, base + 10 * day + hour, 99L, "view"))); q.processAllAvailable()
      // entity resumes ~4 days after finalization — within the tombstone
      // horizon, so numbering must CONTINUE (ver 2, 3), not restart at 1
      stage("f4", Seq((3L, base + 11 * day, 1L, "b"), (4L, base + 11 * day + hour, 1L, "c")))
      q.processAllAvailable()
      stage("f5", Seq((903L, base + 30 * day, 99L, "view"))); q.processAllAvailable()
      stage("f6", Seq((904L, base + 31 * day, 99L, "view"))); q.processAllAvailable()
      val got = spark.table("scd2tomb").where(col("user_id") === 1L)
        .select("ver", "event_type", "n_events")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === Set((1L, "a", 2L), (2L, "b", 1L), (3L, "c", 1L)),
        s"restarted chain must continue ver from the tombstone; got $got")
    } finally q.stop()
  }

  test("streaming corpus dedup reproduces the batch incremental answer exactly") {
    def rows(name: String) = SparkEntry.queries(name)(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = rows("q_stream_dedup_corpus")
    val batch = rows("q_dedup_incremental")
    assert(streamed.nonEmpty, "fixture should yield at least one arriving-vs-corpus pair")
    assert(streamed == batch,
      "micro-batched arrival diverged from the one-shot batch ingest — " +
        "batch x corpus candidates must be arrival-order-independent")
  }
}
