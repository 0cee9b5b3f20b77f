package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Per-key running event count through the transformWithState typed-state
  * API: one ValueState[Long] per key, updated each batch, emitted as
  * (key, running_total). Top-level class — the processor is serialized
  * into the streaming query. */
class RunningCountProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Long), (Long, Long)] {
  @transient private var countState: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    countState = getHandle.getValueState[Long]("count",
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long)] = {
    val total = (if (countState.exists()) countState.get() else 0L) + rows.size
    countState.update(total)
    Iterator((key, total))
  }
}

/** Event-time-timer processor: per key, buffer a count and register an
  * event-time timer 10 minutes after the newest event seen; when the
  * watermark passes the timer, emit (key, count, "closed") and clear.
  * Exercises registerTimer + handleExpiredTimer — the timeout machinery
  * custom sessionization needs. */
class TimerCloseProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, java.sql.Timestamp), (Long, Long, String)] {
  @transient private var cnt: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    cnt = getHandle.getValueState[Long]("cnt",
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, java.sql.Timestamp)],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long, String)] = {
    var maxTs = 0L
    var n = 0L
    rows.foreach { r => n += 1; maxTs = math.max(maxTs, r._2.getTime) }
    cnt.update((if (cnt.exists()) cnt.get() else 0L) + n)
    getHandle.registerTimer(maxTs + 10 * 60 * 1000)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long,
      timerValues: org.apache.spark.sql.streaming.TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[(Long, Long, String)] = {
    val total = if (cnt.exists()) cnt.get() else 0L
    cnt.clear()
    Iterator((key, total, "closed"))
  }
}

/** Streaming surface (SURVEY.md §2.10): stream-batch parity for the
  * tumbling aggregation, watermark late-data dropping, the built-in
  * session_window vs the batch lag/cumsum session algebra, and the
  * Spark 4 transformWithState typed-state processor. */
class StreamingSpec extends SparkSpec {

  test("stream-batch parity: tumbling agg over events equals batch result") {
    val streamed = streaming.StreamingDemo.runTumblingToMemory(spark, sf0001)
      .orderBy("ws", "event_type")
    val batch = operators.Events.evtTumbling(spark, sf0001)
      .select("ws", "event_type", "cnt", "sum_cents")
    val a = streamed.select("ws", "event_type", "cnt", "sum_cents").collect()
    val b = batch.collect()
    assert(a.length == b.length && a.sameElements(b))
  }

  test("watermark drops events later than the threshold (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("cnt"))
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    mem.addData((t(0), 1.0), (t(5), 1.0))   // window [10:00,10:10)
    q.processAllAvailable()
    mem.addData((t(30), 1.0))               // advances watermark to 10:20
    q.processAllAvailable()
    mem.addData((t(1), 9.9))                // late: before watermark → dropped
    q.processAllAvailable()
    mem.addData((t(50), 1.0))               // finalizes [10:30,10:40)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wm_test")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    // the finalized 10:00 window must count 2 — the late event never landed
    assert(rows("2024-01-01 10:00:00.0") == 2L)
  }

  test("stream-stream interval join: impressions match clicks within the time bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The streaming twin of the batch range/as-of family: two watermarked
    // streams joined on an equi key + event-time interval — Spark keeps
    // bounded state on both sides (the watermarks + time bound let it
    // evict), which is exactly the 100 TB continuous-join shape.
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val impDf = imps.toDF().toDF("imp_ts", "ad_id").withWatermark("imp_ts", "10 minutes")
    val clkDf = clicks.toDF().toDF("clk_ts", "clk_ad").withWatermark("clk_ts", "10 minutes")
    val joined = impDf.join(clkDf, expr(
      """ad_id = clk_ad AND
        |clk_ts >= imp_ts AND clk_ts <= imp_ts + interval 5 minutes""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    imps.addData((t(0), 1L), (t(0), 2L))
    clicks.addData((t(3), 1L))   // within 5 min of imp(1) → match
    clicks.addData((t(9), 2L))   // 9 min after imp(2) → outside bound
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_test").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("ad_id") == 1L)
  }

  test("stream-stream interval join parity: fixture events equal the batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Parity against BATCH interval-join semantics (the q_join_theta
    // shape: equi key + time bound) on the real fixture, not a toy
    // 4-row stream: both sides of the self-join stream the same 1000
    // fixture events, watermarked, and the streamed pair set must equal
    // the batch join row for row. All data enters in ONE chunk so the
    // watermark can only advance after everything is already joined —
    // nothing is droppable as late, which is what makes exact equality
    // the correct expectation (the late-drop behavior has its own test).
    val ev = Tables.events(spark, sf0001)
      .select(col("ts"), col("user_id"), col("event_id"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    val batch = {
      val a = Tables.events(spark, sf0001)
        .select(col("ts").as("a_ts"), col("user_id").as("a_uid"),
          col("event_id").as("a_id"))
      val b = Tables.events(spark, sf0001)
        .select(col("ts").as("b_ts"), col("user_id").as("b_uid"),
          col("event_id").as("b_id"))
      a.join(b, expr(
        """a_uid = b_uid AND a_id <> b_id AND
          |b_ts >= a_ts AND b_ts <= a_ts + interval 30 minutes""".stripMargin))
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(batch.nonEmpty, "fixture produced no interval-join pairs — test is vacuous")
    val la = MemoryStream[(Timestamp, Long, Long)]
    val lb = MemoryStream[(Timestamp, Long, Long)]
    val sa = la.toDF().toDF("a_ts", "a_uid", "a_id").withWatermark("a_ts", "10 minutes")
    val sb = lb.toDF().toDF("b_ts", "b_uid", "b_id").withWatermark("b_ts", "10 minutes")
    val joined = sa.join(sb, expr(
      """a_uid = b_uid AND a_id <> b_id AND
        |b_ts >= a_ts AND b_ts <= a_ts + interval 30 minutes""".stripMargin))
    val q = joined.select(col("a_id"), col("b_id"))
      .writeStream.format("memory").queryName("ssj_parity")
      .outputMode("append").start()
    la.addData(ev.toIndexedSeq)
    lb.addData(ev.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssj_parity").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(streamed.sameElements(batch),
      s"stream=${streamed.length} pairs, batch=${batch.length} pairs")
  }

  test("stream-stream LEFT OUTER join emits unmatched rows once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The outer variant is the attribution-with-nulls shape: an unmatched
    // impression must surface with a null click — but only after the
    // watermark proves no click can still arrive. That state eviction IS
    // the scale contract (without it, outer-join state grows forever).
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val impDf = imps.toDF().toDF("imp_ts", "ad_id").withWatermark("imp_ts", "5 minutes")
    val clkDf = clicks.toDF().toDF("clk_ts", "clk_ad").withWatermark("clk_ts", "5 minutes")
    val joined = impDf.join(clkDf, expr(
      """ad_id = clk_ad AND
        |clk_ts >= imp_ts AND clk_ts <= imp_ts + interval 5 minutes""".stripMargin),
      "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssoj_test")
      .outputMode("append").start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    imps.addData((t(0), 1L), (t(0), 2L))
    clicks.addData((t(3), 1L)) // ad 1 matched; ad 2 never clicked
    q.processAllAvailable()
    // Advance both watermarks far past imp_ts + bound so the engine can
    // prove ad 2 is unmatchable and emit its null row.
    imps.addData((t(40), 9L))
    clicks.addData((t(40), 9L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssoj_test").collect()
      .map(r => r.getAs[Long]("ad_id") -> Option(r.getAs[Any]("clk_ad")))
    assert(rows.contains(1L -> Some(1L)), s"matched row missing: ${rows.toSeq}")
    assert(rows.contains(2L -> None), s"unmatched row not emitted: ${rows.toSeq}")
  }

  test("stream-static join: dimension enrichment matches the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The most common production join: an unbounded stream enriched
    // against a static (or slowly-refreshed) dimension. The static side
    // broadcasts per micro-batch — no streaming state at all, unlike
    // stream-stream joins — so it scales with the dim, not the stream.
    val dim = Tables.nation(spark, sf0001)
      .select(col("n_nationkey"), col("n_name"))
    val mem = MemoryStream[(Long, Int)]
    val enriched = mem.toDF().toDF("event_id", "nk")
      .join(dim, col("nk") === col("n_nationkey"))
      .select(col("event_id"), col("n_name"))
    val q = enriched.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    mem.addData((1L, 0), (2L, 3), (3L, 24), (4L, 99)) // 99: no dim match
    q.processAllAvailable()
    mem.addData((5L, 3))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss_join").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val dimMap = dim.collect().map(r => r.getInt(0).toLong -> r.getString(1)).toMap
    assert(got == Map(1L -> dimMap(0L), 2L -> dimMap(3L), 3L -> dimMap(24L),
      5L -> dimMap(3L)), "stream-static enrichment diverged from the dim")
  }

  test("streaming dedup: dropDuplicatesWithinWatermark suppresses replays across batches") {
    // The streaming face of the dedup suite: exactly-once-per-key output
    // under at-least-once delivery, state bounded by the watermark — the
    // ingestion-time shape of q_dedup_exact.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val dedup = mem.toDF().toDF("ts", "content")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content")
    val q = dedup.writeStream.format("memory").queryName("dd_test")
      .outputMode("append").start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    mem.addData((t(0), "alpha"), (t(1), "beta"))
    q.processAllAvailable()
    mem.addData((t(2), "alpha"), (t(3), "gamma")) // replay within watermark → dropped
    q.processAllAvailable()
    q.stop()
    val contents = spark.table("dd_test").collect().map(_.getString(1)).sorted
    assert(contents.toSeq == Seq("alpha", "beta", "gamma"),
      s"duplicate suppressed exactly once: ${contents.mkString(",")}")
  }

  test("mapGroupsWithState maintains custom per-key state across batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    def update(user: Long, rows: Iterator[(Long, Double)],
        state: GroupState[(Long, Double)]): (Long, Long, Double) = {
      val (c0, s0) = state.getOption.getOrElse((0L, 0.0))
      var c = c0; var s = s0
      rows.foreach { r => c += 1; s += r._2 }
      state.update((c, s))
      (user, c, s)
    }
    val out = mem.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
      .toDF("user_id", "n", "total")
    val q = out.writeStream.format("memory").queryName("mgws_test")
      .outputMode(OutputMode.Update()).start()
    mem.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
    q.processAllAvailable()
    mem.addData((1L, 3.0))   // state for user 1 must carry over
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("mgws_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // last update for user 1 reflects accumulated state: 3 events, sum 6.0
    assert(rows.contains((1L, 3L, 6.0)) && rows.contains((2L, 1L, 5.0)))
  }

  test("checkpointed stream recovers and continues without reprocessing") {
    import org.apache.spark.sql.functions.{count => fcount}
    val src = java.nio.file.Files.createTempDirectory("graft-ckpt-src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    def stage(tag: String): Unit = {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf0001/events.parquet"),
        src.resolve(s"events_$tag.parquet"))
    }
    stage("a")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf0001/events.parquet").schema
    def agg = spark.readStream.schema(schema).parquet(src.toString)
      .groupBy().agg(fcount(lit(1)).as("n"))
    val q1 = agg.writeStream.format("memory").queryName("ckpt_t")
      .option("checkpointLocation", ckpt).outputMode("complete").start()
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.table("ckpt_t").head().getLong(0)
    assert(n1 == 1000L)
    stage("b") // new file arrives while "down"
    val q2 = agg.writeStream.format("memory").queryName("ckpt_t2")
      .option("checkpointLocation", ckpt).outputMode("complete").start()
    q2.processAllAvailable(); q2.stop()
    // recovered from the checkpoint: total reflects both files exactly once
    assert(spark.table("ckpt_t2").head().getLong(0) == 2000L)
  }

  test("flatMapGroupsWithState sessionizer closes sessions on event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[streaming.SessEvent]
    def t(min: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 10:00:00").getTime + min * 60000L)
    val out = streaming.StreamingDemo.sessionize(mem.toDS(), gapSec = 1800)
    val q = out.writeStream.format("memory").queryName("fmgws_test")
      .outputMode("append").start()
    mem.addData(streaming.SessEvent(1L, t(0)), streaming.SessEvent(1L, t(10)))
    q.processAllAvailable()
    // watermark advances far past user 1's last event + gap → timeout fires
    mem.addData(streaming.SessEvent(2L, t(300)))
    q.processAllAvailable()
    mem.addData(streaming.SessEvent(2L, t(301)))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("fmgws_test").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // user 1's 2-event session was closed and emitted exactly once
    assert(sessions.count(_ == (1L, 2L)) == 1)
  }

  test("foreachBatch sink receives each micro-batch exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = mem.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Long], id: Long) =>
        seen.synchronized { seen += ((id, batch.count())) }; ()
      }
      .start()
    mem.addData(1L, 2L, 3L); q.processAllAvailable()
    mem.addData(4L); q.processAllAvailable()
    q.stop()
    assert(seen.sortBy(_._1).map(_._2).toSeq == Seq(3L, 1L))
  }

  test("batch-id-keyed overwrite upsert is exactly-once across a forced retry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val out = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-upsert-ck").toString
    // Injected failure AFTER the write of batch 1's first execution: the
    // exactly-once claim is that the replay (same batchId) OVERWRITES the
    // orphaned output rather than duplicating beside it.
    val failedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writesPerBatch = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    def start() = mem.toDS().toDF("k", "v").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        streaming.StreamingDemo.upsertBatch(out)(b, id)
        writesPerBatch.merge(id, 1, (a, x) => a + x)
        if (id == 1L && !failedOnce.getAndSet(true))
          throw new RuntimeException("injected post-write pre-commit failure")
        ()
      }
      .start()
    val q1 = start()
    mem.addData((1L, 10L)); q1.processAllAvailable()        // batch 0 commits
    mem.addData((1L, 20L), (2L, 5L))
    intercept[Exception] { q1.processAllAvailable() }       // batch 1 dies post-write
    try q1.stop() catch { case _: Throwable => () }
    val q2 = start()                                        // recover from checkpoint
    q2.processAllAvailable()
    q2.stop()
    // The retry really happened: batch 1 executed (and wrote) twice.
    assert(failedOnce.get())
    assert(writesPerBatch.get(1L) == 2, s"expected 2 writes of batch 1, got $writesPerBatch")
    // ...and the table still reads exactly-once: one row per key, latest
    // batch winning (k=1 upserted 10 -> 20 by batch 1).
    val rows = streaming.StreamingDemo.readUpserts(spark, out, Seq("k"))
      .select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows == Map(1L -> 20L, 2L -> 5L), s"got $rows")
    // no duplicate rows survive at the raw level for committed keys either
    val perKey = streaming.StreamingDemo.readUpserts(spark, out, Seq("k")).groupBy("k").count().collect()
    assert(perKey.forall(_.getLong(1) == 1L))
  }

  test("transformWithState keeps typed per-key state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState (the Spark 4 arbitrary-state API) requires a
    // multi-column-family state store — RocksDB, not the default HDFS
    // provider. Scoped to this query and restored after.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Long)]
      val counts = mem.toDS()
        .groupByKey(_._1)
        .transformWithState(new RunningCountProcessor(),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
      val q = counts.writeStream.format("memory").queryName("tws_test")
        .outputMode("update").start()
      mem.addData((1L, 10L), (1L, 20L), (2L, 5L))
      q.processAllAvailable()
      mem.addData((1L, 30L), (3L, 1L))
      q.processAllAvailable()
      q.stop()
      val latest = spark.table("tws_test").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      // key 1 saw 2 events in batch 1 and 1 more in batch 2 — the ValueState
      // must carry the 2 across the batch boundary
      assert(latest == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState event-time timer fires when the watermark passes it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp)]
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      val out = mem.toDS().toDF("k", "ts")
        .withWatermark("ts", "0 seconds")
        .as[(Long, Timestamp)]
        .groupByKey(_._1)
        .transformWithState(new TimerCloseProcessor(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
      val q = out.writeStream.format("memory").queryName("timer_test")
        .outputMode("append").start()
      mem.addData((1L, t(0)), (1L, t(2)), (2L, t(1)))
      q.processAllAvailable()          // watermark now 10:02; timers at 10:12/10:11
      assert(spark.table("timer_test").count() == 0) // nothing closed yet
      mem.addData((3L, t(30)))          // advances watermark past both timers
      q.processAllAvailable()
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("timer_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(rows.toSet.contains((1L, 2L, "closed")))
      assert(rows.toSet.contains((2L, 1L, "closed")))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("session_window agrees with batch lag/cumsum sessionization") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:10:00")),
      (1L, ts("2024-01-01 01:00:00")), // >30min gap → new session
      (2L, ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "ts")
    val sw = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select("user_id", "n").orderBy("user_id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // user 1: sessions of 2 and 1 events; user 2: one session of 1
    assert(sw.toSeq == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("streaming HLL registers equal the batch registers (mergeable sketch state)") {
    // The integer-HLL register stage is a pure max-aggregate, so the
    // IDENTICAL plan runs as a streaming stateful agg with one state row
    // per (event_type, bucket) — the mergeable-sketch property carried
    // into Structured Streaming. Complete-mode memory sink vs the batch
    // registers over the same file must agree row-for-row.
    val streamed = operators.Aggs.hllRegisters(
      streaming.StreamingDemo.eventsStream(spark, sf0001)
        .select(col("event_type"), col("user_id")))
    val q = streamed.writeStream.format("memory").queryName("hll_reg_test")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val a = spark.table("hll_reg_test")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = operators.Aggs.hllRegisters(
      Tables.events(spark, sf0001).select(col("event_type"), col("user_id")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a.nonEmpty && a == b,
      s"streaming registers diverge from batch: ${(a diff b).take(3)} / ${(b diff a).take(3)}")
  }

  test("streaming KMV buffers equal the batch sketch (bounded mergeable state)") {
    // The bottom-k sketch's streaming form: the TopK typed Aggregator's
    // 64-element buffer IS the state row per segment — each micro-batch
    // folds new rows into the buffer exactly like a map-side combine,
    // the mergeability law as incremental maintenance. Customer keys are
    // unique per row, so no stream-distinct stage is needed and the
    // batch twin is the identical expression over the same file.
    import org.apache.spark.sql.functions.udaf
    val bot = udaf(new functions.TopK(64))
    def sketch(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("hx", md5(col("c_custkey").cast("string")))
      .withColumn("h", expr(operators.DetHash.sparkHexInt("hx", 8)))
      .groupBy(col("c_mktsegment"))
      .agg(bot((-col("h")), col("h")).as("buf"))
      .select(col("c_mktsegment"), size(col("buf")).as("n_kept"),
        expr("element_at(buf, -1)._2").as("kth"))
    val schema = Tables.customer(spark, sf0001).schema
    // the file stream source wants a directory: stage the single file
    val dir = java.nio.file.Files.createTempDirectory("kmv-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/customer.parquet"),
      dir.resolve("customer.parquet"))
    val q = sketch(spark.readStream.schema(schema).parquet(dir.toString))
      .writeStream.format("memory").queryName("kmv_stream_test")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val a = spark.table("kmv_stream_test").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val b = sketch(Tables.customer(spark, sf0001)).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(a.nonEmpty && a == b,
      s"streaming KMV diverges from batch: ${(a diff b).take(3)} / ${(b diff a).take(3)}")
  }

  test("dropDuplicatesWithinWatermark collapses an at-least-once redelivery") {
    // the staging dir holds the events file TWICE (redelivery analog):
    // the deduped stream must equal ONE batch copy exactly, per id
    val streamed = streaming.StreamingDemo.runDedupToMemory(spark, sf0001)
    val ids = streamed.select("event_id").collect().map(_.getLong(0))
    val batchIds = Tables.events(spark, sf0001)
      .select("event_id").collect().map(_.getLong(0))
    assert(ids.length == batchIds.length,
      s"dedup kept ${ids.length} of ${2 * batchIds.length} delivered rows; " +
        s"expected ${batchIds.length}")
    assert(ids.toSet == batchIds.toSet)
    // per-type census survives the dedup unchanged
    val st = streamed.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bt = Tables.events(spark, sf0001).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st == bt)
  }
}
