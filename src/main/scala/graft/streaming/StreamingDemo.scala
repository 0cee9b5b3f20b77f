package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event row for the custom-state sessionizer (top-level for Encoder
  * derivation). */
case class SessEvent(user_id: Long, ts: java.sql.Timestamp)

/** A closed session emitted by the sessionizer. */
case class SessionOut(user_id: Long, start_s: Long, end_s: Long, n_events: Long)

/** Structured Streaming surface (SURVEY.md §2.10): the same tumbling
  * aggregation as the batch q_evt_tumbling, run as a stream with an
  * event-time watermark. No SQL oracle is possible for a stream, so the
  * contract is stream-batch parity, asserted in StreamingSpec.
  *
  * Scale: file-source streams partition per file/offset range; the
  * windowed aggregation keeps one state row per (window, event_type) in
  * the state store, and the 1-hour watermark bounds state: windows older
  * than (max event time − 1 h) are finalized and evicted.
  */
object StreamingDemo {

  /** events.parquet as an unbounded source (schema must be supplied for
    * readStream; ts normalization branches on the read dtype exactly like
    * graft.Tables.events — the fixture has shipped both TIMESTAMP(NANOS)
    * and timestamp[us] across generations). File sources need a
    * directory, so the (read-only) single file is staged into a temp
    * dir — in production this would just be the ingest dir. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = spark.readStream.schema(schema).parquet(dir.toString)
    schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      // Mirror Tables.events: an unrecognized storage dtype must fail
      // loudly here too, or the next fixture-generation change would
      // break stream/batch parity silently.
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported dtype $other — fixture generation changed again?")
    }
  }

  /** Watermarked 1-hour tumbling aggregation — identical algebra to the
    * batch query so results are comparable row-for-row. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_cents"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("event_type"),
        col("cnt"), col("sum_cents"))

  /** Custom-state streaming sessionization via flatMapGroupsWithState:
    * per-user state = (start, last, count); an event-time timeout closes
    * the session once the watermark passes last + gap and emits it in
    * append mode. This is the production pattern for state Spark's
    * built-in windows can't express; state is bounded per key and evicted
    * on timeout. */
  def sessionize(events: org.apache.spark.sql.Dataset[SessEvent],
      gapSec: Long): org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    def update(user: Long, rows: Iterator[SessEvent],
        state: GroupState[(Long, Long, Long)]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val (st, en, n) = state.get
        state.remove()
        Iterator(SessionOut(user, st, en, n))
      } else {
        val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        var cur = state.getOption
        rows.toSeq.sortBy(e => e.ts.getTime).foreach { e =>
          val t = e.ts.getTime / 1000
          cur match {
            case Some((st, en, n)) if t - en <= gapSec =>
              cur = Some((st, t, n + 1))
            case Some((st, en, n)) =>
              closed += SessionOut(user, st, en, n)
              cur = Some((t, t, 1L))
            case None =>
              cur = Some((t, t, 1L))
          }
        }
        cur.foreach { c =>
          state.update(c)
          state.setTimeoutTimestamp(c._2 * 1000 + gapSec * 1000)
        }
        closed.iterator
      }
    }
    events
      .withWatermark("ts", s"$gapSec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Batch-id-keyed idempotent upsert — the foreachBatch complement to
    * TallySink's two-phase commit. Structured Streaming's exactly-once
    * contract for foreachBatch is REPLAY-WITH-SAME-ID: after a failure
    * the batch re-executes under the identical batchId, so a sink that
    * keys its write on the id and OVERWRITES is idempotent by
    * construction — the retry replaces the partial output instead of
    * appending beside it. This is the standard production upsert recipe
    * (overwrite a batch-id partition / MERGE keyed on batch id); here the
    * unit is one parquet directory per batch id, which also gives the
    * read side partition pruning on batch_id for free. */
  def upsertBatch(outDir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(outDir, s"batch_id=$batchId").toString)

  /** Read-side merge of [[upsertBatch]] output: latest batch wins per
    * key (Hive-style partition discovery turns the batch_id=N directory
    * names into a column; the per-key window partitions are key-sized).
    * Together the pair is an upsert table: writers never rewrite old
    * batches except their own retries, readers resolve currency. */
  def readUpserts(spark: SparkSession, outDir: String,
      keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("batch_id").desc)
    spark.read.parquet(outDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Watermark-bounded streaming dedup on the event id —
    * `dropDuplicatesWithinWatermark`, the ingest-side guard against
    * at-least-once sources (a redelivered event must not double-count
    * downstream). Unlike plain `dropDuplicates`, whose key state grows
    * forever, the watermark EVICTS ids older than
    * (max event time − delay), so state is bounded by the redelivery
    * horizon — the only shape that survives an unbounded stream. Emits
    * the deduped events in append mode; consumers aggregate downstream
    * (keeping the demo single-stateful-operator, the conservative
    * compatibility envelope). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))

  /** Run the watermarked dedup over a staging dir holding the events
    * file TWICE (the at-least-once redelivery analog) and return the
    * materialized deduped stream. */
  def runDedupToMemory(spark: SparkSession, sfDir: String,
      name: String = "dedup_demo"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events-delivery1.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events-delivery2.parquet"))
    val raw = spark.readStream.schema(schema).parquet(dir.toString)
    val normalized = schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported dtype $other — fixture generation changed again?")
    }
    val q = dedupWithinWatermark(normalized)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Run the stream to completion against the (finite) file source and
    * return the materialized result from the in-memory sink. */
  def runTumblingToMemory(spark: SparkSession, sfDir: String,
      name: String = "tumbling_demo"): DataFrame = {
    val q = tumblingAgg(eventsStream(spark, sfDir))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
