package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructType}

/** Pins Trigger.AvailableNow — the incremental-ETL trigger: each
  * invocation drains exactly the input available at start, terminates on
  * its own, and a later invocation over the same checkpoint processes
  * ONLY files that arrived in between (offsets + aggregation state both
  * restore). This is the run-to-completion batch-of-streams mode a
  * scheduled 100 TB incremental pipeline runs under — no always-on
  * cluster, exactly-once progress. */
class AvailableNowSpec extends SparkSpec {

  test("AvailableNow drains, stops, and a restart reads only new files") {
    import spark.implicits._
    val src = Files.createTempDirectory("an-src").toString
    val ckpt = Files.createTempDirectory("an-ckpt").toString
    val schema = new StructType().add("k", LongType).add("v", LongType)

    def runOnce(): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream.schema(schema).parquet(src)
        .groupBy(col("k")).agg(sum(col("v")).as("s"))
        .writeStream.format("memory").queryName("an_out")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
      q
    }

    Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    val q1 = runOnce()
    val r1 = spark.table("an_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 10L, 2L -> 20L))
    assert(q1.recentProgress.map(_.numInputRows).sum == 2L)

    Seq((1L, 5L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    val q2 = runOnce()
    val r2 = spark.table("an_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // aggregation state restored from the checkpoint: totals include the
    // first run's rows even though only the new file was read
    assert(r2 == Map(1L -> 15L, 2L -> 20L))
    assert(q2.recentProgress.map(_.numInputRows).sum == 1L,
      "second invocation must read only the file added between runs")
  }
}
