package graft

import java.io.File

import org.apache.spark.sql.functions._

/** End-to-end composition of BOTH custom V2 surfaces: the lattice
  * MICRO_BATCH_READ source feeding a watermarked windowed aggregation
  * into the tally STREAMING_WRITE sink — with a mid-stream restart —
  * proving exactly-once across the whole path, not just per surface.
  *
  * Exactly-once here is the composition of three guarantees, each pinned
  * separately elsewhere and together here:
  *  - the lattice source's admission control is a pure function of the
  *    checkpointed offset (no cursor to desync — LatticeSourceSpec);
  *  - the aggregation state recovers from the checkpoint, so a window
  *    SPANNING the restart point still aggregates both halves;
  *  - the tally sink's (epoch, partition)-deterministic file names +
  *    REPLACE_EXISTING moves make epoch replay overwrite, never append.
  */
class StreamTallySpec extends SparkSpec {

  private def tallyRows(dir: String): Seq[(Long, Long, Long)] = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".tsv"))
    files.toSeq.flatMap { f =>
      scala.io.Source.fromFile(f).getLines().map { l =>
        val c = l.split("\t"); (c(0).toLong, c(1).toLong, c(2).toLong)
      }.toSeq
    }
  }

  test("lattice stream -> windowed agg -> tally sink survives a mid-stream restart exactly-once") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-st-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-st-out").toString

    // one lattice row per minute; 5-minute tumbling windows → window
    // boundaries every 5 ids. The restart point (id 287) is deliberately
    // NOT window-aligned: window [285, 290) has ids 285-286 before the
    // restart and 287-289 after, so correctness requires real state
    // recovery, not just offset resume.
    def run(n: Int): Unit = {
      val q = spark.readStream.format("lattice")
        .option("n", n.toString).option("batchRows", "100").load()
        .withColumn("ts", timestamp_seconds(col("id") * 60))
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("n_rows"), sum(col("id")).as("sum_id"))
        .select(col("window.start").cast("long").as("w_start"),
          col("n_rows"), col("sum_id"))
        .writeStream.format("tally").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run(287)
    run(600)

    // Append mode emits a window once the watermark (max ts, 0s delay)
    // passes its end: final watermark is 599*60, so every window ending
    // at or before id 599's minute is out; only the tail [595, 600) is
    // (correctly) still in state.
    val got = tallyRows(out).sortBy(_._1)
    val expected = (0 until 119).map { k =>
      val ids = (k * 5) until (k * 5 + 5)
      (k * 300L, 5L, ids.map(_.toLong).sum)
    }
    assert(got == expected,
      s"streamed windows diverged: got ${got.size} windows, " +
        s"first diff ${got.zip(expected).find(p => p._1 != p._2)}")

    // no duplicated (epoch, partition) outputs: file names are unique and
    // every window appears exactly once (got == expected already implies
    // it, but pin the layout too)
    val names = Option(new File(out).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.endsWith(".tsv"))
    assert(names.distinct.length == names.length)
    // every data-carrying epoch wrote its manifest
    val manifests = Option(new File(out).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("_tally.e"))
    assert(manifests.nonEmpty, "no epoch manifests written")
  }

  test("tally streaming write: a replayed epoch overwrites its own files, never duplicates") {
    val out = java.nio.file.Files.createTempDirectory("graft-st-replay").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val w = new sources.TallyStreamingWrite(schema, out)
    val factory = w.createStreamingWriterFactory(null)

    def writeEpoch(epoch: Long, taskId: Long): sources.TallyCommit = {
      val dw = factory.createWriter(0, taskId, epoch)
      (1L to 4L).foreach(i =>
        dw.write(org.apache.spark.sql.catalyst.InternalRow(i, i * 10)))
      dw.commit().asInstanceOf[sources.TallyCommit]
    }
    // first attempt of epoch 3 commits
    val m1 = writeEpoch(3L, taskId = 100L)
    w.commit(3L, Array(m1))
    // restart replays epoch 3 with a different task id — same offsets,
    // same deterministic content, SAME final file name
    val m2 = writeEpoch(3L, taskId = 205L)
    w.commit(3L, Array(m2))

    assert(m1.file == m2.file, "replay must target the same final name")
    val files = Option(new File(out).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".tsv"))
    val rows = files.toSeq.flatMap(f =>
      scala.io.Source.fromFile(f).getLines().toSeq)
    assert(files.length == 1 && rows.size == 4,
      s"epoch replay duplicated output: ${files.length} files, ${rows.size} rows")
    // manifest reflects a single epoch's totals
    val manifest = scala.io.Source.fromFile(new File(out, "_tally.e000003"))
      .getLines().toSeq
    assert(manifest.contains("rows=4") && manifest.contains("files=1"))
  }
}
