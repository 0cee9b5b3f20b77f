package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (round 14, VERDICT r13 item 4): measure how the stored
  * ANN index's READ path degrades with the live segment count, to size
  * [[operators.Sim.AnnCompactSegs]] from data instead of taste.
  *
  * `runMain graft.AnnSegProbe [dir] [maxSegs]` (dir default the 100×
  * replica). Protocol: rebuild the state fresh (1 base segment), then
  * append bounded deltas ONE SEGMENT AT A TIME with auto-compaction
  * disabled, timing the warm stored search (min of 3 reps of
  * q_sim_ivf_stored's plan) at each live-segment count; finally compact
  * and re-measure. Deltas are slices of the EXISTING corpus (re-assigned
  * vec_ids), so latest-wins resolves every append to identical rows and
  * the search output is invariant across the whole run — the timing
  * differences are pure read-path cost. The state root is deleted at
  * the end so later sessions rebuild pristine state.
  */
object AnnSegProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft-sf10x")
    val maxSegs = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = Harness.withStallTolerances(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.Sim
    val path = Sim.annStatePath(spark, dir)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def wipe(): Unit = { if (fs.exists(root)) fs.delete(root, true); () }
    def timeSearch(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      Sim.simIvfStored(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"calib_pre ${Calibrate.run().seconds}%.3f s")
    wipe()
    val t0 = System.nanoTime()
    Sim.simIvfStored(spark, dir).count() // first touch builds the base segment
    println(f"build+first_search ${(System.nanoTime() - t0) / 1e9}%.3f s")
    println(f"segs=1 search ${timeSearch()}%.3f s")
    // fixed-size delta batches: 1000 existing vec_ids per segment,
    // disjoint slices so each append is a realistic bounded ingest
    for (i <- 2 to maxSegs) {
      val lo = (i - 2) * 1000L
      val delta = Tables.embeddings(spark, dir)
        .filter(col("vec_id") >= lo && col("vec_id") < lo + 1000)
      Sim.appendAnnState(spark, dir, delta, autoCompact = false)
      println(f"segs=$i search ${timeSearch()}%.3f s")
    }
    val tc0 = System.nanoTime()
    Sim.compactAnnState(spark, dir)
    println(f"compact ${(System.nanoTime() - tc0) / 1e9}%.3f s")
    println(f"segs=1(compacted) search ${timeSearch()}%.3f s")
    println(f"calib_post ${Calibrate.run().seconds}%.3f s")
    wipe()
    spark.stop()
  }
}
