package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (round 15, VERDICT r14 item 7): the dedup signature
  * state has the same segment lifecycle as the ANN index
  * (Dedup.sigSegments — base + appended deltas + `_COMPACT` fold), but
  * its read-amplification curve was never probed; the ANN probe
  * (graft.AnnSegProbe) is the methodology, this is the sig-state
  * instance. Measures the warm q_dedup_incr_stored read (min of 3 reps)
  * at each live-segment count, then compaction cost and the compacted
  * re-read.
  *
  * `runMain graft.SigSegProbe [dir] [maxSegs]`. Deltas are disjoint
  * slices of the EXISTING documents table (latest-wins resolves each
  * append to identical rows), so the query output is invariant across
  * the run — timing differences are pure read-path cost. The state root
  * is deleted at the end so later sessions rebuild pristine state.
  */
object SigSegProbe {
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
    import operators.Dedup
    val path = Dedup.sigStatePath(spark, dir)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def wipe(): Unit = { if (fs.exists(root)) fs.delete(root, true); () }
    def timeRead(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      Dedup.dedupIncrStored(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }.min
    def segBytes(): String = {
      val segs = Dedup.sigSegments(fs, root)
      segs.map { case (n, p) =>
        s"$n:${fs.getContentSummary(p).getLength / 1024}k" }.mkString(" ")
    }
    println(f"calib_pre ${Calibrate.run().seconds}%.3f s")
    wipe()
    val t0 = System.nanoTime()
    Dedup.dedupIncrStored(spark, dir).count() // first touch writes the base
    println(f"build+first_read ${(System.nanoTime() - t0) / 1e9}%.3f s")
    println(f"segs=1 read ${timeRead()}%.3f s  [${segBytes()}]")
    // bounded deltas: disjoint residue-class slices of the EXISTING
    // corpus ids (round-15 fix: the first probe run sliced absolute id
    // ranges that run past the fixture's id domain — segments 7-8 came
    // out EMPTY, 0k in the log; a modulus slice is nonempty for any
    // corpus with ≥ maxSegs·997 coverage of the residue ring)
    for (i <- 2 to maxSegs) {
      val delta = Tables.documents(spark, dir)
        .filter(col("doc_id") % 10 =!= 7)
        .filter(col("doc_id") % 997 === (i - 2).toLong)
      Dedup.appendSigState(spark, dir, delta)
      println(f"segs=$i read ${timeRead()}%.3f s  [${segBytes()}]")
    }
    val tc0 = System.nanoTime()
    Dedup.compactSigState(spark, dir)
    println(f"compact ${(System.nanoTime() - tc0) / 1e9}%.3f s")
    println(f"segs=1(compacted) read ${timeRead()}%.3f s  [${segBytes()}]")
    println(f"calib_post ${Calibrate.run().seconds}%.3f s")
    wipe()
    spark.stop()
  }
}
