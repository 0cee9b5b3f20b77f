package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (round 15, VERDICT r14 item 4): measure the argued-but-
  * unmeasured claim in the ccAdjacency scaladoc — that the DEDUP family
  * is right to keep edge-shaped star contraction (Dedup.clusterLabels)
  * while the co-purchase graph moved to adjacency-leaf min-label
  * propagation (Graph.ccAdjacency). The claim: near-dup pair lists are
  * tiny clique-like edge sets that converge in one round, so the edge
  * shape costs nothing and the adjacency construction would be pure
  * overhead. House rule (PERF.md finding 34): when semantics differ,
  * measure the rejected analogue instead of arguing it.
  *
  * `runMain graft.CcShapeProbe [dir]`. Protocol: derive the near-dup
  * pairs ONCE and eagerly checkpoint them, so both labelers time ONLY
  * their labeling stage over identical materialized edges; 3
  * interleaved reps each, warm-min reported; label maps cross-checked
  * for exact equality before any timing is trusted (both compute the
  * min-label fixpoint).
  */
object CcShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft-sf10x")
    val spark = Harness.withStallTolerances(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.{Dedup, Graph, Hints}
    println(f"calib_pre ${Calibrate.run().seconds}%.3f s")
    println(f"calib_all_pre ${Calibrate.runParallel()}%.3f s")
    val t0 = System.nanoTime()
    val pairs = Hints.checkpoint(
      Dedup.nearDupPairs(Tables.documents(spark, dir))
        .select(col("a_id"), col("b_id")),
      eager = true)
    val nPairs = pairs.count()
    println(f"pairs=$nPairs derivation ${(System.nanoTime() - t0) / 1e9}%.3f s")
    // cross-check BEFORE timing: both labelers must emit the same map
    val star = Dedup.clusterLabels(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val adj = Graph.ccAdjacency(spark,
        pairs.select(col("a_id").as("a_pk"), col("b_id").as("b_pk")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(star == adj,
      s"label maps differ: star=${star.size} adj=${adj.size} " +
        s"mismatches=${star.count { case (k, v) => adj.get(k) != Some(v) }}")
    println(s"label maps equal (${star.size} members)")
    // 3 interleaved reps per variant (contention bursts cannot poison
    // one variant's min without outlasting both)
    def time(thunk: => Unit): Double = {
      val s0 = System.nanoTime(); thunk; (System.nanoTime() - s0) / 1e9
    }
    val ts = (1 to 3).map { i =>
      val a = time(Dedup.clusterLabels(pairs).count())
      val b = time(Graph.ccAdjacency(spark,
        pairs.select(col("a_id").as("a_pk"), col("b_id").as("b_pk"))).count())
      println(f"rep$i star=$a%.3f s adjacency=$b%.3f s")
      (a, b)
    }
    println(f"min star=${ts.map(_._1).min}%.3f s " +
      f"adjacency=${ts.map(_._2).min}%.3f s")
    println(f"calib_post ${Calibrate.run().seconds}%.3f s")
    println(f"calib_all_post ${Calibrate.runParallel()}%.3f s")
    spark.stop()
  }
}
