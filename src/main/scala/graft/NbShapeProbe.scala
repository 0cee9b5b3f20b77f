package graft.operators

import graft.{Calibrate, Harness, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev utility (round 15, VERDICT r14 item 3): same-JVM interleaved A/B
  * of the q_ml_naivebayes plan shapes — the r14 form (4× re-derived
  * train count table, sort-merge test join, row_number argmax window)
  * vs the round-15 form (one checkpointed vocabulary-sized leaf,
  * broadcast-gated model join, min_by argmax; Learn.mlNaiveBayes).
  * Host contention here is bursty enough to poison any cross-JVM
  * comparison (measured: same plan 3.2 s and 17.8 s minutes apart), so
  * the variants alternate inside one session and warm-min is compared.
  * Results are cross-checked for exact equality before timing.
  *
  * `runMain graft.NbShapeProbe [dir] [reps]` */
object NbShapeProbe {
  /** The r14 plan, verbatim (kept here, not in Learn: the declared
    * query moved on — this copy exists only to measure the rejected
    * shape against it, the Dedup.clusterLabels-probe convention). */
  private def v1(s: SparkSession, d: String): DataFrame = {
    val toksCol = split(col("text"), " ")
    val docs = Tables.documents(s, d)
    val train = docs.filter(col("doc_id") % 2 === 0)
    val ct = Tables.spread(train)
      .select(col("lang"), explode(toksCol).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("ct"))
    val vocab = ct.agg(countDistinct(col("tok")).as("vn"))
    val langStats = ct.groupBy(col("lang")).agg(sum(col("ct")).as("nl"))
      .crossJoin(broadcast(vocab))
      .join(train.groupBy(col("lang")).agg(count(lit(1)).as("dl")), "lang")
    val langC = Text.withLgMicro(
        Text.withLgMicro(langStats, "nl + vn", "lg_nv"), "dl", "lg_dl")
      .select(col("lang").as("cl"), col("lg_nv"), col("lg_dl"))
    val ctL = Text.withLgMicro(ct, "ct + 1", "lg_ct1")
      .select(col("lang").as("cl"), col("tok"), col("lg_ct1"))
    val testToks = Tables.spread(docs.filter(col("doc_id") % 2 === 1))
      .select(col("doc_id"), col("lang").as("true_lang"),
        explode(toksCol).as("tok"))
      .groupBy(col("doc_id"), col("true_lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val scored = testToks
      .crossJoin(broadcast(langC.select(col("cl"))))
      .join(ctL, Seq("cl", "tok"), "left")
      .withColumn("term", col("c") * coalesce(col("lg_ct1"), lit(0L)))
      .groupBy(col("doc_id"), col("true_lang"), col("cl"))
      .agg(sum(col("term")).as("s_term"), sum(col("c")).as("n_toks"))
      .join(broadcast(langC), Seq("cl"))
      .withColumn("score",
        col("lg_dl") + col("s_term") - col("n_toks") * col("lg_nv"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("cl").asc)))
      .filter(col("rn") === 1)
      .groupBy(col("true_lang"), col("cl"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("true_lang"), col("cl").as("pred_lang"), col("n_docs"))
      .orderBy(col("true_lang").asc, col("pred_lang").asc)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Harness.withStallTolerances(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"calib_pre ${Calibrate.run().seconds}%.3f s")
    println(f"calib_all_pre ${Calibrate.runParallel()}%.3f s")
    // warm both shapes + cross-check exact output equality
    val a = v1(spark, dir).collect().map(_.toSeq).toSeq
    val b = Learn.mlNaiveBayes(spark, dir).collect().map(_.toSeq).toSeq
    require(a == b, s"variant outputs differ: v1=${a.size} v2=${b.size} rows")
    println(s"outputs equal (${a.size} rows)")
    def time(thunk: => Unit): Double = {
      val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
    }
    val ts = (1 to reps).map { i =>
      val t1 = time(v1(spark, dir).count())
      val t2 = time(Learn.mlNaiveBayes(spark, dir).count())
      println(f"rep$i v1=$t1%.3f s v2=$t2%.3f s")
      (t1, t2)
    }
    println(f"min v1=${ts.map(_._1).min}%.3f s v2=${ts.map(_._2).min}%.3f s")
    println(f"calib_post ${Calibrate.run().seconds}%.3f s")
    println(f"calib_all_post ${Calibrate.runParallel()}%.3f s")
    spark.stop()
  }
}
