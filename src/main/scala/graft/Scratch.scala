package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary perf probe — DELETE before commit.
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name min=${ts.min}%.2f s runs=" +
        ts.map(t => f"$t%.2f").mkString(","))
    }
    // current shape (projection-renamed legs)
    val docs = Tables.documents(spark, d)
    time("cand_current")(operators.Dedup.minhashCandidates(
      docs, 2, 32, 2, 0.25).count())
    // alias self-join shape — does ReuseExchange fire?
    val bkt = operators.Dedup.minhashBuckets(docs, 2, 32, 2)
    val j = bkt.alias("l").join(bkt.alias("r"),
        col("l.band_id") === col("r.band_id") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.doc_id") < col("r.doc_id"))
      .withColumn("est", expr(
        "aggregate(zip_with(l.sig, r.sig, (p, q) -> IF(p = q, 1, 0)), 0, (acc, v) -> acc + v)"))
      .filter(col("est").cast("double") >= lit(0.25) * 32)
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"))
      .repartition(32, col("a_id"), col("b_id"))
      .distinct()
    time("cand_alias")(j.count())
    val p = j.queryExecution.executedPlan.toString
    println("[scratch] ReusedExchange in plan: " + p.contains("ReusedExchange"))
    time("cand_alias_2nd")(j.count())
    time("neardup")(operators.Dedup.dedupNeardup(spark, d).count())
    time("clusters")(operators.Dedup.dedupClusters(spark, d).count())
    time("pagerank")(operators.Graph.graphPagerank(spark, d).count())
    spark.stop()
  }
}
