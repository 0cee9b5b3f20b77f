package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pins Dynamic Partition Pruning — the third runtime-pruning lever next
  * to static partition filters (PartitionedLayoutSpec) and bloom runtime
  * filters (RuntimeFilterSpec): when a partitioned fact joins a dim
  * carrying a selective filter on the partition key, the scan receives a
  * `dynamicpruning` partition filter derived from the dim's rows AT
  * RUNTIME — at 100 TB this is what turns "scan every date partition"
  * into "scan the three the dimension actually selects" without the user
  * writing the partition predicate. */
class DppSpec extends SparkSpec {

  test("dim-side filter prunes fact partitions at runtime (dynamicpruning)") {
    val root = Files.createTempDirectory("dpp").toString
    Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.partitionBy("l_returnflag").parquet(s"$root/fact")
    import spark.implicits._
    // the dim must be FILE-backed: a filter over a LocalRelation constant-
    // folds away before the DPP rule looks for a selective predicate
    Seq(("R", "returned"), ("A", "accepted"), ("N", "neither"))
      .toDF("flag", "label").write.parquet(s"$root/dim")
    val statsKey = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val saved = spark.conf.get(statsKey)
    spark.conf.set(statsKey, "false")
    try {
      val dim = spark.read.parquet(s"$root/dim").filter(col("label") === "returned")
      val fact = spark.read.parquet(s"$root/fact")
      val q = fact.join(dim, fact("l_returnflag") === dim("flag"))
        .agg(sum(col("l_quantity")).as("qty"))
      val got = q.collect()(0).getDouble(0)
      val p = q.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("dynamicpruning"),
        s"no dynamic partition pruning in:\n$p")
      // pruning is semantically invisible
      val expect = Tables.lineitem(spark, sf0001)
        .filter(col("l_returnflag") === "R")
        .agg(sum(col("l_quantity"))).collect()(0).getDouble(0)
      assert(got == expect)
    } finally spark.conf.set(statsKey, saved)
  }
}
