package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (InjectRuntimeFilter): when a shuffle
  * join's build side carries a selective predicate, Catalyst can seed a
  * bloom filter from it and apply `might_contain` on the probe side BELOW
  * the probe's shuffle — at 100 TB this drops most fact rows before they
  * are ever exchanged, the runtime complement of static partition/footer
  * pruning. Thresholds are production-scale by default (the probe side
  * must look ≥10 GB), so a dedicated session drops them to sf range; the
  * assertion is on the injected plan shape AND that filtering changed no
  * results. */
class RuntimeFilterSpec extends SparkSpec {

  private def rfSession(): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
    // Force a shuffle join: a broadcast build side needs no runtime filter
    // (the probe never shuffles), so the feature only arms past the
    // broadcast threshold.
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  private def joined(s: SparkSession) =
    Tables.lineitem(s, sf0001)
      .join(
        Tables.orders(s, sf0001).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))

  test("selective shuffle join injects a bloom runtime filter on the fact side") {
    val s = rfSession()
    val df = joined(s)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"no bloom runtime filter injected on the probe side:\n$p")
    assert(p.contains("bloom_filter_agg") || p.contains("BloomFilterAggregate") ||
      p.contains("ObjectHashAggregate"),
      s"no bloom filter creation on the build side:\n$p")
  }

  test("bloom pruning is semantically invisible (same result with and without)") {
    val s = rfSession()
    val withBloom = joined(s).collect().map(_.toString).sorted.toSeq
    val off = spark.newSession()
    off.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val without = joined(off).collect().map(_.toString).sorted.toSeq
    assert(withBloom == without)
  }
}
