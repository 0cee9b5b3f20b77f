package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** AQE's runtime answers to the two problems the engine otherwise solves
  * statically (salting in Skew.scala, explicit repartition): skewed-join
  * splitting and post-shuffle partition coalescing. Run in a dedicated
  * session because the thresholds must be dropped far below production
  * values to trigger on sf-scale data. */
class AqeSkewSpec extends SparkSpec {

  private def aqeSession(): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    val s = aqeSession()
    import s.implicits._
    // 90% of the left side lands on one key → one shuffle partition dwarfs
    // the rest; with broadcast disabled this is the classic straggler.
    val left = s.range(0, 20000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val right = s.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("w"))
    val joined = left.join(right, "k")
    // materialize THIS frame (not a derived count) so its adaptive plan
    // finalizes — AQE only rewrites after real shuffle stats exist
    assert(joined.collect().length > 0)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"AQE did not mark/split the skewed join partition:\n$p")
  }

  test("AQE coalesces over-provisioned post-shuffle partitions") {
    val s = aqeSession()
    val tiny = Tables.nation(s, sf0001)
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
    tiny.collect()
    val p = tiny.queryExecution.executedPlan.toString
    assert(p.contains("coalesced") || p.contains("AQEShuffleRead"),
      s"AQE shuffle read missing — 8 shuffle partitions kept for 5 groups:\n$p")
  }
}
