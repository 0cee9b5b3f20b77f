package graft

import org.apache.spark.sql.functions._

/** Pins two Adaptive Query Execution behaviors the 100 TB story leans
  * on (SURVEY §4.2 claims them "free" — these specs make the claim
  * falsifiable on this build):
  *
  *  - shuffle-partition coalescing: tiny map outputs collapse into fewer
  *    reduce partitions at runtime (AQEShuffleRead), so a 32-partition
  *    config doesn't schedule 32 near-empty tasks;
  *  - dynamic join demotion: a statically-planned sort-merge join
  *    becomes a broadcast join once runtime stats reveal the small side
  *    (the re-plan that rescues a bad static estimate at scale).
  */
class AqeSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) =>
      // getOption-style: absent OR null-defaulted confs both restore via unset
      k -> (try Option(spark.conf.get(k)) catch { case _: Throwable => None })
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE coalesces a small aggregate's shuffle partitions at runtime") {
    withConf("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.shuffle.partitions" -> "32") {
      val df = Tables.lineitem(spark, sf0001)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("AQEShuffleRead"), s"no adaptive shuffle read in:\n$p")
      assert(p.contains("coalesced"), s"partitions not coalesced in:\n$p")
    }
  }

  test("AQE demotes a statically-planned SMJ to broadcast from runtime stats") {
    withConf(
        "spark.sql.adaptive.enabled" -> "true",
        // static planner must NOT broadcast (threshold off)...
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        // ...but AQE may, from measured shuffle sizes
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10485760") {
      val o = Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val df = Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey"), col("l_quantity"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val staticPlan = df.queryExecution.sparkPlan.toString
      assert(staticPlan.contains("SortMergeJoin"),
        s"static plan should be SMJ with broadcast disabled:\n$staticPlan")
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("BroadcastHashJoin"),
        s"AQE did not demote to broadcast:\n$finalPlan")
    }
  }
}
