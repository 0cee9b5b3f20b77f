package graft

import org.apache.spark.sql.functions._

/** Cost-based optimizer wiring: ANALYZE TABLE statistics must actually
  * change physical planning. At 100 TB the difference between a stats-blind
  * and a stats-informed plan is a full fact-fact shuffle vs a broadcast —
  * this spec pins that the lever works end to end on catalog tables:
  * (1) logical plan estimates shrink once column stats + a selective filter
  * meet the filter-estimation rule, and (2) the SAME join flips from
  * sort-merge to broadcast-hash with no hint, purely from ANALYZE output.
  */
class CboSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ANALYZE column stats shrink the filter estimate and flip SMJ to broadcast") {
    Tables.orders(spark, sf0001).write.mode("overwrite").saveAsTable("orders_cbo")
    Tables.lineitem(spark, sf0001).write.mode("overwrite").saveAsTable("lineitem_cbo")
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",      // isolate static CBO planning
      "spark.sql.autoBroadcastJoinThreshold" -> "24576") {
      // 24 KiB threshold: the unfiltered 1500-row orders side is above it,
      // the P-status slice (~3% of rows) is far below — IF the planner can
      // see the selectivity, which is exactly what column stats provide.
      def joined = spark.table("lineitem_cbo")
        .join(spark.table("orders_cbo").filter(col("o_orderstatus") === "P"),
          col("l_orderkey") === col("o_orderkey"))
      // Without column stats the filtered size estimate stays file-sized.
      val blind = joined.queryExecution.executedPlan.toString
      assert(blind.contains("SortMergeJoin"),
        s"pre-stats plan should shuffle (size-blind estimate):\n$blind")
      spark.sql("ANALYZE TABLE orders_cbo COMPUTE STATISTICS FOR COLUMNS o_orderstatus, o_orderkey")
      spark.sql("ANALYZE TABLE lineitem_cbo COMPUTE STATISTICS FOR COLUMNS l_orderkey")
      val informed = joined.queryExecution.executedPlan.toString
      assert(informed.contains("BroadcastHashJoin"),
        s"column stats did not flip the join to broadcast:\n$informed")
      // The logical estimate itself must have shrunk below the threshold.
      val est = joined.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(est <= 24576, s"estimated size $est did not shrink")
      // And the stats-informed plan returns the same rows as the blind one.
      assert(joined.count() ==
        Tables.lineitem(spark, sf0001).join(
          Tables.orders(spark, sf0001).filter(col("o_orderstatus") === "P"),
          col("l_orderkey") === col("o_orderkey")).count())
    }
  }
}
