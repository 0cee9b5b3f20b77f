package graft

import org.apache.spark.sql.functions._

/** Cost-based optimizer wiring: ANALYZE TABLE statistics must actually
  * change physical planning. At 100 TB the difference between a stats-blind
  * and a stats-informed plan is a full fact-fact shuffle vs a broadcast —
  * this spec pins that the lever works end to end on catalog tables: with
  * equi-height histograms the optimizer sees the TRUE mass of the
  * filtered price range (~4% of orders; string equality could only guess
  * 1/ndv, and timestamp stats hit an estimator gap, so the predicate is a
  * numeric range, which min/max + histogram stats estimate from data),
  * the logical size estimate collapses accordingly, and
  * the SAME join flips shuffle→broadcast with no hint — purely ANALYZE
  * output — while a threshold below the informed estimate still plans the
  * shuffle (the flip is genuinely stats-driven in both directions).
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

  test("ANALYZE histogram stats shrink the filter estimate and flip SMJ to broadcast") {
    Tables.orders(spark, sf0001).write.mode("overwrite").saveAsTable("orders_cbo")
    Tables.lineitem(spark, sf0001).write.mode("overwrite").saveAsTable("lineitem_cbo")
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false", // isolate static CBO planning
      "spark.sql.statistics.histogram.enabled" -> "true") {
      // The broadcast decision reads the BUILD side's estimate — measure
      // that plan, not the join output.
      def buildSide = spark.table("orders_cbo").filter(col("o_totalprice") < 20000)
      def joined = spark.table("lineitem_cbo")
        .join(buildSide, col("l_orderkey") === col("o_orderkey"))
      // Size-blind estimate: filters don't shrink a file-sized guess.
      val blindEst = buildSide.queryExecution.optimizedPlan.stats.sizeInBytes
      spark.sql("ANALYZE TABLE orders_cbo COMPUTE STATISTICS FOR COLUMNS o_totalprice, o_orderkey")
      spark.sql("ANALYZE TABLE lineitem_cbo COMPUTE STATISTICS FOR COLUMNS l_orderkey")
      val informedEst = buildSide.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(informedEst * 4 <= blindEst,
        s"histogram stats did not shrink the estimate: $blindEst -> $informedEst")
      // A threshold between the two estimates must flip the join —
      // and one below the informed estimate must not.
      val mid = (informedEst + (blindEst - informedEst) / 2).toString
      withConf("spark.sql.autoBroadcastJoinThreshold" -> mid) {
        val p = joined.queryExecution.executedPlan.toString
        assert(p.contains("BroadcastHashJoin"),
          s"stats did not flip the join to broadcast at threshold $mid:\n$p")
      }
      withConf("spark.sql.autoBroadcastJoinThreshold" ->
        (informedEst / 2).max(BigInt(1)).toString) {
        // CBO may pick SortMergeJoin or ShuffledHashJoin here; the point
        // is that below the informed estimate it must NOT broadcast.
        val p = joined.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastHashJoin"),
          s"sub-estimate threshold should keep a shuffle join:\n$p")
      }
      // And the stats-informed plan returns the same rows as the raw join.
      assert(joined.count() ==
        Tables.lineitem(spark, sf0001).join(
          Tables.orders(spark, sf0001).filter(col("o_totalprice") < 20000),
          col("l_orderkey") === col("o_orderkey")).count())
    }
  }
}
