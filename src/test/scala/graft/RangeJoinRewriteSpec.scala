package graft

import org.apache.spark.sql.functions._

/** The RangeJoinRewrite optimizer rule: a natural `abs(a-b) <= w` theta
  * join must plan as a bucketed equi-join (no nested loop) and return
  * exactly the naive join's rows. */
class RangeJoinRewriteSpec extends SparkSpec {

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ plans.RangeJoinRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ eq plans.RangeJoinRewrite)
  }

  private def rangeSql = {
    Tables.events(spark, sf0001)
      .withColumn("us", expr("unix_micros(ts)"))
      .createOrReplaceTempView("ev_rj")
    """SELECT e.event_id, count(*) AS n
      |FROM (SELECT * FROM ev_rj WHERE event_type = 'error') e
      |JOIN ev_rj a ON abs(a.us - e.us) <= 60000000
      |GROUP BY e.event_id
      |ORDER BY e.event_id""".stripMargin
  }

  test("rewrites the natural abs-range join to a bucketed equi-join") {
    val naive = spark.sql(rangeSql).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (rows, plan) = withRule {
      val df = spark.sql(rangeSql)
      (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
        df.queryExecution.executedPlan.toString)
    }
    assert(rows == naive, "rewrite changed the join's semantics")
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"rule did not eliminate the nested loop:\n$plan")
    assert(plan.contains("__rj_bucket_l"), s"bucket key missing from plan:\n$plan")
  }

  test("property: rewritten join equals naive for random values and widths") {
    import spark.implicits._
    // deterministic pseudo-random micro-corpora (fixed seed), incl.
    // NEGATIVE values — the floor-division bucketing must agree across
    // zero (a truncating div would not)
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val w = Seq(1L, 3L, 10L, 1000L)(trial - 1)
      val vals = Seq.fill(60)(rnd.nextLong() % (w * 7) - w * 3)
      val l = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("lid", "lv")
      val r = vals.reverse.zipWithIndex.map { case (v, i) => (i.toLong + 1000, v + rnd.nextInt(3) - 1) }
        .toDF("rid", "rv")
      l.createOrReplaceTempView("rj_l"); r.createOrReplaceTempView("rj_r")
      val sql = s"SELECT lid, rid FROM rj_l JOIN rj_r ON abs(lv - rv) <= $w"
      val naive = spark.sql(sql).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val rewritten = withRule {
        val df = spark.sql(sql)
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("__rj_bucket_l"), s"rule did not fire (w=$w)")
        df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      }
      assert(rewritten == naive, s"mismatch at w=$w")
    }
  }

  test("leaves equi-keyed and non-matching joins untouched") {
    val equiSql =
      """SELECT count(*) AS n
        |FROM ev_rj e JOIN ev_rj a
        |  ON e.user_id = a.user_id AND abs(a.us - e.us) <= 60000000""".stripMargin
    spark.sql(rangeSql) // ensure view exists
    val without = spark.sql(equiSql).head().getLong(0)
    val (n, plan) = withRule {
      val df = spark.sql(equiSql)
      (df.head().getLong(0), df.queryExecution.executedPlan.toString)
    }
    assert(n == without)
    assert(!plan.contains("__rj_bucket_l"),
      "rule fired on a join that already has an equi key")
  }
}
