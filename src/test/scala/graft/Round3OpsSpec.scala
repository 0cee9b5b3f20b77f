package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-3 operators whose correctness hinges on
  * subtle rules the sf oracles can't isolate: funnel stage ordering, the
  * bucketed range-join rewrite's equality with the naive theta join, and
  * multiset set-op multiplicity. */
class Round3OpsSpec extends SparkSpec {

  test("range join: bucketed rewrite equals the naive theta join at sf0.001") {
    val bucketed = operators.Joins.joinRange(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sf0001).withColumn("us", expr("unix_micros(ts)"))
    val naive = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("us"))
      .crossJoin(ev.select(col("us").as("b_us")))
      .filter(abs(col("b_us") - col("us")) <= 60000000L)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed == naive, "bucketed-interval rewrite diverged from naive range join")
  }

  test("funnel: a click BEFORE the first view does not advance the user") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(min: Int) = new Timestamp(60000L * min)
    // user 1: click(1) < view(2) — click must NOT count; purchase(3) has
    //   no qualifying click, so user 1 stops at stage 1.
    // user 2: view(1) < click(2) < purchase(3) — full funnel.
    // user 3: view(1), purchase(2) but no click — stops at stage 1.
    val ev = Seq(
      (1L, t(1), 10L, "click"), (1L, t(2), 10L, "view"), (1L, t(3), 10L, "purchase"),
      (2L, t(1), 20L, "view"), (2L, t(2), 20L, "click"), (2L, t(3), 20L, "purchase"),
      (3L, t(1), 30L, "view"), (3L, t(2), 30L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    // exercise the same algebra as evtFunnel on the crafted frame
    val us = ev.withColumn("us", expr("unix_micros(ts)"))
    val v = us.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val c = us.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("us") > col("v_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val p = us.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("us") > col("c_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    assert(v.count() == 3 && c.count() == 1 && p.count() == 1)
    assert(c.select("user_id").as[Long].collect().toSet == Set(20L))
  }

  test("exceptAll keeps multiplicity (2 views - 1 purchase = 1 surviving row)") {
    import spark.implicits._
    val views = Seq(7L, 7L, 8L).toDF("user_id")
    val buys = Seq(7L).toDF("user_id")
    val out = views.exceptAll(buys).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(7L -> 1L, 8L -> 1L))
  }

  test("pagerank: deterministic across reruns; ranks conserve within damping bounds") {
    val a = operators.Graph.pagerank(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val b = operators.Graph.pagerank(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b, "integer pagerank must be bit-deterministic")
    // every node's rank ≥ the damping floor and bounded by total mass
    assert(a.values.forall(_ >= 150000L))
    assert(a.values.sum <= a.size.toLong * 1000000L)
  }

  test("salted join equals the plain equi-join (no dup/drop under salt)") {
    val li = Tables.lineitem(spark, sf0001).withColumnRenamed("l_orderkey", "okey")
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("okey"), col("o_orderstatus"))
    val plain = li.join(o, "okey").groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = operators.Skew.saltedJoin(li, o, "okey", 8, col("l_linenumber"))
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("scrub redacts denylist tokens and digit runs, counts match rewrite") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the key opens the merge gate", "en", "srcA", 28L),
      (2L, "call 5551234 now", "en", "srcA", 16L),
      (3L, "nothing sensitive here", "en", "srcB", 22L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val hits = docs.withColumn("n",
        size(regexp_extract_all(col("text"), lit(operators.Text.scrubPattern), lit(0))))
      .select("doc_id", "n").as[(Long, Int)].collect().toMap
    assert(hits == Map(1L -> 2, 2L -> 1, 3L -> 0))
    val scrubbed = docs.withColumn("s",
        regexp_replace(col("text"), operators.Text.scrubPattern, "[REDACTED]"))
      .select("doc_id", "s").as[(Long, String)].collect().toMap
    assert(scrubbed(1L) == "the [REDACTED] opens the [REDACTED] gate")
    assert(scrubbed(2L) == "call [REDACTED] now")
    assert(scrubbed(3L) == "nothing sensitive here")
  }
}
