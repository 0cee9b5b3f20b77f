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

  test("hot-targeted salted join equals the plain join with mixed hot/cold keys") {
    import spark.implicits._
    // one hot key (5k rows) + 50 cold keys (10 rows each): with
    // hotMin=1000 only 'H' crosses the threshold, so BOTH paths — salted
    // hot rows and salt-0 cold rows — execute and must reassemble into
    // exactly the plain join's result.
    val big = (Seq.fill(5000)("H") ++ (0 until 50).flatMap(k =>
        Seq.fill(10)(s"c$k"))).zipWithIndex
      .toDF("k", "v")
    val small = (("H", 99L) +: (0 until 50).map(k => (s"c$k", k.toLong)))
      .toDF("k", "w")
    val plain = big.join(small, "k")
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
      .collect().map(_.toString).sorted.toSeq
    val salted = operators.Skew.saltedJoinHot(big, small, "k",
        salts = 8, hotMin = 1000, maxHot = 16, saltSource = col("v"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    // the maxHot cap must degrade gracefully, not change results: cap 0
    // forces every key down the cold path
    val capped = operators.Skew.saltedJoinHot(big, small, "k",
        salts = 8, hotMin = 1, maxHot = 0, saltSource = col("v"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
      .collect().map(_.toString).sorted.toSeq
    assert(capped == plain)
  }

  test("q_skew_join_hot plan: hot probes broadcast, salted join stays shuffled-hash") {
    val df = operators.Skew.skewJoinHot(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // two membership probes against the bounded hot list must be
    // broadcasts (the safety argument IS the bounded build side)...
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"hot-list probes not broadcast:\n$p")
    // ...and the (key, salt) join must stay a shuffled hash join — a
    // sort-merge here would silently re-serialize the skew on the sort
    assert(p.contains("ShuffledHashJoin"),
      s"salted join lost its shuffle_hash pin:\n$p")
  }

  test("q_skew_join_hot exercises the hot path at fixture scale (all flags over hotMin)") {
    val flags = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flags.size == 3 && flags.values.forall(_ >= 100),
      s"fixture drifted — salt path would go dormant: $flags")
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
