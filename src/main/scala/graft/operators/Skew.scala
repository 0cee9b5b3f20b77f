package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (builder-prompt: "skewed keys → salting or
  * AQE skew-join").
  *
  * AQE's skew-join splitting handles join-side skew automatically; these
  * helpers cover *aggregation* hot keys, where one key's rows overwhelm a
  * single reducer. Salting splits each key into `salts` subkeys for the
  * first (partial) aggregation, then combines the partials — two small
  * shuffles instead of one skewed one. The salt is derived from stable row
  * content (not rand()), so results stay deterministic.
  */
object Skew {

  /** count(*) per key, skew-safe: partial count per (key, salt), then
    * final sum per key. Semantically identical to groupBy(key).count. */
  def saltedCount(df: DataFrame, key: Column, salts: Int,
      saltSource: Column): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial_cnt"))
      .groupBy(col("key"))
      .agg(sum(col("partial_cnt")).as("cnt"))

  /** sum(value) per key with the same two-phase shape. */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int,
      saltSource: Column): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("partial_sum"))
      .groupBy(col("key"))
      .agg(sum(col("partial_sum")).as("total"))

  /** Declared surface: hot-key-safe event totals per event_type. The
    * salted two-phase plan must be SEMANTICALLY INVISIBLE — the oracle is
    * the plain one-level GROUP BY, so the correctness gate itself proves
    * salting changes no result. Sums aggregate exact integer cents
    * (associative/commutative in any partial order → deterministic). */
  def skewAgg(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .withColumn("cents",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
    val counts = saltedCount(ev, col("event_type"), 16, col("event_id"))
    val sums = saltedSum(ev, col("event_type"), col("cents"), 16, col("event_id"))
    counts.join(sums, "key")
      .withColumn("avg_value",
        col("total").cast("double") / lit(100) / col("cnt"))
      .select(col("key").as("event_type"), col("cnt"),
        col("total").as("total_cents"), col("avg_value"))
      .orderBy(col("event_type").asc)
  }

  /** Salted join for a skewed big side: each big-side row gets a
    * content-derived salt in [0, salts); the (small) build side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows now land on `salts` reducers instead
    * of one. Semantically identical to the plain equi-join (every big
    * row still meets every matching small row exactly once, under its
    * own salt). AQE's skew-join split covers sort-merge cases
    * adaptively; explicit salting is the deterministic, plan-stable form
    * that also works where AQE can't re-split (e.g. under a required
    * distribution). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      saltSource: Column): DataFrame = {
    val b = big.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val sm = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    b.join(sm, Seq(key, "__salt")).drop("__salt")
  }

  /** Declared surface: lineitem⋈orders revenue per order status through
    * the salted join. Oracle is the PLAIN join+aggregate — the gate
    * proves the salt never duplicates or drops a match. */
  def skewJoin(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val li = graft.Tables.lineitem(s, d)
      .withColumn("cents",
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .withColumnRenamed("l_orderkey", "okey")
    val o = graft.Tables.orders(s, d)
      .select(col("o_orderkey").as("okey"), col("o_orderstatus"))
    saltedJoin(li, o, "okey", 8, col("l_linenumber"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("rev_cents"))
      .orderBy(col("o_orderstatus").asc)
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("q_skew_agg" -> skewAgg, "q_skew_join" -> skewJoin)

  val oracle: Map[String, String] = Map(
    "q_skew_agg" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |         AS BIGINT) AS total_cents,
        |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |         AS BIGINT)::DOUBLE / 100 / count(*) AS avg_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type ASC""".stripMargin,
    "q_skew_join" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |         AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC""".stripMargin
  )
}
