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

  /** HOT-KEY-TARGETED salted join — the production form of [[saltedJoin]].
    * Blanket salting replicates the whole build side `salts`× forever; at
    * 100 TB that is `salts` extra copies of a possibly corpus-sized table
    * shuffling every run, paid even when only a handful of keys are hot.
    * This variant salts ONLY the measured hot keys:
    *
    *  - hot set = top-`maxHot` keys by big-side count with count ≥
    *    `hotMin`, deterministically ordered (count desc, key asc). The
    *    `maxHot` cap — not the threshold — is what makes the broadcast
    *    SAFE BY CONSTRUCTION: the hot list can never exceed `maxHot`
    *    rows no matter the corpus, where a threshold-only rule admits
    *    |big|/hotMin keys (a billion at petabyte scale). Keys beyond the
    *    cap degrade to the plain shuffle — same algebra, no cliff.
    *  - big rows on a hot key take a content-derived salt in [0, salts);
    *    cold rows keep salt 0. Build rows replicate `salts`× ONLY for hot
    *    keys (via the broadcast membership probe), once for cold ones.
    *  - the exact counting pass over `big` is the local-mode stand-in for
    *    what a deployment reads from table statistics or a
    *    [[graft.functions]] count-min sketch maintained by the ingest
    *    pipeline; either source slots into the same `hot` leaf.
    *
    * Semantically identical to the plain equi-join (every big row meets
    * every matching build row exactly once under its own salt) — the
    * declared row's oracle is the PLAIN join, so the gate itself proves
    * hot-targeting drops or duplicates nothing. */
  def saltedJoinHot(big: DataFrame, small: DataFrame, key: String,
      salts: Int, hotMin: Long, maxHot: Int, saltSource: Column): DataFrame = {
    val hot = big.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= hotMin)
      .orderBy(col("__n").desc, col(key).asc)
      .limit(maxHot)
      .select(col(key), lit(1).as("__hot"))
    val b = big.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot") === 1, pmod(hash(saltSource), lit(salts)))
          .otherwise(lit(0)))
      .drop("__hot")
    val sm = small.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        explode(when(col("__hot") === 1,
            sequence(lit(0), lit(salts - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    b.hint("shuffle_hash").join(sm, Seq(key, "__salt")).drop("__salt")
  }

  /** Declared surface: per-returnflag revenue through the hot-targeted
    * salted join — lineitem is the big side with THREE total key values
    * (A/N/R), the worst shuffle-join skew shape there is (3 of 32
    * reducers active, each holding a third of the fact table); the build
    * side is the inline flag-decode dim. hotMin = 100 keeps all three
    * flags hot at every fixture SF, so the salt path is EXERCISED in the
    * oracled run, not dormant demo code. */
  def skewJoinHot(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val li = graft.Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"),
        col("l_linenumber"), col("l_orderkey"))
    import s.implicits._
    val dim = Seq(("A", "returned"), ("N", "in_flight"), ("R", "refunded"))
      .toDF("flag", "flag_label")
    saltedJoinHot(li, dim, "flag", salts = 16, hotMin = 100, maxHot = 1024,
        saltSource = hash(col("l_orderkey"), col("l_linenumber")))
      .groupBy(col("flag_label"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("rev_cents"))
      .orderBy(col("flag_label").asc)
  }

  /** Declared surface: lineitem⋈orders revenue per order status through
    * the salted join. Oracle is the PLAIN join+aggregate — the gate
    * proves the salt never duplicates or drops a match.
    *
    * Blanket form kept as a declared row deliberately: it is the shape
    * for REQUIRED-DISTRIBUTION contexts where the hot probe can't be
    * injected and for uniformly-hot low-cardinality keys; the
    * hot-targeted default for everything else is [[saltedJoinHot]] /
    * q_skew_join_hot. */
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
    Map("q_skew_agg" -> skewAgg, "q_skew_join" -> skewJoin,
      "q_skew_join_hot" -> skewJoinHot)

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
        |ORDER BY o_orderstatus ASC""".stripMargin,
    "q_skew_join_hot" ->
      """SELECT d.flag_label, count(*) AS cnt,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |         AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem l
        |JOIN (VALUES ('A', 'returned'), ('N', 'in_flight'),
        |             ('R', 'refunded')) AS d(flag, flag_label)
        |  ON l.l_returnflag = d.flag
        |GROUP BY d.flag_label
        |ORDER BY d.flag_label ASC""".stripMargin
  )
}
