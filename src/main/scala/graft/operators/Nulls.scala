package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** NULL-semantics hardening surface (round-7, ADVICE: the fixtures carry
  * zero NULLs, leaving null handling the least-exercised semantic axis).
  * Instead of a local spec with hand-derived expectations, the axis is
  * declared as first-class ORACLED queries over a deterministically
  * null-injected view of `orders`, so the driver's DuckDB gate pins
  * row-level null semantics — join-key drop, null grouping, three-valued
  * logic, null-aware set ops, explicit null ordering — exactly as hard
  * as every other query.
  *
  * Injection is modular (the q_dq_snapdiff discipline): key %101 nulls
  * the JOIN key, %89 the aggregated MEASURE, %97 the GROUP/ORDER label —
  * three disjoint-purpose stripes both engines compute identically, no
  * randomness. Outputs never carry null NUMERICS (coalesced to −1
  * sentinels) because NaN ≠ NaN would trip the value compare; null
  * STRING group labels are emitted as-is (None compares equal).
  *
  * Every ordering that can see a null is EXPLICIT (asc_nulls_first /
  * NULLS FIRST etc.): Spark's ASC default puts nulls first, DuckDB's
  * puts them last — relying on either default is a silent cross-engine
  * divergence, which is precisely the class of bug this family exists
  * to pin down.
  */
object Nulls {

  /** The null-injected orders view: cents as exact integer money. */
  private def nulled(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 101 === 0, lit(null).cast("bigint"))
        .otherwise(col("o_custkey")).as("custkey"),
      col("o_orderstatus").as("status"),
      when(col("o_orderkey") % 89 === 0, lit(null).cast("bigint"))
        .otherwise(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("cents"),
      when(col("o_orderkey") % 97 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderpriority")).as("priority"))

  private val nulledCte =
    """n AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 101 = 0 THEN NULL
      |              ELSE o_custkey END AS custkey,
      |         o_orderstatus AS status,
      |         CASE WHEN o_orderkey % 89 = 0 THEN NULL
      |              ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |              END AS cents,
      |         CASE WHEN o_orderkey % 97 = 0 THEN NULL
      |              ELSE o_orderpriority END AS priority
      |  FROM orders)""".stripMargin

  /** NULL grouping + null-skipping aggregates: NULL labels form ONE
    * group (SQL GROUP BY null-equality, both engines); count(*) counts
    * rows, count(col)/sum/countDistinct skip nulls — the divergences
    * that silently corrupt KPI pipelines fed by nullable columns. avg is
    * re-derived as div of the null-skipping pair. */
  def nullAgg(s: SparkSession, d: String): DataFrame =
    nulled(s, d)
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("cents")).as("n_vals"),
        coalesce(sum(col("cents")), lit(-1L)).as("sum_cents"),
        coalesce(expr("sum(cents) div count(cents)"), lit(-1L)).as("avg_cents"),
        countDistinct(col("custkey")).as("n_cust"))
      .orderBy(asc_nulls_first("priority"))

  /** NULL join keys: an equi-join NEVER matches a null key (null = null
    * is not TRUE), so inner-join rows silently vanish while a left join
    * retains them unmatched — measured side by side per status. The FK
    * is valid by construction, so n_matched = n_rows − n_nullkey exactly,
    * and the gate proves the engine drops nulls rather than matching
    * them. */
  def nullJoin(s: SparkSession, d: String): DataFrame = {
    val n = nulled(s, d)
    val c = Tables.customer(s, d).select(col("c_custkey"))
    n.join(c, n("custkey") === c("c_custkey"), "left")
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("c_custkey")).as("n_matched"),
        sum(when(col("custkey").isNull, 1L).otherwise(0L)).as("n_nullkey"))
      .orderBy(col("status").asc)
  }

  /** Explicit null placement inside a window order: per status the 3
    * first rows under cents ASC NULLS FIRST — the null-measure rows rank
    * ahead BY DECLARATION, not by engine default (Spark and DuckDB
    * defaults disagree). lag() over the same frame shows null
    * propagation through analytic functions; outputs sentinel-coalesced. */
  def nullWin(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("status"))
      .orderBy(asc_nulls_first("cents"), col("o_orderkey").asc)
    nulled(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .filter(col("rn") <= 3)
      .select(col("status"), col("rn"), col("o_orderkey"),
        coalesce(col("cents"), lit(-1L)).as("cents_o"),
        coalesce(col("prev_cents"), lit(-1L)).as("prev_o"))
      .orderBy(col("status").asc, col("rn").asc)
  }

  /** DISTINCT vs count(DISTINCT) vs set ops under nulls: DISTINCT keeps
    * one null row, count(DISTINCT) excludes nulls entirely, and
    * INTERSECT/EXCEPT use null-aware equality (a null on both sides
    * intersects) — three DIFFERENT null-equality regimes in one query. */
  def nullDistinct(s: SparkSession, d: String): DataFrame = {
    val n = nulled(s, d)
    val even = n.filter(col("o_orderkey") % 2 === 0).select(col("priority"))
    val odd = n.filter(col("o_orderkey") % 2 === 1).select(col("priority"))
    val agg = n.agg(
      countDistinct(col("priority")).as("n_dist_excl"),
      count(lit(1)).as("n_rows"))
    val incl = n.select(col("priority")).distinct()
      .agg(count(lit(1)).as("n_dist_incl"))
    val inter = even.intersect(odd).agg(count(lit(1)).as("n_intersect"))
    val exc = even.except(odd).agg(count(lit(1)).as("n_except"))
    agg.crossJoin(incl).crossJoin(inter).crossJoin(exc)
      .select(col("n_dist_excl"), col("n_dist_incl"),
        col("n_intersect"), col("n_except"), col("n_rows"))
  }

  /** Three-valued logic audit: one row of corpus-wide counts proving
    * null propagation through arithmetic, comparisons inside CASE (a
    * NULL predicate falls to ELSE), null OR TRUE = TRUE, null = null is
    * not TRUE, and coalesce/nullif rewrites — the row-level semantics
    * every filter and CASE in the engine rests on. */
  def nullArith(s: SparkSession, d: String): DataFrame =
    nulled(s, d).agg(
      sum(when((col("cents") + 1).isNull, 1L).otherwise(0L)).as("n_prop_add"),
      sum(when(coalesce(col("cents"), lit(0L)).isNull, 1L).otherwise(0L))
        .as("n_coalesce_null"),
      sum(when(expr("nullif(status, 'O')").isNull, 1L).otherwise(0L))
        .as("n_nullif"),
      sum(when(col("cents") > 100, 1L).otherwise(0L)).as("n_cmp_true"),
      sum(when((col("cents") > 100) || lit(true), 1L).otherwise(0L))
        .as("n_or_true"),
      sum(when(col("priority") === col("priority"), 1L).otherwise(0L))
        .as("n_self_eq"),
      count(lit(1)).as("n_rows"))

  /** Explicit null placement in a global ORDER BY: cents DESC NULLS
    * LAST then priority ASC NULLS FIRST then key — a total order both
    * engines must reproduce row for row in the top 20. */
  def nullOrder(s: SparkSession, d: String): DataFrame =
    nulled(s, d)
      .orderBy(desc_nulls_last("cents"), asc_nulls_first("priority"),
        col("o_orderkey").asc)
      .limit(20)
      .select(col("o_orderkey"),
        coalesce(col("cents"), lit(-1L)).as("cents_o"), col("priority"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_null_agg"      -> nullAgg,
    "q_null_join"     -> nullJoin,
    "q_null_win"      -> nullWin,
    "q_null_distinct" -> nullDistinct,
    "q_null_arith"    -> nullArith,
    "q_null_order"    -> nullOrder
  )

  val oracle: Map[String, String] = Map(
    "q_null_agg" ->
      (s"""WITH $nulledCte
        |SELECT priority,
        |       count(*) AS n_rows,
        |       count(cents) AS n_vals,
        |       CAST(COALESCE(sum(cents), -1) AS BIGINT) AS sum_cents,
        |       CAST(COALESCE(sum(cents) // count(cents), -1) AS BIGINT)
        |         AS avg_cents,
        |       count(DISTINCT custkey) AS n_cust
        |FROM n
        |GROUP BY priority
        |ORDER BY priority ASC NULLS FIRST""".stripMargin),
    "q_null_join" ->
      (s"""WITH $nulledCte
        |SELECT n.status,
        |       count(*) AS n_rows,
        |       count(c.c_custkey) AS n_matched,
        |       CAST(sum(CASE WHEN n.custkey IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_nullkey
        |FROM n LEFT JOIN customer c ON n.custkey = c.c_custkey
        |GROUP BY n.status
        |ORDER BY n.status ASC""".stripMargin),
    "q_null_win" ->
      (s"""WITH $nulledCte,
        |r AS (
        |  SELECT status, o_orderkey, cents,
        |         row_number() OVER w AS rn,
        |         lag(cents, 1) OVER w AS prev_cents
        |  FROM n
        |  WINDOW w AS (PARTITION BY status
        |               ORDER BY cents ASC NULLS FIRST, o_orderkey ASC))
        |SELECT status, CAST(rn AS BIGINT) AS rn, o_orderkey,
        |       COALESCE(cents, -1) AS cents_o,
        |       COALESCE(prev_cents, -1) AS prev_o
        |FROM r WHERE rn <= 3
        |ORDER BY status ASC, rn ASC""".stripMargin),
    "q_null_distinct" ->
      (s"""WITH $nulledCte
        |SELECT (SELECT count(DISTINCT priority) FROM n) AS n_dist_excl,
        |       (SELECT count(*) FROM (SELECT DISTINCT priority FROM n))
        |         AS n_dist_incl,
        |       (SELECT count(*) FROM (
        |          SELECT priority FROM n WHERE o_orderkey % 2 = 0
        |          INTERSECT
        |          SELECT priority FROM n WHERE o_orderkey % 2 = 1))
        |         AS n_intersect,
        |       (SELECT count(*) FROM (
        |          SELECT priority FROM n WHERE o_orderkey % 2 = 0
        |          EXCEPT
        |          SELECT priority FROM n WHERE o_orderkey % 2 = 1))
        |         AS n_except,
        |       (SELECT count(*) FROM n) AS n_rows""".stripMargin),
    "q_null_arith" ->
      (s"""WITH $nulledCte
        |SELECT
        |  CAST(sum(CASE WHEN cents + 1 IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_prop_add,
        |  CAST(sum(CASE WHEN COALESCE(cents, 0) IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_coalesce_null,
        |  CAST(sum(CASE WHEN nullif(status, 'O') IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_nullif,
        |  CAST(sum(CASE WHEN cents > 100 THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_cmp_true,
        |  CAST(sum(CASE WHEN cents > 100 OR TRUE THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_or_true,
        |  CAST(sum(CASE WHEN priority = priority THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_self_eq,
        |  count(*) AS n_rows
        |FROM n""".stripMargin),
    "q_null_order" ->
      (s"""WITH $nulledCte
        |SELECT o_orderkey, COALESCE(cents, -1) AS cents_o, priority
        |FROM n
        |ORDER BY cents DESC NULLS LAST, priority ASC NULLS FIRST,
        |         o_orderkey ASC
        |LIMIT 20""".stripMargin)
  )
}
