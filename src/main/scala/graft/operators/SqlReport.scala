package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The engine's SQL text surface (SURVEY §1.2: temp views + spark.sql) —
  * the reference's analytics layer is literal SQL over the star schema,
  * so two of its report-query shapes run here as SQL strings: the
  * flagship top-contributors and the aggregate-over-aggregate
  * contribution distribution (subquery in FROM). Catalyst plans SQL text
  * and DataFrame DSL identically — these compile to the same plans as
  * their DSL twins. */
object SqlReport {

  private def view(s: SparkSession, d: String): Unit =
    Tables.events(s, d).createOrReplaceTempView("events_v")

  def sqlTopUsers(s: SparkSession, d: String): DataFrame = {
    view(s, d)
    s.sql("""SELECT user_id, count(*) AS cnt
            |FROM events_v
            |GROUP BY user_id
            |ORDER BY cnt DESC, user_id ASC
            |LIMIT 10""".stripMargin)
  }

  /** "Distribution of per-user contribution counts" — aggregate over an
    * aggregate via subquery-in-FROM. */
  def sqlContribDist(s: SparkSession, d: String): DataFrame = {
    view(s, d)
    s.sql("""SELECT cnt, count(*) AS n_users
            |FROM (SELECT user_id, count(*) AS cnt
            |      FROM events_v GROUP BY user_id)
            |GROUP BY cnt
            |ORDER BY cnt ASC""".stripMargin)
  }

  /** Explicit GROUPING SETS (beyond rollup/cube) through SQL text. */
  def sqlGroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
            |FROM orders_v
            |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            |ORDER BY o_orderstatus ASC NULLS FIRST,
            |         o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Correlated EXISTS through SQL text — exercises Catalyst's subquery
    * decorrelation (rewritten to the same semi join the DSL emits). */
  def sqlExists(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql("""SELECT c_custkey, c_mktsegment
            |FROM customer_v
            |WHERE EXISTS (SELECT 1 FROM orders_v
            |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
            |ORDER BY c_custkey ASC""".stripMargin)
  }

  /** Scalar subquery as a filter threshold. The threshold is an exact
    * value picked from the data (max over a systematic subset), so the
    * comparison is float-exact on both engines — never a computed
    * average (ulp-divergent). */
  def sqlScalarSub(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql("""SELECT count(*) AS n_above,
            |       round(sum(o_totalprice), 2) AS sum_above
            |FROM orders_v
            |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders_v
            |                      WHERE o_orderkey % 97 = 0)""".stripMargin)
  }

  /** Named WINDOW clause + lag through SQL text (the remaining SQL-surface
    * construct the DSL twins don't exercise as text): day-over-day event
    * counts per type. */
  def sqlWindow(s: SparkSession, d: String): DataFrame = {
    view(s, d)
    s.sql("""SELECT event_type, d, cnt,
            |       cnt - lag(cnt, 1) OVER w AS delta
            |FROM (SELECT event_type,
            |             date_format(date_trunc('DAY', ts), 'yyyy-MM-dd') AS d,
            |             count(*) AS cnt
            |      FROM events_v GROUP BY event_type, d)
            |WINDOW w AS (PARTITION BY event_type ORDER BY d ASC)
            |ORDER BY event_type ASC, d ASC""".stripMargin)
  }

  /** Correlated LATERAL subquery with ORDER BY + LIMIT: top-2 orders per
    * customer — the per-row dependent subplan Catalyst decorrelates into
    * a ranked window join (run `.explain`: no nested-loop re-execution
    * per outer row, one shuffle on the correlation key). The modulus
    * keeps the declared output bounded; the decorrelation shape is
    * identical at any customer count. */
  def sqlLateral(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
            |FROM customer_v c,
            |LATERAL (SELECT o_orderkey, o_totalprice
            |         FROM orders_v
            |         WHERE o_custkey = c.c_custkey
            |         ORDER BY o_totalprice DESC, o_orderkey ASC
            |         LIMIT 2) t
            |WHERE c.c_custkey % 29 = 0
            |ORDER BY c.c_custkey ASC, t.o_totalprice DESC,
            |         t.o_orderkey ASC""".stripMargin)
  }

  /** Recursive CTE (Spark 4 WITH RECURSIVE): per-order amortization — pay
    * 30% + a fixed 500.00 each step until the balance clears. Exact
    * integer-cents arithmetic so every step is bit-identical on both
    * engines; `bal > 0` bounds the recursion (~15 levels for the largest
    * order). Each iteration is a distributed step over the frontier —
    * the engine-level pattern behind graph reachability and org rollups. */
  def sqlRecursive(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql("""WITH RECURSIVE pay(k, bal, n) AS (
            |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT),
            |         0
            |  FROM orders_v WHERE o_orderkey % 500 = 0
            |  UNION ALL
            |  SELECT k, bal - (bal * 3 div 10 + 50000), n + 1
            |  FROM pay WHERE bal > 0
            |)
            |SELECT k, CAST(max(n) AS BIGINT) AS n_payments,
            |       min(bal) AS final_bal
            |FROM pay GROUP BY k ORDER BY k ASC""".stripMargin)
  }

  /** SQL-text PIVOT syntax (the declarative twin of the DataFrame
    * `.pivot()` in q_agg_pivot): daily per-type event cents as columns.
    * Explicit IN list (plan determinism — never let PIVOT discover its
    * columns from data), integer cents, zero-filled cells; the oracle is
    * the portable SUM(CASE) form. */
  def sqlPivot(s: SparkSession, d: String): DataFrame = {
    view(s, d)
    s.sql("""SELECT day,
            |       coalesce(view_c, 0) AS view_cents,
            |       coalesce(click_c, 0) AS click_cents,
            |       coalesce(purchase_c, 0) AS purchase_cents
            |FROM (
            |  SELECT unix_micros(ts) div 86400000000 AS day, event_type,
            |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
            |  FROM events_v)
            |PIVOT (
            |  sum(cents) FOR event_type IN ('view' AS view_c, 'click' AS click_c,
            |                                'purchase' AS purchase_c))
            |ORDER BY day ASC""".stripMargin)
  }

  /** The SQL:2003 FILTER clause through the SQL-text surface — the
    * declarative form of q_cond_agg's count_if/when algebra (one pass,
    * each aggregate sees its own predicate; never N filtered scans).
    * Cents keep the filtered sums integer-exact. */
  def sqlFilterClause(s: SparkSession, d: String): DataFrame = {
    view(s, d)
    s.sql("""SELECT user_id % 10 AS cohort,
            |       count(*) AS n_events,
            |       count(*) FILTER (WHERE event_type = 'purchase')
            |         AS n_purchases,
            |       count(*) FILTER (WHERE event_type = 'error') AS n_errors,
            |       sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
            |         FILTER (WHERE event_type = 'purchase')
            |         AS purchase_cents
            |FROM events_v
            |GROUP BY cohort
            |ORDER BY cohort ASC""".stripMargin)
  }

  /** NOT IN vs NOT EXISTS under NULLs — the three-valued-logic trap
    * that silently empties production anti-joins: one masked subquery
    * element (every 97th order's custkey CASEd to NULL) makes `x NOT IN
    * (list)` UNKNOWN for every x, so the NOT IN count is 0 BY THE SQL
    * STANDARD, while the NOT EXISTS form (equality skips the NULL
    * elements) returns the real complement. Declared as a query so the
    * gate pins that this engine implements the standard's null-aware
    * anti-join semantics, not the intuitive-but-wrong set difference —
    * and because Catalyst plans NOT IN as NullAwareAntiJoin, the costly
    * operator users should see demoted to NOT EXISTS when NULLs are
    * impossible. */
  def sqlNotinNull(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql("""SELECT
            |  (SELECT count(*) FROM customer_v
            |   WHERE c_custkey NOT IN
            |     (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
            |             ELSE o_custkey END
            |      FROM orders_v WHERE o_totalprice > 250000)) AS n_not_in,
            |  (SELECT count(*) FROM customer_v c
            |   WHERE NOT EXISTS
            |     (SELECT 1 FROM orders_v o
            |      WHERE o.o_totalprice > 250000
            |        AND (CASE WHEN o.o_orderkey % 97 = 0 THEN NULL
            |             ELSE o.o_custkey END) = c.c_custkey))
            |    AS n_not_exists""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_notin_null" -> sqlNotinNull,
    "q_sql_filter"       -> sqlFilterClause,
    "q_sql_pivot" -> sqlPivot,
    "q_sql_lateral"       -> sqlLateral,
    "q_sql_recursive"     -> sqlRecursive,
    "q_sql_window"        -> sqlWindow,
    "q_sql_topusers"      -> sqlTopUsers,
    "q_sql_contrib_dist"  -> sqlContribDist,
    "q_sql_grouping_sets" -> sqlGroupingSets,
    "q_sql_exists"        -> sqlExists,
    "q_sql_scalar_sub"    -> sqlScalarSub
  )

  val oracle: Map[String, String] = Map(
    "q_sql_notin_null" ->
      """SELECT
        |  (SELECT count(*) FROM customer
        |   WHERE c_custkey NOT IN
        |     (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
        |             ELSE o_custkey END
        |      FROM orders WHERE o_totalprice > 250000)) AS n_not_in,
        |  (SELECT count(*) FROM customer c
        |   WHERE NOT EXISTS
        |     (SELECT 1 FROM orders o
        |      WHERE o.o_totalprice > 250000
        |        AND (CASE WHEN o.o_orderkey % 97 = 0 THEN NULL
        |             ELSE o.o_custkey END) = c.c_custkey))
        |    AS n_not_exists""".stripMargin,
    "q_sql_filter" ->
      """SELECT user_id % 10 AS cohort,
        |       count(*) AS n_events,
        |       count(*) FILTER (WHERE event_type = 'purchase')
        |         AS n_purchases,
        |       count(*) FILTER (WHERE event_type = 'error') AS n_errors,
        |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |         FILTER (WHERE event_type = 'purchase') AS BIGINT)
        |         AS purchase_cents
        |FROM events
        |GROUP BY cohort
        |ORDER BY cohort ASC""".stripMargin,
    "q_sql_pivot" ->
      """SELECT epoch_us(ts) // 86400000000 AS day,
        |       CAST(coalesce(sum(CASE WHEN event_type = 'view'
        |         THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0)
        |         AS BIGINT) AS view_cents,
        |       CAST(coalesce(sum(CASE WHEN event_type = 'click'
        |         THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0)
        |         AS BIGINT) AS click_cents,
        |       CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
        |         THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0)
        |         AS BIGINT) AS purchase_cents
        |FROM events
        |GROUP BY day
        |ORDER BY day ASC""".stripMargin,
    "q_sql_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey ASC
        |         LIMIT 2) t
        |WHERE c.c_custkey % 29 = 0
        |ORDER BY c.c_custkey ASC, t.o_totalprice DESC,
        |         t.o_orderkey ASC""".stripMargin,
    "q_sql_recursive" ->
      """WITH RECURSIVE pay(k, bal, n) AS (
        |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT), 0
        |  FROM orders WHERE o_orderkey % 500 = 0
        |  UNION ALL
        |  SELECT k, bal - (bal * 3 // 10 + 50000), n + 1
        |  FROM pay WHERE bal > 0
        |)
        |SELECT k, CAST(max(n) AS BIGINT) AS n_payments,
        |       min(bal) AS final_bal
        |FROM pay GROUP BY k ORDER BY k ASC""".stripMargin,
    "q_sql_window" ->
      """SELECT event_type, d, cnt,
        |       cnt - lag(cnt, 1) OVER w AS delta
        |FROM (SELECT event_type,
        |             strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
        |             count(*) AS cnt
        |      FROM events GROUP BY event_type, d)
        |WINDOW w AS (PARTITION BY event_type ORDER BY d ASC)
        |ORDER BY event_type ASC, d ASC""".stripMargin,
    "q_sql_topusers" ->
      """SELECT user_id, count(*) AS cnt
        |FROM events
        |GROUP BY user_id
        |ORDER BY cnt DESC, user_id ASC
        |LIMIT 10""".stripMargin,
    "q_sql_contrib_dist" ->
      """SELECT cnt, count(*) AS n_users
        |FROM (SELECT user_id, count(*) AS cnt
        |      FROM events GROUP BY user_id)
        |GROUP BY cnt
        |ORDER BY cnt ASC""".stripMargin,
    "q_sql_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_sql_exists" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |ORDER BY c_custkey ASC""".stripMargin,
    "q_sql_scalar_sub" ->
      """SELECT count(*) AS n_above,
        |       round(sum(o_totalprice), 2) AS sum_above
        |FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders
        |                      WHERE o_orderkey % 97 = 0)""".stripMargin
  )
}
