package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The nine TPC-H query shapes Analytics.scala didn't cover, completing the
  * 22-query suite. SURVEY.md §0: the reference dir is empty, so these follow
  * the public TPC-H specification's query *shapes*, adapted to the driver's
  * fixture schema (FIXTURES.md): there is no partsupp table and lineitem has
  * no commitdate/receiptdate/shipmode, so Q2/Q9/Q11/Q20 derive the
  * part-supplier relation (and a unit-cost proxy) from lineitem, and
  * Q4/Q12/Q21's "late" predicate is l_shipdate vs o_orderdate + N days.
  * Each adaptation keeps the canonical plan shape the query exists to
  * exercise (Q2 correlated-min, Q4 exists-semi, Q21 exists+not-exists,
  * Q11 scalar-subquery fraction, Q16 distinct-count with NOT IN, ...).
  *
  * Arithmetic discipline matches Analytics.revMicros: money lands in exact
  * integer cents/micro-units recovered from the 2-decimal doubles, so sums
  * are order-independent and hash-comparable against DuckDB. The only
  * per-row float op is Q2's single IEEE division (deterministic, then
  * rounded to fixed precision on both engines identically).
  */
object TpchFull {

  /** cents × (100 − discount basis points) — exact integer micro-units. */
  private val revMicros =
    expr("""CAST(round(l_extendedprice * 100) AS BIGINT)
           | * (100 - CAST(round(l_discount * 100) AS BIGINT))""".stripMargin)

  /** l_quantity is integral 1..50 stored as double (FIXTURES.md). */
  private val qtyInt = expr("CAST(round(l_quantity) AS BIGINT)")

  /** TPC-H Q1 (pricing summary report): the canonical full-scan partial-agg
    * query — one pass over lineitem, map-side combine into 6 groups. All
    * measures in exact integer units; averages via integer division (both
    * engines truncate toward zero on positives). charge adds the tax factor:
    * cents × (100−disc) × (100+tax) stays well under BIGINT at 100 TB row
    * counts per group (~1e11/row). */
  def q1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= "2001-09-02")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qtyInt).as("sum_qty"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("sum_base_cents"),
        sum(revMicros).as("sum_disc_micros"),
        sum(expr(
          """CAST(round(l_extendedprice * 100) AS BIGINT)
            | * (100 - CAST(round(l_discount * 100) AS BIGINT))
            | * (100 + CAST(round(l_tax * 100) AS BIGINT))""".stripMargin))
          .as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty_centi", expr("(100 * sum_qty) DIV count_order"))
      .withColumn("avg_price_cents", expr("sum_base_cents DIV count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)

  /** Per-(part, supplier) minimum unit cost derived from lineitem — the
    * fixture's stand-in for partsupp.ps_supplycost. ext/qty is one IEEE
    * division (bit-identical on both engines), rounded to milli-units. */
  private def unitCostMilli(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(expr(
        "CAST(round(l_extendedprice / l_quantity * 1000) AS BIGINT)"))
        .as("cost_milli"))

  /** TPC-H Q2 (minimum-cost supplier): the correlated-min query. The derived
    * part-supplier cost relation joins broadcast dims (filtered part,
    * EUROPE suppliers), then the per-part minimum is a window over the
    * part key — partition count = parts, never a global sort. At 100 TB the
    * cost relation shuffles once on (part, supp) for its own agg and once
    * on part for the window; everything else rides broadcasts. */
  def q2(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_size") === 15 && col("p_type").like("STANDARD%"))
      .select(col("p_partkey"), col("p_name"))
    val r = Tables.region(s, d).filter(col("r_name") === "EUROPE")
    val n = Tables.nation(s, d)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val su = Tables.supplier(s, d)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val cost = unitCostMilli(s, d)
      .join(Hints.bcOrHash(p, Tables.rowCount(s, d, "part")),
        col("l_partkey") === col("p_partkey"))
      .join(Hints.bcOrHash(su, Tables.rowCount(s, d, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
    cost
      .withColumn("min_cost",
        min(col("cost_milli")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("cost_milli") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("cost_milli"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  /** TPC-H Q4 (order priority checking): the EXISTS-semi-join query. "Late"
    * adapts receipt>commit to l_shipdate > o_orderdate + 30 days (midnight
    * timestamps, exact interval arithmetic). Orders side is date-pruned
    * before the semi join; the join is equi on the order key with the date
    * residual, so it shuffles once and never materializes lineitem rows. */
  def q4(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= "1996-07-01" &&
        col("o_orderdate") < "1996-10-01")
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority").asc)
  }

  /** TPC-H Q9 (product type profit): profit = revenue − cost, per supplier
    * nation per order year. Cost proxy (no partsupp): p_retailprice × qty,
    * in the same exact micro-units as revenue. Part filter (name noun
    * 'bolt') and supplier→nation broadcast; lineitem⋈orders shuffles on
    * the order key — the one unavoidable fact-fact shuffle. */
  def q9(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_name").like("% bolt"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sn = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
    Tables.lineitem(s, d)
      .join(Hints.bcOrHash(p, Tables.rowCount(s, d, "part")),
        col("l_partkey") === col("p_partkey"))
      .join(Hints.bcOrHash(sn, Tables.rowCount(s, d, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === o("o_orderkey"))
      .withColumn("profit_micros",
        revMicros - expr("CAST(round(p_retailprice * 100) AS BIGINT)")
          * qtyInt * lit(100L))
      .groupBy(col("n_name"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(col("profit_micros")).as("sum_profit_micros"))
      .orderBy(col("n_name").asc, col("o_year").desc)
  }

  /** TPC-H Q11 (important stock): the scalar-subquery-fraction query. Value
    * per part over NATION_7's suppliers (lineitem-derived, semi via
    * broadcast join), kept where part value × 1000 > nation total — both
    * sides exact integers, the total a 1-row broadcast fold, so no float
    * fraction ever exists. */
  def q11(s: SparkSession, d: String): DataFrame = {
    val su = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val byPart = Tables.lineitem(s, d)
      .join(Hints.bcOrHash(su, Tables.rowCount(s, d, "supplier")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(revMicros).as("value_micros"))
    val total = byPart.agg(sum(col("value_micros")).as("total_micros"))
    byPart.crossJoin(broadcast(total))
      .filter(col("value_micros") * 1000L > col("total_micros"))
      .select(col("l_partkey"), col("value_micros"))
      .orderBy(col("value_micros").desc, col("l_partkey").asc)
  }

  /** TPC-H Q12 (shipping-mode priority split): no shipmode column, so lines
    * bucket by shipping delay (FAST ≤30d, MEDIUM ≤90d, SLOW else) — the
    * same two-conditional-count-per-bucket shape. Midnight timestamps make
    * datediff exact on both engines. */
  def q12(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1997-01-01" &&
        col("l_shipdate") < "1998-01-01")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(o, col("l_orderkey") === o("o_orderkey"))
      .withColumn("delay_bucket",
        when(datediff(col("l_shipdate"), col("o_orderdate")) <= 30, "FAST")
          .when(datediff(col("l_shipdate"), col("o_orderdate")) <= 90, "MEDIUM")
          .otherwise("SLOW"))
      .groupBy(col("delay_bucket"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("delay_bucket").asc)
  }

  /** TPC-H Q16 (parts/supplier relationship): distinct-supplier count per
    * part spec, with the NOT-IN supplier exclusion (complaint proxy:
    * negative account balance). The part-supplier relation is
    * lineitem-derived and pre-deduplicated before the distinct count so
    * the expensive agg runs on (part, supp) pairs, not raw lines. */
  def q16(s: SparkSession, d: String): DataFrame = {
    val badSupp = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val p = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#5" &&
        !col("p_type").like("PROMO%") &&
        col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(Hints.bcOrHash(badSupp, Tables.rowCount(s, d, "supplier")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Hints.bcOrHash(p, Tables.rowCount(s, d, "part")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
  }

  /** TPC-H Q20 (potential part promotion): suppliers who dominate a part's
    * 1997 shipments (2 × own qty > part total — the availqty>half-of-
    * shipped adaptation) for 'bolt' parts, restricted to AMERICA. The
    * per-part total is a window over the already-aggregated (supp, part)
    * frame, then a distinct-supplier semi join into the dim side. */
  def q20(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_name").like("% bolt")).select(col("p_partkey"))
    val sp = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1997-01-01" &&
        col("l_shipdate") < "1998-01-01")
      .join(Hints.bcOrHash(p, Tables.rowCount(s, d, "part")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(qtyInt).as("qty"))
    val dominant = sp
      .withColumn("part_qty",
        sum(col("qty")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("qty") * 2L > col("part_qty"))
      .select(col("l_suppkey")).distinct()
    val r = Tables.region(s, d).filter(col("r_name") === "AMERICA")
    val n = Tables.nation(s, d)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    Tables.supplier(s, d)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(Hints.bcOrHash(dominant, Tables.rowCount(s, d, "supplier")),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("n_name"))
      .orderBy(col("s_name").asc)
  }

  /** TPC-H Q21 (suppliers who kept orders waiting): the EXISTS + NOT-EXISTS
    * double-correlation query. "Late" = shipped > 60 days after order date;
    * waiting order = status F, this supplier late, another supplier on the
    * order, no OTHER supplier late. Both correlations are equi on the
    * order key (semi then anti) with supplier/date residuals, so each is
    * one shuffle join — never a per-order collect. ASIA suppliers,
    * distinct waiting orders counted per supplier. */
  def q21(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val pairs = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val l1 = pairs
      .join(o, col("l_orderkey") === o("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"), col("o_orderdate"))
      .distinct()
    val l2 = pairs.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
    val l3 = pairs.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"),
      col("l_shipdate").as("ship3"))
    val waiting = l1
      .join(l2, col("l_orderkey") === col("k2") &&
        col("l_suppkey") =!= col("s2"), "left_semi")
      .join(l3, col("l_orderkey") === col("k3") &&
        col("l_suppkey") =!= col("s3") &&
        col("ship3") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_anti")
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val su = Tables.supplier(s, d)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    waiting
      .join(Hints.bcOrHash(su, Tables.rowCount(s, d, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"), col("n_name"))
      .agg(countDistinct(col("l_orderkey")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q1"  -> q1,
    "q_tpch_q2"  -> q2,
    "q_tpch_q4"  -> q4,
    "q_tpch_q9"  -> q9,
    "q_tpch_q11" -> q11,
    "q_tpch_q12" -> q12,
    "q_tpch_q16" -> q16,
    "q_tpch_q20" -> q20,
    "q_tpch_q21" -> q21
  )

  val oracle: Map[String, String] = Map(
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_base_cents,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |         * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |         AS sum_disc_micros,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |         * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |         * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT)
        |         AS sum_charge,
        |       count(*) AS count_order,
        |       (100 * CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT))
        |         // count(*) AS avg_qty_centi,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         // count(*) AS avg_price_cents
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_tpch_q2" ->
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |         min(CAST(round(l_extendedprice / l_quantity * 1000) AS BIGINT))
        |           AS cost_milli
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost_milli
        |FROM cost, part, supplier, nation, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size = 15 AND p_type LIKE 'STANDARD%'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND cost_milli = (
        |    SELECT min(c2.cost_milli)
        |    FROM cost c2, supplier s2, nation n2, region r2
        |    WHERE c2.l_partkey = p_partkey AND s2.s_suppkey = c2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_tpch_q9" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |         - CAST(round(p_retailprice * 100) AS BIGINT)
        |           * CAST(round(l_quantity) AS BIGINT) * 100) AS BIGINT)
        |         AS sum_profit_micros
        |FROM lineitem, orders, part, supplier, nation
        |WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
        |  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND p_name LIKE '% bolt'
        |GROUP BY n_name, o_year
        |ORDER BY n_name ASC, o_year DESC""".stripMargin,
    "q_tpch_q11" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |           AS value_micros
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier, nation
        |    WHERE s_nationkey = n_nationkey AND n_name = 'NATION_7')
        |  GROUP BY l_partkey)
        |SELECT l_partkey, value_micros FROM v
        |WHERE value_micros * 1000 > (SELECT sum(value_micros) FROM v)
        |ORDER BY value_micros DESC, l_partkey ASC""".stripMargin,
    "q_tpch_q12" ->
      """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
        |              THEN 'FAST'
        |            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90
        |              THEN 'MEDIUM'
        |            ELSE 'SLOW' END AS delay_bucket,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE l_orderkey = o_orderkey
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY delay_bucket
        |ORDER BY delay_bucket""".stripMargin,
    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_tpch_q20" ->
      """WITH sp AS (
        |  SELECT l_suppkey, l_partkey,
        |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_name LIKE '% bolt')
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l_suppkey, l_partkey),
        |tot AS (SELECT l_partkey, sum(qty) AS part_qty FROM sp
        |        GROUP BY l_partkey)
        |SELECT s_name, n_name
        |FROM supplier, nation, region
        |WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'AMERICA'
        |  AND s_suppkey IN (SELECT sp.l_suppkey FROM sp, tot
        |                    WHERE sp.l_partkey = tot.l_partkey
        |                      AND 2 * sp.qty > tot.part_qty)
        |ORDER BY s_name""".stripMargin,
    "q_tpch_q21" ->
      """SELECT s_name, n_name, count(DISTINCT l1.l_orderkey) AS numwait
        |FROM supplier, nation, region, orders,
        |     (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem li, orders oi
        |      WHERE li.l_orderkey = oi.o_orderkey AND oi.o_orderstatus = 'F'
        |        AND li.l_shipdate > oi.o_orderdate + INTERVAL 60 DAY) l1
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name, n_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 10""".stripMargin
  )
}
