package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window functions (SURVEY.md §2.5): ranking, running frames, lag/lead,
  * range frames, ntile + analytic first/last.
  *
  * Each window is one shuffle on its partition key followed by an
  * in-partition sort — at cluster scale the partition key choice (user_id,
  * customer) is what keeps state bounded per task. All orderings carry a
  * unique tiebreak so rank/lag assignment is deterministic.
  */
object Windows {

  /** Top-3 orders per customer with row_number/rank/dense_rank. */
  def winRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"), col("rnk"), col("drnk"))
      .orderBy(col("o_custkey").asc, col("rn").asc)
  }

  /** Running sum + running count per user (rows frame). */
  def winRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("run_sum", round(sum(col("value")).over(w), 2))
      .withColumn("run_cnt", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("run_sum"), col("run_cnt"))
      .orderBy(col("event_id").asc)
  }

  /** lag/lead: previous/next event id and gap per user. */
  def winLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("next_event_id", lead(col("event_id"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("gap_us"),
        col("next_event_id"))
      .orderBy(col("event_id").asc)
  }

  /** RANGE frame on a numeric key: trailing-hour average value per
    * event_type (frame = 3600 seconds preceding .. current).
    *
    * `value` is 2-decimal quantized, so tiny-frame averages land exactly on
    * half-cent rounding boundaries where engines disagree. Aggregate exact
    * integer cents instead and derive the average by integer-fed division —
    * bit-identical across engines, no rounding needed. */
  def winRangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("epoch_s").asc)
      .rangeBetween(-3600L, 0L)
    Tables.events(s, d)
      .withColumn("epoch_s", expr("unix_micros(ts) div 1000000"))
      .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .withColumn("trail_cents", sum(col("cents")).over(w))
      .withColumn("trail_cnt", count(lit(1)).over(w))
      .withColumn("trail_avg",
        col("trail_cents").cast("double") / lit(100) / col("trail_cnt"))
      .select(col("event_id"), col("event_type"), col("epoch_s"),
        col("trail_cents"), col("trail_cnt"), col("trail_avg"))
      .orderBy(col("event_id").asc)
  }

  /** ntile quartiles of customer balance + analytic first/last value over
    * a running frame.
    *
    * Scale note: an unpartitioned window is a single-task total order —
    * exact ntile/global-rank semantics require it. At 100 TB the scale
    * path is approx (`approx_percentile` cutoffs joined back, or a
    * range-partitioned two-pass rank); this query keeps the exact form
    * because its oracle demands exact quartiles and the dimension table
    * is the small side by design. */
  def winNtile(s: SparkSession, d: String): DataFrame = {
    val ord = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.customer(s, d)
      .withColumn("quartile", ntile(4).over(ord).cast("long"))
      .withColumn("run_min_bal", first(col("c_acctbal")).over(run))
      .withColumn("run_max_bal", last(col("c_acctbal")).over(run))
      .select(col("c_custkey"), col("c_acctbal"), col("quartile"),
        col("run_min_bal"), col("run_max_bal"))
      .orderBy(col("c_custkey").asc)
  }

  /** percent_rank / cume_dist per market segment: rank-derived ratios are
    * divisions of identical integers on both engines — bit-exact raw. */
  def winPctRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, d)
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .select(col("c_custkey"), col("c_mktsegment"), col("pr"), col("cd"))
      .orderBy(col("c_custkey").asc)
  }

  /** The 100 TB quartile path documented on winNtile: approx_percentile
    * cutoffs riding along as a 1-row BROADCAST (crossJoin) + a narrow,
    * shuffle-free assignment map — not a driver-side `approxQuantile`
    * action, so plan construction stays lazy and the cutoff aggregate
    * shares the cluster run (accuracy 1000 ≈ the 0.001 relative error of
    * the former stat call; both are QuantileSummaries underneath). Not
    * oracled (sketch-based cutoffs differ across engines); NtileScaleSpec
    * asserts ≥97% agreement with exact ntile. */
  def approxQuartiles(df: org.apache.spark.sql.DataFrame, c: String): org.apache.spark.sql.DataFrame = {
    val cuts = df.agg(
      expr(s"approx_percentile($c, array(0.25, 0.5, 0.75), 1000)").as("q_cuts"))
    df.crossJoin(broadcast(cuts))
      .withColumn("quartile",
        when(col(c) <= element_at(col("q_cuts"), 1), 1L)
          .when(col(c) <= element_at(col("q_cuts"), 2), 2L)
          .when(col(c) <= element_at(col("q_cuts"), 3), 3L)
          .otherwise(4L))
      .drop("q_cuts")
  }

  /** Declared no-oracle surface for [[approxQuartiles]] — the scale path
    * for q_win_ntile's single-task total order, summarized per quartile.
    * Sketch-based cutoffs have no cross-engine oracle; NtileScaleSpec
    * pins ≥97% agreement with exact ntile, and this row gives the
    * 100 TB-shaped plan (no unpartitioned window) a bench number. */
  def winNtileApprox(s: SparkSession, d: String): DataFrame =
    approxQuartiles(Tables.customer(s, d), "c_acctbal")
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("c_acctbal")), 2).as("lo"),
        round(max(col("c_acctbal")), 2).as("hi"))
      .orderBy(col("quartile").asc)

  /** Histogram-quantile quartiles — the third tier of the ntile family
    * and the one that is BOTH scale-safe and fully ORACLED. q_win_ntile
    * is exact but needs a total order; q_win_ntile_approx is scale-safe
    * but its QuantileSummaries cutoffs are engine-internal; this row gets
    * the best of both by quantizing to fixed $50 bins first: one hash agg
    * builds the bin histogram (bin-count-sized regardless of row count),
    * a window over the BINS — not the rows — computes cumulative counts,
    * the three quartile cutoffs fall out of one 1-row aggregate
    * (smallest bin with cum·4 ≥ q·total), and assignment is a broadcast
    * CASE. Every step is integer arithmetic on cents (DuckDB `//` and
    * Spark `div` both truncate toward zero, verified for negative
    * balances), so the oracle replays it exactly. Cutoffs are exact at
    * bin granularity: counts per quartile differ from exact ntile only by
    * within-boundary-bin ties — the precision/scalability dial is the bin
    * width. */
  def winNtileHist(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .withColumn("cents",
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .withColumn("bin", expr("cents div 5000"))
    val hist = cust.groupBy(col("bin")).agg(count(lit(1)).as("n"))
    // Unpartitioned window is safe HERE: it runs over the bin histogram
    // (bounded by the value range / bin width), never the fact rows.
    val cum = hist.withColumn("cum",
      sum(col("n")).over(Window.orderBy(col("bin").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val cuts = cum
      .crossJoin(broadcast(hist.agg(sum(col("n")).as("total"))))
      .agg(
        min(when(expr("cum * 4 >= 1 * total"), col("bin"))).as("cut1"),
        min(when(expr("cum * 4 >= 2 * total"), col("bin"))).as("cut2"),
        min(when(expr("cum * 4 >= 3 * total"), col("bin"))).as("cut3"))
    cust.crossJoin(broadcast(cuts))
      .withColumn("quartile", expr(
        "CAST(CASE WHEN bin <= cut1 THEN 1 WHEN bin <= cut2 THEN 2 " +
          "WHEN bin <= cut3 THEN 3 ELSE 4 END AS BIGINT)"))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("c_acctbal")), 2).as("lo"),
        round(max(col("c_acctbal")), 2).as("hi"))
      .orderBy(col("quartile").asc)
  }

  /** EXACT quartiles without the single-task total order — the fourth
    * tier of the ntile family and the standard scale answer
    * (range-partitioned two-pass rank): q_win_ntile is exact but funnels
    * into one task; q_win_ntile_approx and q_win_ntile_hist are
    * scale-safe but approximate/bin-granular; this row is BOTH exact and
    * distributed, and carries the SAME oracle as q_win_ntile.
    *
    * Pass 1: range-repartition rows on the order key (non-overlapping
    * sorted ranges, the same repartitionByRange lever as
    * Tables.writeRange) and count each partition — a #partitions-sized
    * table whose cumulative sums are every partition's global rank
    * offset. Pass 2: row_number WITHIN each range partition (window
    * partitioned by spark_partition_id, so partition-sized tasks, never
    * a total order), plus the broadcast offset = exact global rank.
    * ntile(4) is then pure arithmetic on (rank, N): the first N mod 4
    * buckets take ⌈N/4⌉ rows, the rest ⌊N/4⌋ — Spark's ntile contract,
    * replayed bit-exactly. run_min_bal/run_max_bal fall out without any
    * window at all: over a running frame first_value is the globally
    * first row's value (a 1-row broadcast min(struct)) and last_value is
    * the current row's own value. Every rank is exact integer math, so
    * the q_win_ntile oracle gates this plan unchanged. */
  def winNtileExact2(s: SparkSession, d: String): DataFrame = {
    val nParts = s.sessionState.conf.numShufflePartitions
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
    val ranged = cust
      .repartitionByRange(nParts, col("c_acctbal").asc, col("c_custkey").asc)
      .withColumn("pid", spark_partition_id().cast("long"))
    // #partitions-sized side: per-partition counts, cumulative offsets,
    // and the grand total. The window here runs over ≤ nParts rows —
    // bounded by the partition count, not the data (same licence as the
    // bin-histogram window in winNtileHist).
    val parts = ranged.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
    val offs = parts
      .withColumn("off",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(col("pid").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(parts.agg(sum(col("cnt")).as("total"))))
      .select(col("pid"), col("off"), col("total"))
    // Globally-first row by the range order — the value first_value()
    // sees from every running frame.
    val firstRow = cust.agg(
      min(struct(col("c_acctbal"), col("c_custkey"))).as("fr"))
      .select(col("fr.c_acctbal").as("run_min_bal"))
    val wLocal = Window.partitionBy(col("pid"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    ranged
      .withColumn("lrn", row_number().over(wLocal).cast("long"))
      .join(broadcast(offs), "pid")
      .withColumn("rk", col("off") + col("lrn"))
      .crossJoin(broadcast(firstRow))
      .withColumn("quartile", expr(
        // Spark/SQL ntile(4): base = N div 4, rem = N mod 4; ranks up to
        // cut = rem·(base+1) land in the first rem (larger) buckets. The
        // base=0 corner (N < 4) never reaches the ELSE branch: cut = N ≥ rk.
        """CAST(IF(rk <= (total % 4) * (total div 4 + 1),
          |       (rk - 1) div (total div 4 + 1) + 1,
          |       total % 4 + (rk - (total % 4) * (total div 4 + 1) - 1)
          |         div (total div 4) + 1) AS BIGINT)""".stripMargin))
      .withColumn("run_max_bal", col("c_acctbal"))
      .select(col("c_custkey"), col("c_acctbal"), col("quartile"),
        col("run_min_bal"), col("run_max_bal"))
      .orderBy(col("c_custkey").asc)
  }

  /** first_value / last_value / nth_value over an UNBOUNDED-both-ways
    * frame per order priority (deterministic order: date + unique key).
    * Output sampled to every-100th order key AFTER the window so the
    * declared result stays small while the window computes over all
    * rows. */
  def winFirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .withColumn("first_key", first(col("o_orderkey")).over(w))
      .withColumn("last_key", last(col("o_orderkey")).over(w))
      .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(w))
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("first_key"), col("last_key"), col("second_key"))
      .orderBy(col("o_orderkey").asc)
  }

  /** EWMA with dyadic weights (α = 1/2) over the trailing 8 events per
    * user: weight 2^(7−j) for the j-th lag, i.e. scaled = Σ lag_j·2^(7−j)
    * — PURE INTEGER once values are cents, so the "float-hostile"
    * exponential smoother becomes hash-exact on both engines (divide by
    * 255 downstream when a unit-weight value is needed). Missing lags at
    * a partition head contribute 0 and n_terms records how many were
    * real. One shuffle on user_id like every window here; the 8-term
    * expression is generated from one constant, Spark and oracle alike. */
  private def ewmaTerms(lagFn: Int => String): String =
    (0 until 8).map(j => s"coalesce(${lagFn(j)}, 0) * ${1L << (7 - j)}")
      .mkString(" + ")

  def winEwma(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    // the window partitions by user_id, so pruning users FIRST cannot
    // change any surviving user's frame — and it pushes to the scan.
    val withLags = (0 until 8).foldLeft(
      Tables.events(s, d)
        .filter(col("user_id") % 17 === 0)
        .withColumn("us", expr("unix_micros(ts)"))
        .withColumn("cents",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))) {
      (df, j) => df.withColumn(s"l$j", lag(col("cents"), j).over(w))
    }
    withLags
      .withColumn("ewma_scaled", expr(ewmaTerms(j => s"l$j")))
      .withColumn("n_terms",
        least(row_number().over(w), lit(8)).cast("long"))
      .select(col("event_id"), col("user_id"), col("cents"),
        col("ewma_scaled"), col("n_terms"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  /** Rolling DISTINCT count — the window family's missing aggregate:
    * distinct event types within each user's trailing-5-event frame.
    * Spark has no windowed count(distinct); `size(collect_set)` over the
    * frame is the idiomatic equivalent (bounded frame ⇒ bounded set per
    * row — never use this shape on an unbounded frame at scale). Same
    * one-shuffle-per-window-key discipline as the rest of the module. */
  def winDistinct(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(-4, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") % 17 === 0)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("d_types",
        size(collect_set(col("event_type")).over(w)).cast("long"))
      .select(col("event_id"), col("user_id"), col("d_types"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  /** Rolling EXACT median over each user's trailing-5 value frame,
    * reported doubled (med×2 = sum of the two middle order statistics)
    * so odd and even windows alike stay in BIGINT — the interpolated
    * float median is (a+b)/2, whose ulp behavior differs between
    * engines, but a+b never does. The frame median materializes as
    * sort-of-a-5-array per row (collect_list over a bounded frame):
    * constant work per row regardless of corpus size, the same scale
    * contract as the EWMA/rolling-distinct family. Ramp-up rows (k<5)
    * use the true k-element median, not a null fence. */
  def winMedian(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(-4, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") % 17 === 0)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("cents",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .withColumn("fr", array_sort(collect_list(col("cents")).over(w)))
      .withColumn("k", size(col("fr")))
      .withColumn("med_x2",
        element_at(col("fr"), expr("CAST((k + 1) div 2 AS INT)")) +
          element_at(col("fr"), expr("CAST(k div 2 + 1 AS INT)")))
      .select(col("event_id"), col("user_id"), col("cents"),
        col("k").cast("long").as("k"), col("med_x2"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  /** Trailing-8 OLS slope per user in exact rational arithmetic: with
    * x = the event's per-user sequence index and y = value cents, the
    * least-squares slope over the frame is
    * (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) — four integer window sums and one
    * integer-fed division, so the trend detector is hash-exact where a
    * float regression never is. Full frames only (x ≥ 8): x is
    * consecutive there, making the denominator the positive constant
    * n²(n²−1)/12 = 336 — no zero-division row can exist. */
  def winSlope(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val f = wOrd.rowsBetween(-7, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") % 17 === 0)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("cents",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .withColumn("x", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(f))
      .withColumn("sx", sum(col("x")).over(f))
      .withColumn("sy", sum(col("cents")).over(f))
      .withColumn("sxy", sum(col("x") * col("cents")).over(f))
      .withColumn("sxx", sum(col("x") * col("x")).over(f))
      .filter(col("x") >= 8)
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope", col("num").cast("double") / col("den"))
      .select(col("event_id"), col("user_id"), col("x"), col("num"),
        col("den"), col("slope"))
      .orderBy(col("user_id").asc, col("x").asc)
  }

  /** Rolling outlier flag — the z-score rule |x−μ| > 2σ over each
    * user's trailing-8 frame WITHOUT a float ever existing: with
    * s = Σ frame, q = Σ frame², n = |frame|, the test cross-multiplies
    * to (n·x − s)² > 4·(n·q − s²) — exact BIGINT on both sides (cents ≤
    * ~10⁵, n ≤ 8 keeps every term ≪ 2⁶³). Full frames only, like the
    * OLS slope. The float z-score never hash-matches across engines;
    * the cross-multiplied inequality always does. */
  def winOutlier(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val f = wOrd.rowsBetween(-7, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") % 17 === 0)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("cents",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .withColumn("x", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(f))
      .withColumn("sy", sum(col("cents")).over(f))
      .withColumn("qy", sum(col("cents") * col("cents")).over(f))
      .filter(col("x") >= 8)
      .withColumn("lhs",
        (col("n") * col("cents") - col("sy")) *
          (col("n") * col("cents") - col("sy")))
      .withColumn("rhs",
        lit(4L) * (col("n") * col("qy") - col("sy") * col("sy")))
      .withColumn("is_outlier", (col("lhs") > col("rhs")).cast("long"))
      .select(col("event_id"), col("user_id"), col("cents"), col("lhs"),
        col("rhs"), col("is_outlier"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  /** Rolling argmax over each user's trailing-5 frame WITHOUT an argmax
    * window primitive: the (value, tiebreak) pair packs into one BIGINT
    * — key = cents·10⁹ + (10⁹−1−event_id) — so plain windowed max()
    * means "largest value, ties to the smallest event id", and the
    * winner's value and identity unpack arithmetically from the max.
    * The same trick every argmin/argmax-under-window needs on engines
    * whose max_by has no frame form; exact while event ids stay below
    * 10⁹ (they are dense indexes here — guarded in the spec). Constant
    * work per row, the trailing-frame family's scale contract.
    *
    * Data contract, enforced in-plan: cents ≥ 0. Both engines' integer
    * division truncates toward zero (verified: DuckDB `-7 // 2 = -3`,
    * same as Spark div), so div itself agrees on negatives — but the
    * pack key `cents·10⁹ + tiebreak` is only ORDER-PRESERVING for
    * non-negative cents, so negative cents are filtered out here AND in
    * the oracle rather than assumed away. */
  def winArgmax(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(-4, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") % 17 === 0)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("cents",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .filter(col("cents") >= 0)
      .withColumn("mk",
        max(expr("cents * 1000000000 + (999999999 - event_id)")).over(w))
      .select(col("event_id"), col("user_id"), col("cents"),
        expr("mk div 1000000000").as("max_cents"),
        expr("999999999 - mk % 1000000000").as("argmax_event_id"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  /** cume_dist + ratio-to-report in one pass: per market segment, each
    * customer's cumulative balance-distribution position (cume_dist is
    * rows≤current/rows — an exact rational, so the double is
    * deterministic with no rounding) and their share of the segment's
    * total balance in integer permille (balances → exact cents first;
    * a double segment SUM would be shuffle-order-dependent, the
    * classic parallel-sum trap). */
  def winCumedist(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment")).orderBy(col("cents").asc)
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment"))
    Tables.customer(s, d)
      .withColumn("cents", expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("seg_cents", sum(col("cents")).over(ws))
      .withColumn("share_pm", expr("cents * 1000 div seg_cents"))
      .select(col("c_custkey"), col("c_mktsegment"), col("cents"),
        col("cd"), col("share_pm"))
      .orderBy(col("c_mktsegment").asc, col("cents").asc, col("c_custkey").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_cumedist" -> winCumedist,
    "q_win_argmax"       -> winArgmax,
    "q_win_outlier"      -> winOutlier,
    "q_win_slope"        -> winSlope,
    "q_win_median"       -> winMedian,
    "q_win_distinct"     -> winDistinct,
    "q_win_ewma"         -> winEwma,
    "q_win_firstlast"    -> winFirstLast,
    "q_win_ntile_approx" -> winNtileApprox,
    "q_win_ntile_hist"  -> winNtileHist,
    "q_win_ntile_exact2" -> winNtileExact2,
    "q_win_rank"        -> winRank,
    "q_win_running"     -> winRunning,
    "q_win_lag"         -> winLag,
    "q_win_range_frame" -> winRangeFrame,
    "q_win_ntile"       -> winNtile,
    "q_win_pctrank"     -> winPctRank
  )

  val oracle: Map[String, String] = Map(
    // Exact replay of the histogram-quantile pipeline: $50-cent bins,
    // cumulative counts over the BIN table, cutoffs = smallest bin with
    // cum*4 >= q*total, CASE assignment. All-integer (// and div both
    // truncate toward zero, incl. negative balances).
    "q_win_ntile_hist" ->
      """WITH b AS (
        |  SELECT c_custkey, c_acctbal,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000 AS bin
        |  FROM customer),
        |h AS (
        |  SELECT bin, count(*) AS n FROM b GROUP BY 1),
        |cumt AS (
        |  SELECT bin, sum(n) OVER (ORDER BY bin ASC
        |                           ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM h),
        |t AS (SELECT sum(n) AS total FROM h),
        |k AS (
        |  SELECT min(CASE WHEN cum * 4 >= 1 * total THEN bin END) AS cut1,
        |         min(CASE WHEN cum * 4 >= 2 * total THEN bin END) AS cut2,
        |         min(CASE WHEN cum * 4 >= 3 * total THEN bin END) AS cut3
        |  FROM cumt, t),
        |a AS (
        |  SELECT b.c_acctbal,
        |         CAST(CASE WHEN bin <= cut1 THEN 1 WHEN bin <= cut2 THEN 2
        |              WHEN bin <= cut3 THEN 3 ELSE 4 END AS BIGINT) AS quartile
        |  FROM b, k)
        |SELECT quartile, count(*) AS n,
        |       round(min(c_acctbal), 2) AS lo,
        |       round(max(c_acctbal), 2) AS hi
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_win_cumedist" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer)
        |SELECT c_custkey, c_mktsegment, cents,
        |       cume_dist() OVER (PARTITION BY c_mktsegment
        |                         ORDER BY cents ASC) AS cd,
        |       CAST(cents * 1000 // sum(cents) OVER (PARTITION BY c_mktsegment)
        |         AS BIGINT) AS share_pm
        |FROM c
        |ORDER BY c_mktsegment ASC, cents ASC, c_custkey ASC""".stripMargin,
    "q_win_outlier" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE user_id % 17 = 0),
        |r AS (
        |  SELECT event_id, user_id, cents,
        |         CAST(row_number() OVER w AS BIGINT) AS x,
        |         count(*) OVER fr AS n,
        |         CAST(sum(cents) OVER fr AS BIGINT) AS sy,
        |         CAST(sum(cents * cents) OVER fr AS BIGINT) AS qy
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC),
        |         fr AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |                ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, cents,
        |       (n * cents - sy) * (n * cents - sy) AS lhs,
        |       4 * (n * qy - sy * sy) AS rhs,
        |       CAST(CASE WHEN (n * cents - sy) * (n * cents - sy)
        |                    > 4 * (n * qy - sy * sy)
        |            THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        |FROM r WHERE x >= 8
        |ORDER BY user_id ASC, event_id ASC""".stripMargin,
    "q_win_argmax" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE user_id % 17 = 0),
        |m AS (
        |  SELECT event_id, user_id, cents,
        |         max(cents * 1000000000 + (999999999 - event_id))
        |           OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mk
        |  FROM e WHERE cents >= 0)
        |SELECT event_id, user_id, cents,
        |       CAST(mk // 1000000000 AS BIGINT) AS max_cents,
        |       CAST(999999999 - mk % 1000000000 AS BIGINT) AS argmax_event_id
        |FROM m
        |ORDER BY user_id ASC, event_id ASC""".stripMargin,
    "q_win_slope" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE user_id % 17 = 0),
        |r AS (
        |  SELECT event_id, user_id, cents,
        |         CAST(row_number() OVER w AS BIGINT) AS x
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)),
        |f AS (
        |  SELECT event_id, user_id, x,
        |         count(*) OVER fr AS n,
        |         sum(x) OVER fr AS sx,
        |         sum(cents) OVER fr AS sy,
        |         sum(x * cents) OVER fr AS sxy,
        |         sum(x * x) OVER fr AS sxx
        |  FROM r
        |  WINDOW fr AS (PARTITION BY user_id ORDER BY x ASC
        |                ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, x,
        |       CAST(n * sxy - sx * sy AS BIGINT) AS num,
        |       CAST(n * sxx - sx * sx AS BIGINT) AS den,
        |       CAST(n * sxy - sx * sy AS DOUBLE)
        |         / (n * sxx - sx * sx) AS slope
        |FROM f
        |WHERE x >= 8
        |ORDER BY user_id ASC, x ASC""".stripMargin,
    "q_win_median" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE user_id % 17 = 0),
        |f AS (
        |  SELECT event_id, user_id, cents,
        |         list_sort(list(cents) OVER w) AS fr,
        |         len(list(cents) OVER w) AS k
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |         ORDER BY us ASC, event_id ASC
        |         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, cents, CAST(k AS BIGINT) AS k,
        |       fr[(k + 1) // 2] + fr[k // 2 + 1] AS med_x2
        |FROM f
        |ORDER BY user_id ASC, event_id ASC""".stripMargin,
    "q_win_distinct" ->
      """SELECT event_id, user_id,
        |       count(DISTINCT event_type) OVER (
        |         PARTITION BY user_id
        |         ORDER BY epoch_us(ts) ASC, event_id ASC
        |         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS d_types
        |FROM events
        |WHERE user_id % 17 = 0
        |ORDER BY user_id ASC, event_id ASC""".stripMargin,
    "q_win_ewma" ->
      s"""WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE user_id % 17 = 0)
        |SELECT event_id, user_id, cents,
        |       ${ewmaTerms(j => s"lag(cents, $j) OVER w")} AS ewma_scaled,
        |       CAST(least(row_number() OVER w, 8) AS BIGINT) AS n_terms
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
        |ORDER BY user_id ASC, event_id ASC""".stripMargin,
    "q_win_firstlast" ->
      """SELECT o_orderkey, o_orderpriority, first_key, last_key, second_key
        |FROM (
        |  SELECT o_orderkey, o_orderpriority,
        |         first_value(o_orderkey) OVER w AS first_key,
        |         last_value(o_orderkey)  OVER w AS last_key,
        |         nth_value(o_orderkey, 2) OVER w AS second_key
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_orderdate ASC, o_orderkey ASC
        |               ROWS BETWEEN UNBOUNDED PRECEDING
        |                        AND UNBOUNDED FOLLOWING))
        |WHERE o_orderkey % 100 = 0
        |ORDER BY o_orderkey ASC""".stripMargin,
    "q_win_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER w AS rn,
        |         rank()       OVER w AS rnk,
        |         dense_rank() OVER w AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey ASC)
        |) WHERE rn <= 3
        |ORDER BY o_custkey ASC, rn ASC""".stripMargin,
    "q_win_running" ->
      """SELECT event_id, user_id,
        |       round(sum(value) OVER w, 2) AS run_sum,
        |       count(*) OVER w AS run_cnt
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id ASC""".stripMargin,
    "q_win_lag" ->
      """SELECT event_id, user_id,
        |       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
        |       lead(event_id) OVER w AS next_event_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY event_id ASC""".stripMargin,
    "q_win_range_frame" ->
      """SELECT event_id, event_type,
        |       epoch_us(ts) // 1000000 AS epoch_s,
        |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |            OVER w AS BIGINT) AS trail_cents,
        |       count(*) OVER w AS trail_cnt,
        |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |            OVER w AS BIGINT)::DOUBLE / 100
        |         / (count(*) OVER w) AS trail_avg
        |FROM events
        |WINDOW w AS (PARTITION BY event_type
        |             ORDER BY epoch_us(ts) // 1000000 ASC
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id ASC""".stripMargin,
    "q_win_pctrank" ->
      """SELECT c_custkey, c_mktsegment,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey ASC""".stripMargin,
    "q_win_ntile" ->
      """SELECT c_custkey, c_acctbal,
        |       ntile(4) OVER ord AS quartile,
        |       first_value(c_acctbal) OVER run AS run_min_bal,
        |       last_value(c_acctbal)  OVER run AS run_max_bal
        |FROM customer
        |WINDOW ord AS (ORDER BY c_acctbal ASC, c_custkey ASC),
        |       run AS (ORDER BY c_acctbal ASC, c_custkey ASC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY c_custkey ASC""".stripMargin,
    // Deliberately the SAME oracle as q_win_ntile: the two-pass
    // range-partitioned rank must reproduce the single-window answer
    // bit-for-bit — same columns, same quartile assignment, same
    // running first/last values.
    "q_win_ntile_exact2" ->
      """SELECT c_custkey, c_acctbal,
        |       ntile(4) OVER ord AS quartile,
        |       first_value(c_acctbal) OVER run AS run_min_bal,
        |       last_value(c_acctbal)  OVER run AS run_max_bal
        |FROM customer
        |WINDOW ord AS (ORDER BY c_acctbal ASC, c_custkey ASC),
        |       run AS (ORDER BY c_acctbal ASC, c_custkey ASC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY c_custkey ASC""".stripMargin
  )
}
