package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{window => twindow, _}
import graft.Tables

/** Event-time windowing semantics, batch-checkable (SURVEY.md §2.10).
  *
  * These use Spark's `window()` / lag+cumsum session algebra in batch mode;
  * `graft.streaming.StreamingDemo` runs the same tumbling aggregation as a
  * Structured Streaming query with a watermark, and the stream-batch parity
  * test asserts the results agree. Window starts are projected to epoch
  * seconds (flat integer columns) — never raw struct/timestamp outputs.
  * Monetary sums aggregate exact integer cents; the derived double is an
  * integer-fed division, bit-identical across engines.
  */
object Events {

  private def centsCol = expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")

  /** 1-hour tumbling windows per event_type. */
  def evtTumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("cents", centsCol)
      .groupBy(twindow(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_cents"))
      .withColumn("ws", unix_timestamp(col("window.start")))
      .withColumn("sum_val", col("sum_cents").cast("double") / lit(100))
      .select(col("ws"), col("event_type"), col("cnt"), col("sum_cents"),
        col("sum_val"))
      .orderBy(col("ws").asc, col("event_type").asc)

  /** 1-hour windows sliding every 30 minutes: each event lands in exactly
    * two windows; the oracle is the two offset tumbling grids UNION ALL. */
  def evtSliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(twindow(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("ws", unix_timestamp(col("window.start")))
      .select(col("ws"), col("cnt"))
      .orderBy(col("ws").asc)

  /** 30-minute-gap sessionization per user via lag → gap flag → cumulative
    * sum (the batch-oracled algebra; `session_window()` is exercised in the
    * streaming test where no SQL oracle exists). */
  def evtSession(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("epoch_s", expr("unix_micros(ts) div 1000000"))
      .withColumn("gap_s",
        col("epoch_s") - lag(col("epoch_s"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
      .withColumn("sess_seq",
        sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("epoch_s")).as("start_s"),
        max(col("epoch_s")).as("end_s"))
      .withColumn("dur_s", col("end_s") - col("start_s"))
      .orderBy(col("user_id").asc, col("sess_seq").asc)
  }

  /** Ordered conversion funnel view → click → purchase: a user advances a
    * stage only with a strictly-later event of the next type (min-timestamp
    * per stage, each gated on the previous stage's time). Pure
    * aggregate-then-join algebra — each stage is one grouped min plus one
    * equi-join against the (shrinking) prior stage, so the whole funnel
    * partitions by user_id with no window over the raw stream. */
  def evtFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).withColumn("us", expr("unix_micros(ts)"))
    def stage(typ: String) = ev.filter(col("event_type") === typ)
    val v = stage("view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val c = stage("click").join(v, "user_id")
      .filter(col("us") > col("v_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val p = stage("purchase").join(c, "user_id")
      .filter(col("us") > col("c_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    v.select(lit("1_view").as("stage"), col("user_id"))
      .union(c.select(lit("2_click").as("stage"), col("user_id")))
      .union(p.select(lit("3_purchase").as("stage"), col("user_id")))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage").asc)
  }

  /** TIME-BOUND conversion funnel: view → click within 1 h → purchase
    * within 1 h of that click — the recency-gated metric real funnels
    * report (q_evt_funnel is the unbounded variant). Same
    * aggregate-then-join algebra: each stage is one grouped min over
    * candidates gated on the prior stage's time AND the window, so the
    * whole funnel stays partitioned by user with no window over the raw
    * stream. All time arithmetic in integer µs. */
  def evtFunnelWindow(s: SparkSession, d: String): DataFrame = {
    val HourUs = 3600000000L
    val ev = Tables.events(s, d).withColumn("us", expr("unix_micros(ts)"))
    def stage(typ: String) = ev.filter(col("event_type") === typ)
    val v = stage("view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val c = stage("click").join(v, "user_id")
      .filter(col("us") > col("v_us") && col("us") - col("v_us") <= HourUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val p = stage("purchase").join(c, "user_id")
      .filter(col("us") > col("c_us") && col("us") - col("c_us") <= HourUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    v.select(lit("1_view").as("stage"), col("user_id"))
      .union(c.select(lit("2_click_1h").as("stage"), col("user_id")))
      .union(p.select(lit("3_purchase_1h").as("stage"), col("user_id")))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage").asc)
  }

  /** Latest-record resolution per key (the SCD/"current state" pattern):
    * argmax by (ts, event_id) via one ranked window — the canonical
    * replacement for dropDuplicates("user_id") whose survivor is
    * partition-order dependent. WindowGroupLimit pushes the rn=1 filter
    * below the shuffle. */
  def evtLatest(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("ts_us"))
      .orderBy(col("user_id").asc)
  }

  /** Time-series gap fill + forward fill: densify per-type daily counts
    * onto the full observed calendar (sequence of days from one tiny
    * global agg, cross-joined with the 5-row type dim — both broadcast),
    * left-join the real daily aggregates, then zero-fill counts and
    * carry the last observed daily cents forward. The dense grid is
    * |days|×|types| — calendar-sized, never event-sized — and the only
    * shuffle over events is the daily pre-aggregation; at 100 TB the
    * grid join stays a broadcast no matter how the fact grows. */
  def tsGapfill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("day", to_date(col("ts")))
      .withColumn("cents", centsCol)
    val daily = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt_raw"), sum(col("cents")).as("cents_raw"))
    val cal = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val types = ev.select(col("event_type")).distinct()
    val ffill = Window.partitionBy(col("event_type"))
      .orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.crossJoin(broadcast(types))
      .join(daily, Seq("event_type", "day"), "left")
      .withColumn("cnt", coalesce(col("cnt_raw"), lit(0L)))
      .withColumn("carried_cents",
        coalesce(last(col("cents_raw"), ignoreNulls = true).over(ffill), lit(0L)))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("d"),
        col("cnt"), col("carried_cents"))
      .orderBy(col("event_type").asc, col("d").asc)
  }

  /** Daily new-vs-returning user split — the growth dashboard's first
    * row: per day, distinct active users, how many were first seen that
    * day, and the returning share in permille. First-seen day is a
    * min-agg on the user key joined back to the distinct (user, day)
    * activity grid — two shuffles on the user key, grid-sized output.
    * Integer epoch days throughout. */
  def evtNewReturning(s: SparkSession, d: String): DataFrame = {
    val act = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
    act.join(first, "user_id")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("day") === col("d0"), 1L).otherwise(0L)).as("n_new"))
      .withColumn("returning_pm",
        expr("(n_users - n_new) * 1000 div n_users"))
      .orderBy(col("day").asc)
  }

  /** Event debouncing — the telemetry-ingest dedup every high-volume
    * pipeline runs before sessionization (throttling shape: repeat
    * notifications suppressed): within each (user, type) stream, a row
    * is dropped when it lands < 1 h after the PREVIOUS row (lag-based
    * debounce — each row compares to its physical
    * predecessor, not to the last KEPT row, so the rule is expressible
    * as one window lag with no running state). Integer µs gaps; the
    * (ts, event_id) order key makes ties deterministic. One shuffle on
    * the (user, type) key; audit output per type. */
  def evtDebounce(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .withColumn("kept",
        when(col("gap_us").isNull || col("gap_us") >= 3600000000L, 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"))
      .withColumn("kept_pm", expr("n_kept * 1000 div n_total"))
      .orderBy(col("event_type").asc)
  }

  /** Deterministic A/B experiment analysis: arm assignment by the md5
    * last-hex-digit parity of user_id (the stable hash bucketing every
    * experimentation platform uses — reassignment-proof across engines
    * and reruns), conversion = user fired ≥1 purchase event. Per-arm
    * user and converter counts with exact permille conversion — the
    * readout every growth team runs daily. Distinct-users then
    * conditional agg: two shuffles on the user key, both map-combined. */
  def evtAbtest(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
      .withColumn("arm",
        when((expr("instr('0123456789abcdef', substring(md5(CAST(user_id AS STRING)), 32, 1))") - 1) % 2 === 0,
          "A").otherwise("B"))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
      .withColumn("conv_pm", expr("n_conv * 1000 div n_users"))
      .orderBy(col("arm").asc)

  /** Peak concurrency by sweep-line — the "max simultaneous sessions"
    * metric, computed the classical way: every activity interval
    * (event start, start + 5 min, truncated at midnight so a day is
    * self-contained) emits a +1 boundary at its start and a −1 at its
    * end; the running sum of boundaries in time order is the live
    * concurrency, and its per-(type, day) max is the answer. Starts
    * sort before ends at the same µs (delta desc), so touching
    * intervals count as overlapping — the inclusive convention. The
    * running sum partitions by (event_type, day): bounded windows, no
    * global time sort; at 100 TB the same plan fans out across
    * (type, day) partitions. */
  def evtConcurrency(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("day", expr("us div 86400000000"))
      .withColumn("end_us",
        least(col("us") + 300000000L, (col("day") + 1L) * 86400000000L))
    val bounds = ev.select(col("event_type"), col("day"), col("us").as("t"),
        lit(1L).as("delta"))
      .unionByName(ev.select(col("event_type"), col("day"),
        col("end_us").as("t"), lit(-1L).as("delta")))
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("t").asc, col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds.withColumn("live", sum(col("delta")).over(w))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("live")).as("peak"), count(lit(1)).as("n_bounds"))
      .orderBy(col("event_type").asc, col("day").asc)
  }

  /** Weekday×hour activity heatmap — the ops-dashboard staple. Both
    * axes derive by pure integer epoch arithmetic (Monday-0 dow =
    * (epoch_day + 3) mod 7, hour = µs div 3600000000 mod 24 — the same
    * discipline as q_evt_dow; never date_part, whose week-start
    * convention differs between engines). One grouped pass, 168-row
    * output. */
  def evtHeatmap(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("dow",
        expr("(unix_micros(ts) div 86400000000 + 3) % 7"))
      .withColumn("hod",
        expr("unix_micros(ts) div 3600000000 % 24"))
      .groupBy(col("dow"), col("hod"))
      .agg(count(lit(1)).as("n_events"),
        sum(centsCol).as("sum_cents"))
      .orderBy(col("dow").asc, col("hod").asc)

  /** Cohort lifetime value — q_evt_retention's revenue twin: per
    * (first-seen-week cohort, week offset), purchase cents that week AND
    * the running cumulative (the LTV curve every growth team plots).
    * Same two-pass shape as retention — cohort assignment is a min-agg
    * on the user key, the rollup groups the enriched purchases — plus
    * one dimension-sized window for the cumulative. Exact integer cents;
    * week indices by integer µs division. */
  def evtLtv(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("w", expr("unix_micros(ts) div 604800000000"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("w")).as("w0"))
    val cum = Window.partitionBy(col("cohort_week"))
      .orderBy(col("week_offset").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.filter(col("event_type") === "purchase")
      .withColumn("cents", centsCol)
      .join(cohort, "user_id")
      .groupBy(col("w0").as("cohort_week"),
        (col("w") - col("w0")).as("week_offset"))
      .agg(sum(col("cents")).as("week_cents"),
        countDistinct(col("user_id")).as("payers"))
      .withColumn("cum_cents", sum(col("week_cents")).over(cum))
      .orderBy(col("cohort_week").asc, col("week_offset").asc)
  }

  /** Pareto / cumulative-share curve — "the top decile of users produces
    * X% of events": users ranked by volume, bucketed into integer-exact
    * deciles ((rn−1)·10 div n + 1 — no ntile, whose Spark/DuckDB tie
    * behavior needn't agree), per-decile and cumulative shares in
    * permille. The windows run over the per-user AGGREGATE (user-count-
    * sized, not event-sized) — the same scale contract as q_win_ntile's
    * caveat: at billions of users the exact curve needs the approx-
    * quantile path (q_win_ntile_approx), this declared query is the
    * exact dimension-sized report. */
  def evtPareto(s: SparkSession, d: String): DataFrame = {
    val byCnt = Window.orderBy(col("cnt").desc, col("user_id").asc)
    val perUser = Tables.events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(byCnt).cast("long"))
    val deciled = perUser
      .crossJoin(broadcast(perUser.agg(count(lit(1)).as("n_users"),
        sum(col("cnt")).as("n_events"))))
      .withColumn("decile", expr("(rn - 1) * 10 div n_users + 1"))
      .groupBy(col("decile"), col("n_events"))
      .agg(count(lit(1)).as("n_users_d"), sum(col("cnt")).as("events_d"))
    val byDec = Window.orderBy(col("decile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciled
      .withColumn("cum_events", sum(col("events_d")).over(byDec))
      .withColumn("share_pm", expr("events_d * 1000 div n_events"))
      .withColumn("cum_share_pm", expr("cum_events * 1000 div n_events"))
      .select(col("decile"), col("n_users_d"), col("events_d"),
        col("share_pm"), col("cum_share_pm"))
      .orderBy(col("decile").asc)
  }

  /** Velocity rule — the fraud/rate-limit primitive: per purchase, how
    * many purchases the same user made in the trailing 10 minutes
    * (inclusive), flagged when the burst exceeds 3. A rangeBetween frame
    * on integer epoch-seconds — event-count in a TIME window, which a
    * rows frame cannot express; one shuffle on the user key. Only flagged
    * rows are emitted (the alert stream, not the event stream). */
  def evtVelocity(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es").asc)
      .rangeBetween(-600L, Window.currentRow)
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .withColumn("es", expr("unix_micros(ts) div 1000000"))
      .withColumn("burst", count(lit(1)).over(w))
      .filter(col("burst") > 3)
      .select(col("user_id"), col("event_id"), col("es"), col("burst"))
      .orderBy(col("user_id").asc, col("es").asc, col("event_id").asc)
  }

  /** Inter-event gap distribution: per-user sequential gaps bucketed
    * into capped 10-minute bands — the latency/cadence histogram behind
    * session-gap threshold tuning (pick the valley, set the session
    * gap). One window pass for the lag, one dimension-sized grouped
    * count; gaps and buckets are exact integer µs/band arithmetic. */
  def evtGapDist(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(byUser))
      .filter(col("gap_us").isNotNull)
      .withColumn("bucket", least(expr("gap_us div 600000000"), lit(12L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"))
      .orderBy(col("bucket").asc)
  }

  /** Week-over-week leaderboard movement: rank event types by weekly
    * volume, then each type's rank delta vs the previous week (positive
    * = climbed). Two cheap windows over the weeks×types aggregate — the
    * corpus-sized work is the single grouped count; everything after is
    * dimension-sized. Weeks are exact integer epoch-µs divisions, ranks
    * are row_number with the (count desc, type asc) total tie order, so
    * the trend report is hash-exact. */
  def evtRankDelta(s: SparkSession, d: String): DataFrame = {
    val byWeek = Window.partitionBy(col("week"))
      .orderBy(col("cnt").desc, col("event_type").asc)
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("week").asc)
    Tables.events(s, d)
      .withColumn("week", expr("unix_micros(ts) div 604800000000"))
      .groupBy(col("week"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(byWeek).cast("long"))
      .withColumn("prev_rnk", lag(col("rnk"), 1).over(byType))
      .withColumn("delta", col("prev_rnk") - col("rnk"))
      .select(col("week"), col("event_type"), col("cnt"), col("rnk"),
        col("prev_rnk"), col("delta"))
      .orderBy(col("week").asc, col("rnk").asc)
  }

  /** Linear interpolation of interior gaps in the hourly series — the
    * complement of q_ts_gapfill's forward-fill: missing hours between two
    * observations take the line between them, in exact integer
    * milli-cents ((prev·(nh−h) + next·(h−ph))·1000 div (nh−ph); all terms
    * non-negative, so truncating division agrees across engines). Only
    * interior gaps of ≤6 missing hours fill — interpolating across a long
    * outage fabricates data, and the bound also caps the explode at 6
    * rows per observed gap. Plan shape: one hourly pre-aggregation over
    * the fact, then windows + a bounded generator over the hourly
    * series, which is calendar-sized, never event-sized. */
  def tsInterp(s: SparkSession, d: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type")).orderBy(col("hr").asc)
    val obs = Tables.events(s, d)
      .withColumn("hr", expr("unix_micros(ts) div 3600000000"))
      .withColumn("cents", centsCol)
      .groupBy(col("event_type"), col("hr"))
      .agg(sum(col("cents")).as("cents"))
      .withColumn("nhr", lead(col("hr"), 1).over(byType))
      .withColumn("ncents", lead(col("cents"), 1).over(byType))
    val observed = obs.select(col("event_type"), col("hr"),
      lit("obs").as("src"), (col("cents") * 1000L).as("value_milli"))
    val interp = obs
      .filter(col("nhr").isNotNull &&
        col("nhr") - col("hr") > 1 && col("nhr") - col("hr") <= 7)
      .select(col("event_type"), col("hr"), col("nhr"), col("cents"),
        col("ncents"), explode(expr("sequence(hr + 1, nhr - 1)")).as("h"))
      .select(col("event_type"), col("h").as("hr"), lit("interp").as("src"),
        expr("(cents * (nhr - h) + ncents * (h - hr)) * 1000 div (nhr - hr)")
          .as("value_milli"))
    observed.union(interp)
      .orderBy(col("event_type").asc, col("hr").asc)
  }

  /** SCD-2 interval construction from an event stream: per user, collapse
    * consecutive same-type runs to change points, then stamp each with
    * [valid_from, valid_to) via lead() — valid_to NULL marks the current
    * version. The whole history is two window passes over one shuffle on
    * the business key; MERGE-less and deterministic (µs + event_id tie
    * order, same discipline as q_evt_latest). Modulus bounds the declared
    * output; the plan shape is key-count independent. */
  def evtScd2(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    Tables.events(s, d)
      .filter(col("user_id") % 17 === 0)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(byUser))
      .withColumn("valid_to_us", lead(col("us"), 1).over(byUser))
      .select(col("user_id"), col("version").cast("long").as("version"),
        col("event_type"), col("us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.cast("int").as("is_current"))
      .orderBy(col("user_id").asc, col("version").asc)
  }

  /** Cohort retention matrix: users grouped by first-seen week (the
    * cohort), counted by how many are active in each later week —
    * THE product-analytics query. Two grouped passes over one shuffle
    * key (user): first-seen week per user (a min agg), then distinct
    * (user, week) activity joined back to its cohort. Cohort and offset
    * are exact integer week indices from epoch-µs division, identical
    * on both engines; retained counts are distinct users, so replays
    * within a week don't inflate retention. */
  def evtRetention(s: SparkSession, d: String): DataFrame = {
    // epoch µs → week index by INTEGER division (div / //): float
    // division + truncation could flip a week boundary by one ulp
    val ev = Tables.events(s, d)
      .withColumn("w", expr("unix_micros(ts) div 604800000000"))
      .select(col("user_id"), col("w"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("w")).as("w0"))
    val active = ev.distinct()
    active.join(cohort, "user_id")
      .groupBy(col("w0").as("cohort_week"),
        (col("w") - col("w0")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("retained"))
      .orderBy(col("cohort_week").asc, col("week_offset").asc)
  }

  /** Longest consecutive-day activity streak per user — gaps-and-islands
    * over the distinct (user, day) grid: within a user, `day − row_number`
    * is constant exactly along a run of consecutive days, so the island
    * key falls out of one window pass with no self-join. The grid is
    * distinct days (≤ calendar×users), orders-of-magnitude smaller than
    * the raw stream, and everything after the dedup partitions by
    * user_id — one shuffle key end to end. Days are exact integer
    * epoch-day indices (µs div), never date arithmetic. */
  def evtStreaks(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
    val days = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val islands = days
      .withColumn("island", col("day") - row_number().over(byUser))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
    // Longest streak per user; ties break to the EARLIEST streak so the
    // survivor is unique (row_number over a total order, never first()).
    val best = Window.partitionBy(col("user_id"))
      .orderBy(col("len").desc, col("start_day").asc)
    islands
      .withColumn("rn", row_number().over(best))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("active_days"),
        count(lit(1)).as("n_streaks"),
        max(when(col("rn") === 1, col("len"))).as("best_streak"),
        max(when(col("rn") === 1, col("start_day"))).as("best_start_day"))
      .orderBy(col("user_id").asc)
  }

  /** Daily-volume anomaly days per event type — a 2σ outlier test run in
    * PURE INTEGER arithmetic: with n days, S = Σx, Q = Σx², the test
    * (x−μ)² > k²σ² rescales by n² to (n·x − S)² > k²(n·Q − S²), all
    * BIGINT — no float mean/stddev to drift between engines. The daily
    * pre-aggregation is the only pass over the stream; the per-type
    * moments are a second agg over calendar-sized data, joined back
    * broadcast-small. The flag rides along for every day (not just
    * outliers) so the declared output can never be empty. */
  def evtAnomaly(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val moments = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("q"))
    daily.join(broadcast(moments), "event_type")
      .withColumn("dev", col("n") * col("cnt") - col("s"))
      .withColumn("is_outlier",
        (col("dev") * col("dev") >
          lit(4L) * (col("n") * col("q") - col("s") * col("s"))).cast("int"))
      .select(col("event_type"), col("day"), col("cnt"), col("is_outlier"))
      .orderBy(col("event_type").asc, col("day").asc)
  }

  /** OHLC downsampling — the timeseries "candlestick" resample: per
    * (event_type, hour), the first and last value in event-time order
    * plus min/max/count/sum. First/last are argmin/argmax with the µs +
    * event_id composite tie order made explicit via two ranked windows
    * over ONE partitioning (a single shuffle, two local sorts) — never
    * first()/last() aggregates, whose result is partition-arrival order,
    * i.e. nondeterministic under retries. Output is calendar-sized
    * (hours × types); values are exact integer cents. */
  def evtOhlc(s: SparkSession, d: String): DataFrame = {
    val part = Seq(col("event_type"), col("hr"))
    val asc = Window.partitionBy(part: _*)
      .orderBy(col("us").asc, col("event_id").asc)
    val desc = Window.partitionBy(part: _*)
      .orderBy(col("us").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("hr", expr("unix_micros(ts) div 3600000000"))
      .withColumn("cents", centsCol)
      .withColumn("ra", row_number().over(asc))
      .withColumn("rd", row_number().over(desc))
      .groupBy(col("event_type"), col("hr"))
      .agg(max(when(col("ra") === 1, col("cents"))).as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max(when(col("rd") === 1, col("cents"))).as("close_cents"),
        count(lit(1)).as("n"),
        sum(col("cents")).as("vol_cents"))
      .orderBy(col("event_type").asc, col("hr").asc)
  }

  /** First-order Markov transition matrix over each user's event stream —
    * the sequence-model feature every behavioral pipeline extracts before
    * training. One lead() over the per-user time order (a single shuffle
    * on user_id, the natural partition key), then a grouped count per
    * (from, to) pair plus the from-state total, so the transition
    * probability ships as the exact integer pair n/from_total instead of
    * a float that could never hash-compare. The (ts, event_id) tiebreak
    * makes the sequence — and therefore every count — engine-identical. */
  def evtMarkov(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val trans = Tables.events(s, d)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type"))
    val totals = trans.groupBy(col("from_type"))
      .agg(count(lit(1)).as("from_total"))
    trans.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("from_total"))
      .orderBy(col("from_type").asc, col("to_type").asc)
  }

  /** Last-touch attribution: each purchase credits the user's most recent
    * click strictly before it and within a 24 h lookback. "Most recent
    * prior click" is a conditional running max over the user's ordered
    * stream (`us` is monotone within the frame, so max(us) IS the latest
    * click) — one window pass over the unified stream, never a
    * purchases×clicks self-join, which is the shape that survives a
    * 100 TB event log. Daily report in exact integer cents. */
  def evtAttribution(s: SparkSession, d: String): DataFrame = {
    val prior = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("cents", centsCol)
      .withColumn("last_click_us",
        max(when(col("event_type") === "click", col("us"))).over(prior))
      .filter(col("event_type") === "purchase")
      .withColumn("attributed",
        col("last_click_us").isNotNull &&
          col("us") - col("last_click_us") <= lit(86400000000L))
      .withColumn("day", expr("us div 86400000000"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("attributed"), 1L).otherwise(0L)).as("n_attributed"),
        sum(when(col("attributed"), col("cents")).otherwise(0L)).as("attr_cents"))
      .orderBy(col("day").asc)
  }

  /** DAU / trailing-7-day WAU / stickiness. The rolling distinct is NOT a
    * windowed count(distinct) over raw events: each distinct (user, day)
    * CONTRIBUTES to the 7 target days whose trailing window covers it
    * (a 7-element sequence explode), which turns the rolling distinct
    * into two plain hash aggregates — linear work, shuffle keyed on
    * (day, user), no per-day re-scan of the log. The grid is restricted
    * to days that actually occur. Stickiness in integer permille. */
  def evtDau(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val dau = days.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = days
      .select(col("user_id"), explode(expr("sequence(day, day + 6)")).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .withColumn("stickiness_pm", expr("(dau * 1000) div wau"))
      .select(col("day"), col("dau"), col("wau"), col("stickiness_pm"))
      .orderBy(col("day").asc)
  }

  /** The BUILT-IN session_window() in batch mode, declared and oracled:
    * per (user, session) event count and session span. Spark's gap
    * semantics — the window is [first_ts, last_ts + gap), sessions merge
    * while the next event starts before the previous window ends — are
    * mirrored by the lag/cumsum algebra in the oracle (a strictly-greater
    * 30-min gap starts a new session; evtSession is the same algebra as a
    * DataFrame plan, and the streaming test pins the two shapes against
    * each other on crafted boundaries). session_window aggregates with
    * one shuffle on the user key, exactly like the manual algebra. */
  def evtSessionNative(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        expr("unix_micros(sw.start) div 1000000").as("start_s"),
        expr("unix_micros(sw.end) div 1000000").as("end_s"),
        col("n_events"))
      .orderBy(col("user_id").asc, col("start_s").asc)

  /** GENERATED calendar-dimension join (the warehouse date-dim pattern):
    * densify the corpus's day span into a dimension with day-of-week and
    * weekend attributes (integer epoch-day arithmetic — day 0 was a
    * Thursday, so Monday-0 dow = (day+3) mod 7), broadcast it, and roll
    * events up by the DIMENSION's attributes. The dim is span-sized
    * (days, not events) no matter how the fact grows — the gapfill
    * grid's sibling for attribute enrichment. */
  def evtDow(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
    val cal = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("day"))
      .withColumn("dow", expr("(day + 3) % 7"))
      .withColumn("is_weekend", (col("dow") >= 5).cast("long"))
    ev.join(broadcast(cal), "day")
      .groupBy(col("dow"), col("is_weekend"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("day")).as("n_days"))
      .orderBy(col("dow").asc)
  }

  /** RFM (recency / frequency / monetary) customer segmentation over the
    * purchase stream — the marketing-analytics staple, in exact integer
    * arithmetic: recency in whole days from the corpus max day (a 1-row
    * broadcast, never a driver-side collect), frequency as purchase
    * count, monetary in cents; fixed integer band edges (no data-driven
    * quantiles → no float boundary), segments rolled up to counts. */
  def evtRfm(s: SparkSession, d: String): DataFrame = {
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .withColumn("cents", centsCol)
    val mx = p.agg(max(col("day")).as("max_day"))
    val per = p.groupBy(col("user_id"))
      .agg(max(col("day")).as("last_day"),
        count(lit(1)).as("freq"),
        sum(col("cents")).as("mon_cents"))
    per.crossJoin(broadcast(mx))
      .withColumn("recency_d", col("max_day") - col("last_day"))
      .withColumn("r_band",
        when(col("recency_d") <= 2, 3L).when(col("recency_d") <= 7, 2L)
          .otherwise(1L))
      .withColumn("f_band",
        when(col("freq") >= 15, 3L).when(col("freq") >= 8, 2L).otherwise(1L))
      .withColumn("m_band",
        when(col("mon_cents") >= 20000, 3L).when(col("mon_cents") >= 10000, 2L)
          .otherwise(1L))
      .groupBy(col("r_band"), col("f_band"), col("m_band"))
      .agg(count(lit(1)).as("n_users"), sum(col("mon_cents")).as("seg_cents"))
      .orderBy(col("r_band").desc, col("f_band").desc, col("m_band").desc)
  }

  /** Top event-type paths (3-step sequences): lead() twice over each
    * user's ordered stream, grouped trigram counts, top-10 — the
    * sequence-mining staple (funnel discovery, next-action modeling).
    * One window shuffle on user_id, one grouped count over 125 possible
    * trigrams. */
  def evtPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy(col("event_type").as("s1"), col("t2").as("s2"), col("t3").as("s3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("s1").asc, col("s2").asc, col("s3").asc)
      .limit(10)
  }

  /** Gini concentration of per-user activity, per event type, in exact
    * integer ppm — the inequality screen behind "is this stream a few
    * power users or a broad base?" (bot detection, source-balance audits
    * for training data). Discrete Gini via the rank-weighted identity
    *   G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx),  x sorted ascending,
    * with the unique (cnt, user_id) tiebreak making the rank — and so
    * the ppm — reproducible anywhere. Chebyshev's sum inequality keeps
    * the numerator ≥ 0, so `div` truncation is engine-identical.
    *
    * Scale: one hash agg to (type, user) counts, a per-type window rank
    * (types are few; within-type sort distributes by range partition),
    * one regroup. No global sort, no collected vectors. */
  def evtGini(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cnt").asc, col("user_id").asc)
    Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"), sum(col("cnt")).as("total_evt"),
        sum(col("i") * col("cnt")).as("wsum"))
      .withColumn("gini_ppm", expr(
        "(2 * wsum - (n_users + 1) * total_evt) * 1000000 div (n_users * total_evt)"))
      .select(col("event_type"), col("n_users"), col("total_evt"),
        col("gini_ppm"))
      .orderBy(col("event_type").asc)
  }

  /** Decile lift/gains table — the model-eval staple, computed on a
    * behavioral score (total activity) against a base rate: users ranked
    * into activity deciles (ntile over n_events desc, user_id tiebreak),
    * each decile's share of above-mean purchasers vs the population rate
    * as integer lift permille. "Above the corpus-wide mean purchases"
    * is the conversion flag because it self-calibrates across scale
    * factors — on this corpus EVERY user purchases (FIXTURES trap), so
    * a has-purchase flag would be constant-true and the table trivial.
    *
    * Scale: the ntile ranks USERS (already one row per user after the
    * first agg) — the q_win_ntile single-task caveat applies to that
    * vocabulary-sized sort, with the same declared remedy
    * (q_win_ntile_approx cutoffs) once users outgrow one task. The
    * 1-row mean is a broadcast cross join, not a driver collect. */
  def evtLift(s: SparkSession, d: String): DataFrame = {
    val per = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purch"))
    val mean = per.agg(
      expr("sum(n_purch) div count(1)").as("mean_purch"))
    per.crossJoin(broadcast(mean))
      .withColumn("heavy",
        when(col("n_purch") > col("mean_purch"), 1L).otherwise(0L))
      .withColumn("decile", ntile(10).over(
        Window.orderBy(col("n_events").desc, col("user_id").asc)).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("heavy")).as("n_heavy"))
      .withColumn("tot_users", sum(col("n_users")).over(Window.partitionBy()))
      .withColumn("tot_heavy", sum(col("n_heavy")).over(Window.partitionBy()))
      .withColumn("heavy_pm", expr("n_heavy * 1000 div n_users"))
      .withColumn("lift_pm",
        expr("n_heavy * tot_users * 1000 div (n_users * tot_heavy)"))
      .select(col("decile"), col("n_users"), col("n_heavy"), col("heavy_pm"),
        col("lift_pm"))
      .orderBy(col("decile").asc)
  }

  /** DAU/MAU stickiness per month in integer permille — the engagement
    * ratio product teams live on: average daily actives over monthly
    * actives, stick_pm = Σdau · 1000 div (active_days · mau). One
    * (user, day) dedup (hash agg — partial aggregation makes this one
    * narrow shuffle of distinct pairs, not raw events), then per-month
    * counts; avg-DAU kept as the exact rational Σdau/n_days inside the
    * single div so no intermediate truncation. count(DISTINCT user) and
    * count(DISTINCT day) share one expand — two distincts is the
    * documented Spark expand-operator cost, fine at month granularity. */
  def evtStickiness(s: SparkSession, d: String): DataFrame = {
    val dd = Tables.events(s, d).select(
        (year(col("ts")) * 12 + month(col("ts")) - 1).cast("long").as("mon"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        col("user_id"))
      .distinct()
    dd.groupBy(col("mon"))
      .agg(count(lit(1)).as("sum_dau"),
        countDistinct(col("day")).as("n_days"),
        countDistinct(col("user_id")).as("mau"))
      .withColumn("stick_pm",
        expr("sum_dau * 1000 div (n_days * mau)"))
      .select(expr("mon div 12").as("y"), expr("mon % 12 + 1").as("m"),
        col("n_days"), col("sum_dau"), col("mau"), col("stick_pm"))
      .orderBy(col("y").asc, col("m").asc)
  }

  /** Behavioral-embedding similarity: each user's event-type count vector
    * is a 5-dim integer embedding of their behavior; cosine between the
    * top-20 most-active users ranks behavioral look-alikes. Dot and
    * squared norms are exact BIGINT sums; the only doubles are two
    * correctly-rounded sqrts and one division, so cosines are
    * bit-identical across engines without rounding. The pair space is
    * bounded by construction (top-20 → 190 pairs) — at corpus scale the
    * same query runs per cohort/segment block, never all-users². */
  def evtTypevec(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val aggCols = types.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")) :+
      count(lit(1)).as("n_total")
    val cnt = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(aggCols.head, aggCols.tail: _*)
    val top = cnt.orderBy(col("n_total").desc, col("user_id").asc).limit(20)
    val dotSql = types.map(t => s"a.n_$t * b.n_$t").mkString(" + ")
    val n2Sql = (p: String) => types.map(t => s"$p.n_$t * $p.n_$t").mkString(" + ")
    top.alias("a").join(top.alias("b"),
        col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("a_id"), col("b.user_id").as("b_id"),
        expr(dotSql).as("dot"),
        expr(n2Sql("a")).as("na2"), expr(n2Sql("b")).as("nb2"))
      .withColumn("cos", col("dot") / (sqrt(col("na2")) * sqrt(col("nb2"))))
      .orderBy(col("cos").desc, col("a_id").asc, col("b_id").asc)
      .limit(20)
  }

  /** Audience-overlap matrix: exact Jaccard between the USER SETS of each
    * event-type pair — the segment-overlap readout behind "do purchasers
    * also click?". Set sizes and intersections are exact integers from
    * one (type, user) dedup + a user-keyed self-join (shuffle key =
    * user_id, never a users² pair space — per-user type fan-out is
    * bounded by the 5-type domain); union arises arithmetically as
    * |A|+|B|−|∩|. 10 rows. */
  def evtOverlap(s: SparkSession, d: String): DataFrame = {
    val tu = Tables.events(s, d)
      .select(col("event_type").as("t"), col("user_id").as("u")).distinct()
    val sz = tu.groupBy(col("t")).agg(count(lit(1)).as("n"))
    val common = tu.alias("a").join(tu.alias("b"),
        col("a.u") === col("b.u") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sz.select(col("t").as("ta"), col("n").as("n_a"))), "ta")
      .join(broadcast(sz.select(col("t").as("tb"), col("n").as("n_b"))), "tb")
      .withColumn("uni", col("n_a") + col("n_b") - col("n_common"))
      .withColumn("jac_pm", expr("n_common * 1000 div uni"))
      .select(col("ta"), col("tb"), col("n_a"), col("n_b"), col("n_common"),
        col("uni"), col("jac_pm"))
      .orderBy(col("ta").asc, col("tb").asc)
  }

  /** Temporal-regularity profile: per-user Herfindahl concentration of
    * activity across the 24 hour-of-day bins, in exact integer ppm
    * (Σc_h² · 10^6 div (Σc)²) — 41,666 ppm ≈ uniform spread, 10^6 = all
    * activity in one hour. Users are then value-banded (10k-ppm bands)
    * with exact min/max/avg — the bot-vs-human regularity screen over
    * event streams. Entirely integer; one (user, hour) count + one
    * per-user rollup, both shuffles keyed by user. */
  def evtHourHhi(s: SparkSession, d: String): DataFrame = {
    val perHour = Tables.events(s, d)
      .groupBy(col("user_id"), hour(col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
    val perUser = perHour.groupBy(col("user_id"))
      .agg(sum(expr("c * c")).as("s2"), sum(col("c")).as("n"))
      .withColumn("hhi_ppm", expr("s2 * 1000000 div (n * n)"))
    perUser.withColumn("band", expr("hhi_ppm div 10000"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_users"), min(col("hhi_ppm")).as("min_ppm"),
        max(col("hhi_ppm")).as("max_ppm"),
        expr("sum(hhi_ppm) div count(1)").as("avg_ppm"))
      .orderBy(col("band").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_evt_hourhhi" -> evtHourHhi,
    "q_evt_overlap" -> evtOverlap,
    "q_evt_typevec" -> evtTypevec,
    "q_evt_stickiness" -> evtStickiness,
    "q_evt_lift"     -> evtLift,
    "q_evt_gini"     -> evtGini,
    "q_evt_dow"      -> evtDow,
    "q_evt_rfm"      -> evtRfm,
    "q_evt_funnel_window" -> evtFunnelWindow,
    "q_evt_session_native" -> evtSessionNative,
    "q_evt_paths"    -> evtPaths,
    "q_evt_attribution" -> evtAttribution,
    "q_evt_dau"      -> evtDau,
    "q_evt_markov"   -> evtMarkov,
    "q_evt_ohlc"     -> evtOhlc,
    "q_evt_streaks"  -> evtStreaks,
    "q_evt_anomaly"  -> evtAnomaly,
    "q_evt_retention" -> evtRetention,
    "q_ts_gapfill"   -> tsGapfill,
    "q_ts_interp"    -> tsInterp,
    "q_evt_rank_delta" -> evtRankDelta,
    "q_evt_gap_dist" -> evtGapDist,
    "q_evt_velocity" -> evtVelocity,
    "q_evt_pareto"   -> evtPareto,
    "q_evt_ltv"      -> evtLtv,
    "q_evt_heatmap"  -> evtHeatmap,
    "q_evt_newret"   -> evtNewReturning,
    "q_evt_debounce" -> evtDebounce,
    "q_evt_abtest"   -> evtAbtest,
    "q_evt_concurrency" -> evtConcurrency,
    "q_evt_scd2"     -> evtScd2,
    "q_evt_latest"   -> evtLatest,
    "q_evt_tumbling" -> evtTumbling,
    "q_evt_sliding"  -> evtSliding,
    "q_evt_session"  -> evtSession,
    "q_evt_funnel"   -> evtFunnel
  )

  val oracle: Map[String, String] = Map(
    // hour() on the µs-truncated ts ≡ DuckDB hour() on its own
    // nanos-truncating read of the same file; all-integer from there.
    "q_evt_hourhhi" ->
      """WITH ph AS (
        |  SELECT user_id, hour(ts) AS h, count(*) AS c
        |  FROM events GROUP BY user_id, hour(ts)),
        |pu AS (
        |  SELECT user_id,
        |         CAST(sum(c * c) AS BIGINT) AS s2,
        |         CAST(sum(c) AS BIGINT) AS n
        |  FROM ph GROUP BY user_id),
        |hh AS (
        |  SELECT user_id, s2 * 1000000 // (n * n) AS hhi_ppm FROM pu)
        |SELECT hhi_ppm // 10000 AS band,
        |       count(*) AS n_users,
        |       CAST(min(hhi_ppm) AS BIGINT) AS min_ppm,
        |       CAST(max(hhi_ppm) AS BIGINT) AS max_ppm,
        |       CAST(sum(hhi_ppm) // count(*) AS BIGINT) AS avg_ppm
        |FROM hh
        |GROUP BY 1
        |ORDER BY band ASC""".stripMargin,
    "q_evt_overlap" ->
      """WITH tu AS (
        |  SELECT DISTINCT event_type AS t, user_id AS u FROM events),
        |sz AS (SELECT t, count(*) AS n FROM tu GROUP BY t),
        |cm AS (
        |  SELECT a.t AS ta, b.t AS tb, count(*) AS n_common
        |  FROM tu a JOIN tu b ON a.u = b.u AND a.t < b.t
        |  GROUP BY a.t, b.t)
        |SELECT cm.ta, cm.tb, sa.n AS n_a, sb.n AS n_b, cm.n_common,
        |       sa.n + sb.n - cm.n_common AS uni,
        |       CAST(cm.n_common * 1000 // (sa.n + sb.n - cm.n_common)
        |         AS BIGINT) AS jac_pm
        |FROM cm JOIN sz sa ON cm.ta = sa.t JOIN sz sb ON cm.tb = sb.t
        |ORDER BY ta ASC, tb ASC""".stripMargin,
    // Same 5-type CASE pivot, same exact-integer dot/norms, same
    // correctly-rounded sqrt — cosine is bit-identical unrounded.
    "q_evt_typevec" ->
      """WITH cnt AS (
        |  SELECT user_id,
        |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |         CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |         count(*) AS n_total
        |  FROM events GROUP BY user_id),
        |top AS (
        |  SELECT * FROM cnt ORDER BY n_total DESC, user_id ASC LIMIT 20)
        |SELECT a.user_id AS a_id, b.user_id AS b_id,
        |       CAST(a.n_click * b.n_click + a.n_error * b.n_error
        |          + a.n_purchase * b.n_purchase + a.n_signup * b.n_signup
        |          + a.n_view * b.n_view AS BIGINT) AS dot,
        |       CAST(a.n_click * a.n_click + a.n_error * a.n_error
        |          + a.n_purchase * a.n_purchase + a.n_signup * a.n_signup
        |          + a.n_view * a.n_view AS BIGINT) AS na2,
        |       CAST(b.n_click * b.n_click + b.n_error * b.n_error
        |          + b.n_purchase * b.n_purchase + b.n_signup * b.n_signup
        |          + b.n_view * b.n_view AS BIGINT) AS nb2,
        |       (a.n_click * b.n_click + a.n_error * b.n_error
        |          + a.n_purchase * b.n_purchase + a.n_signup * b.n_signup
        |          + a.n_view * b.n_view)
        |         / (sqrt(a.n_click * a.n_click + a.n_error * a.n_error
        |          + a.n_purchase * a.n_purchase + a.n_signup * a.n_signup
        |          + a.n_view * a.n_view)
        |          * sqrt(b.n_click * b.n_click + b.n_error * b.n_error
        |          + b.n_purchase * b.n_purchase + b.n_signup * b.n_signup
        |          + b.n_view * b.n_view)) AS cos
        |FROM top a JOIN top b ON a.user_id < b.user_id
        |ORDER BY cos DESC, a_id ASC, b_id ASC
        |LIMIT 20""".stripMargin,
    "q_evt_stickiness" ->
      """WITH dd AS (
        |  SELECT DISTINCT year(ts) * 12 + month(ts) - 1 AS mon,
        |         epoch_us(ts) // 86400000000 AS day, user_id
        |  FROM events),
        |g AS (
        |  SELECT mon, count(*) AS sum_dau,
        |         count(DISTINCT day) AS n_days,
        |         count(DISTINCT user_id) AS mau
        |  FROM dd GROUP BY 1)
        |SELECT CAST(mon // 12 AS BIGINT) AS y,
        |       CAST(mon % 12 + 1 AS BIGINT) AS m,
        |       n_days, sum_dau, mau,
        |       CAST(sum_dau * 1000 // (n_days * mau) AS BIGINT) AS stick_pm
        |FROM g
        |ORDER BY y ASC, m ASC""".stripMargin,
    "q_evt_lift" ->
      """WITH per AS (
        |  SELECT user_id, count(*) AS n_events,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_purch
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(sum(n_purch) // count(*) AS BIGINT) AS mean_purch
        |      FROM per),
        |d AS (
        |  SELECT ntile(10) OVER (ORDER BY n_events DESC, user_id ASC)
        |           AS decile,
        |         CASE WHEN n_purch > (SELECT mean_purch FROM m)
        |              THEN 1 ELSE 0 END AS heavy
        |  FROM per),
        |g AS (
        |  SELECT decile, count(*) AS n_users,
        |         CAST(sum(heavy) AS BIGINT) AS n_heavy
        |  FROM d GROUP BY 1),
        |t AS (
        |  SELECT g.*, CAST(sum(n_users) OVER () AS BIGINT) AS tot_users,
        |         CAST(sum(n_heavy) OVER () AS BIGINT) AS tot_heavy
        |  FROM g)
        |SELECT CAST(decile AS BIGINT) AS decile, n_users, n_heavy,
        |       CAST(n_heavy * 1000 // n_users AS BIGINT) AS heavy_pm,
        |       CAST(n_heavy * tot_users * 1000 // (n_users * tot_heavy)
        |         AS BIGINT) AS lift_pm
        |FROM t
        |ORDER BY decile ASC""".stripMargin,
    "q_evt_gini" ->
      """WITH per AS (
        |  SELECT event_type, user_id, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, cnt,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY cnt ASC, user_id ASC) AS i
        |  FROM per),
        |g AS (
        |  SELECT event_type, count(*) AS n_users,
        |         CAST(sum(cnt) AS BIGINT) AS total_evt,
        |         CAST(sum(i * cnt) AS BIGINT) AS wsum
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_users, total_evt,
        |       CAST((2 * wsum - (n_users + 1) * total_evt) * 1000000
        |            // (n_users * total_evt) AS BIGINT) AS gini_ppm
        |FROM g
        |ORDER BY event_type ASC""".stripMargin,
    "q_evt_concurrency" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |         epoch_us(ts) // 86400000000 AS day,
        |         least(epoch_us(ts) + 300000000,
        |               (epoch_us(ts) // 86400000000 + 1) * 86400000000)
        |           AS end_us
        |  FROM events),
        |b AS (
        |  SELECT event_type, day, us AS t, 1 AS delta FROM ev
        |  UNION ALL
        |  SELECT event_type, day, end_us AS t, -1 AS delta FROM ev),
        |r AS (
        |  SELECT event_type, day,
        |         sum(delta) OVER (PARTITION BY event_type, day
        |           ORDER BY t ASC, delta DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
        |  FROM b)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |       CAST(max(live) AS BIGINT) AS peak,
        |       count(*) AS n_bounds
        |FROM r
        |GROUP BY event_type, day
        |ORDER BY event_type ASC, day ASC""".stripMargin,
    "q_evt_debounce" ->
      """WITH t AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |           PARTITION BY user_id, event_type
        |           ORDER BY epoch_us(ts) ASC, event_id ASC) AS gap_us
        |  FROM events)
        |SELECT event_type, count(*) AS n_total,
        |       CAST(sum(CASE WHEN gap_us IS NULL OR gap_us >= 3600000000
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(sum(CASE WHEN gap_us IS NULL OR gap_us >= 3600000000
        |                     THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
        |         AS kept_pm
        |FROM t
        |GROUP BY event_type
        |ORDER BY event_type ASC""".stripMargin,
    "q_evt_abtest" ->
      """WITH u AS (
        |  SELECT user_id,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS converted,
        |         CASE WHEN (strpos('0123456789abcdef',
        |             substr(md5(CAST(user_id AS VARCHAR)), 32, 1)) - 1) % 2 = 0
        |           THEN 'A' ELSE 'B' END AS arm
        |  FROM events
        |  GROUP BY user_id)
        |SELECT arm, count(*) AS n_users,
        |       CAST(sum(converted) AS BIGINT) AS n_conv,
        |       CAST(sum(converted) * 1000 // count(*) AS BIGINT) AS conv_pm
        |FROM u
        |GROUP BY arm
        |ORDER BY arm ASC""".stripMargin,
    "q_evt_newret" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |         epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |f AS (
        |  SELECT user_id, min(day) AS d0 FROM act GROUP BY user_id)
        |SELECT CAST(day AS BIGINT) AS day,
        |       count(*) AS n_users,
        |       CAST(sum(CASE WHEN day = d0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_new,
        |       CAST((count(*) - sum(CASE WHEN day = d0 THEN 1 ELSE 0 END))
        |         * 1000 // count(*) AS BIGINT) AS returning_pm
        |FROM act JOIN f USING (user_id)
        |GROUP BY day
        |ORDER BY day ASC""".stripMargin,
    "q_evt_heatmap" ->
      """SELECT (epoch_us(ts) // 86400000000 + 3) % 7 AS dow,
        |       epoch_us(ts) // 3600000000 % 24 AS hod,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |         AS BIGINT) AS sum_cents
        |FROM events
        |GROUP BY dow, hod
        |ORDER BY dow ASC, hod ASC""".stripMargin,
    "q_evt_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |         epoch_us(ts) // 604800000000 AS w,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, min(w) AS w0 FROM ev GROUP BY user_id),
        |g AS (
        |  SELECT CAST(w0 AS BIGINT) AS cohort_week,
        |         CAST(w - w0 AS BIGINT) AS week_offset,
        |         CAST(sum(cents) AS BIGINT) AS week_cents,
        |         count(DISTINCT ev.user_id) AS payers
        |  FROM ev JOIN cohort USING (user_id)
        |  WHERE event_type = 'purchase'
        |  GROUP BY cohort_week, week_offset)
        |SELECT cohort_week, week_offset, week_cents, payers,
        |       CAST(sum(week_cents) OVER (PARTITION BY cohort_week
        |              ORDER BY week_offset ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS cum_cents
        |FROM g
        |ORDER BY cohort_week ASC, week_offset ASC""".stripMargin,
    "q_evt_pareto" ->
      """WITH pu AS (
        |  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
        |tot AS (
        |  SELECT count(*) AS n_users, CAST(sum(cnt) AS BIGINT) AS n_events
        |  FROM pu),
        |r AS (
        |  SELECT cnt,
        |         CAST(row_number() OVER (ORDER BY cnt DESC, user_id ASC)
        |           AS BIGINT) AS rn
        |  FROM pu),
        |dec AS (
        |  SELECT (rn - 1) * 10 // n_users + 1 AS decile, n_events,
        |         cnt
        |  FROM r CROSS JOIN tot),
        |g AS (
        |  SELECT decile, n_events, count(*) AS n_users_d,
        |         CAST(sum(cnt) AS BIGINT) AS events_d
        |  FROM dec GROUP BY decile, n_events)
        |SELECT CAST(decile AS BIGINT) AS decile, n_users_d, events_d,
        |       CAST(events_d * 1000 // n_events AS BIGINT) AS share_pm,
        |       CAST(sum(events_d) OVER (ORDER BY decile ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            * 1000 // n_events AS BIGINT) AS cum_share_pm
        |FROM g
        |ORDER BY decile ASC""".stripMargin,
    "q_evt_velocity" ->
      """WITH p AS (
        |  SELECT user_id, event_id,
        |         epoch_us(ts) // 1000000 AS es
        |  FROM events WHERE event_type = 'purchase'),
        |b AS (
        |  SELECT user_id, event_id, es,
        |         count(*) OVER (PARTITION BY user_id ORDER BY es ASC
        |                        RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
        |           AS burst
        |  FROM p)
        |SELECT user_id, event_id, CAST(es AS BIGINT) AS es, burst
        |FROM b WHERE burst > 3
        |ORDER BY user_id ASC, es ASC, event_id ASC""".stripMargin,
    "q_evt_gap_dist" ->
      """WITH g AS (
        |  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER
        |           (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
        |           AS gap_us
        |  FROM events)
        |SELECT least(gap_us // 600000000, 12) AS bucket,
        |       count(*) AS n_gaps
        |FROM g
        |WHERE gap_us IS NOT NULL
        |GROUP BY bucket
        |ORDER BY bucket ASC""".stripMargin,
    "q_evt_rank_delta" ->
      """WITH wk AS (
        |  SELECT epoch_us(ts) // 604800000000 AS week, event_type,
        |         count(*) AS cnt
        |  FROM events
        |  GROUP BY week, event_type),
        |r AS (
        |  SELECT week, event_type, cnt,
        |         CAST(row_number() OVER (PARTITION BY week
        |           ORDER BY cnt DESC, event_type ASC) AS BIGINT) AS rnk
        |  FROM wk)
        |SELECT CAST(week AS BIGINT) AS week, event_type, cnt, rnk,
        |       lag(rnk) OVER (PARTITION BY event_type ORDER BY week ASC)
        |         AS prev_rnk,
        |       lag(rnk) OVER (PARTITION BY event_type ORDER BY week ASC)
        |         - rnk AS delta
        |FROM r
        |ORDER BY week ASC, rnk ASC""".stripMargin,
    "q_ts_interp" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |         epoch_us(ts) // 3600000000 AS hr,
        |         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |           AS BIGINT) AS cents
        |  FROM events
        |  GROUP BY event_type, hr),
        |o AS (
        |  SELECT event_type, hr, cents,
        |         lead(hr) OVER w AS nhr,
        |         lead(cents) OVER w AS ncents
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hr ASC)),
        |obs AS (
        |  SELECT event_type, hr, 'obs' AS src,
        |         cents * 1000 AS value_milli
        |  FROM o),
        |gaps AS (
        |  SELECT event_type, hr, nhr, cents, ncents,
        |         unnest(range(hr + 1, nhr)) AS h
        |  FROM o
        |  WHERE nhr IS NOT NULL AND nhr - hr > 1 AND nhr - hr <= 7),
        |interp AS (
        |  SELECT event_type, h AS hr, 'interp' AS src,
        |         (cents * (nhr - h) + ncents * (h - hr)) * 1000 // (nhr - hr)
        |           AS value_milli
        |  FROM gaps)
        |SELECT event_type, CAST(hr AS BIGINT) AS hr, src,
        |       CAST(value_milli AS BIGINT) AS value_milli
        |FROM (SELECT * FROM obs UNION ALL SELECT * FROM interp)
        |ORDER BY event_type ASC, hr ASC""".stripMargin,
    "q_evt_funnel_window" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (
        |  SELECT user_id, min(us) AS v_us FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(us) AS c_us FROM e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE event_type = 'click' AND us > v_us
        |    AND us - v_us <= 3600000000
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(us) AS p_us FROM e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE event_type = 'purchase' AND us > c_us
        |    AND us - c_us <= 3600000000
        |  GROUP BY e.user_id)
        |SELECT stage, CAST(n_users AS BIGINT) AS n_users FROM (
        |  SELECT '1_view' AS stage, count(*) AS n_users FROM v
        |  UNION ALL SELECT '2_click_1h', count(*) FROM c
        |  UNION ALL SELECT '3_purchase_1h', count(*) FROM p)
        |WHERE n_users > 0
        |ORDER BY stage ASC""".stripMargin,
    "q_evt_dow" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day FROM events),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
        |cal AS (
        |  SELECT CAST(unnest(range(lo, hi + 1)) AS BIGINT) AS day FROM b),
        |dim AS (
        |  SELECT day, (day + 3) % 7 AS dow,
        |         CASE WHEN (day + 3) % 7 >= 5 THEN 1 ELSE 0 END AS is_weekend
        |  FROM cal)
        |SELECT CAST(dim.dow AS BIGINT) AS dow,
        |       CAST(dim.is_weekend AS BIGINT) AS is_weekend,
        |       count(*) AS n_events,
        |       CAST(count(DISTINCT e.day) AS BIGINT) AS n_days
        |FROM e JOIN dim ON e.day = dim.day
        |GROUP BY dim.dow, dim.is_weekend
        |ORDER BY dow ASC""".stripMargin,
    "q_evt_rfm" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |mx AS (SELECT max(day) AS max_day FROM p),
        |per AS (
        |  SELECT user_id, max(day) AS last_day,
        |         count(*) AS freq, CAST(sum(cents) AS BIGINT) AS mon_cents
        |  FROM p GROUP BY user_id),
        |b AS (
        |  SELECT CASE WHEN max_day - last_day <= 2 THEN 3
        |              WHEN max_day - last_day <= 7 THEN 2 ELSE 1 END AS r_band,
        |         CASE WHEN freq >= 15 THEN 3
        |              WHEN freq >= 8 THEN 2 ELSE 1 END AS f_band,
        |         CASE WHEN mon_cents >= 20000 THEN 3
        |              WHEN mon_cents >= 10000 THEN 2 ELSE 1 END AS m_band,
        |         mon_cents
        |  FROM per CROSS JOIN mx)
        |SELECT CAST(r_band AS BIGINT) AS r_band,
        |       CAST(f_band AS BIGINT) AS f_band,
        |       CAST(m_band AS BIGINT) AS m_band,
        |       count(*) AS n_users,
        |       CAST(sum(mon_cents) AS BIGINT) AS seg_cents
        |FROM b
        |GROUP BY r_band, f_band, m_band
        |ORDER BY r_band DESC, f_band DESC, m_band DESC""".stripMargin,
    // lag/cumsum mirror of session_window's gap semantics: window start =
    // first event, end = last event + 30 min, new session on gap > 30 min.
    "q_evt_session_native" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |g AS (
        |  SELECT user_id, event_id, us,
        |         CASE WHEN us - lag(us) OVER w IS NULL
        |                OR us - lag(us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)),
        |sess AS (
        |  SELECT user_id, us,
        |         sum(new_sess) OVER (PARTITION BY user_id
        |                             ORDER BY us ASC, event_id ASC
        |                             ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id,
        |       min(us) // 1000000 AS start_s,
        |       (max(us) + 1800000000) // 1000000 AS end_s,
        |       count(*) AS n_events
        |FROM sess
        |GROUP BY user_id, sid
        |ORDER BY user_id ASC, start_s ASC""".stripMargin,
    "q_evt_paths" ->
      """WITH t AS (
        |  SELECT event_type AS s1,
        |         lead(event_type, 1) OVER w AS s2,
        |         lead(event_type, 2) OVER w AS s3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        |SELECT s1, s2, s3, count(*) AS n
        |FROM t
        |WHERE s2 IS NOT NULL AND s3 IS NOT NULL
        |GROUP BY s1, s2, s3
        |ORDER BY n DESC, s1 ASC, s2 ASC, s3 ASC
        |LIMIT 10""".stripMargin,
    // same ROWS BETWEEN ... AND 1 PRECEDING frame as the engine: a click
    // at the SAME µs but smaller event_id counts as "before".
    "q_evt_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(ts) AS us,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |m AS (
        |  SELECT *,
        |         max(CASE WHEN event_type = 'click' THEN us END)
        |           OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS last_click_us
        |  FROM e)
        |SELECT us // 86400000000 AS day,
        |       count(*) AS n_purchases,
        |       CAST(sum(CASE WHEN last_click_us IS NOT NULL
        |                      AND us - last_click_us <= 86400000000
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
        |       CAST(sum(CASE WHEN last_click_us IS NOT NULL
        |                      AND us - last_click_us <= 86400000000
        |                     THEN cents ELSE 0 END) AS BIGINT) AS attr_cents
        |FROM m
        |WHERE event_type = 'purchase'
        |GROUP BY day
        |ORDER BY day ASC""".stripMargin,
    "q_evt_dau" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM days GROUP BY day),
        |contrib AS (
        |  SELECT DISTINCT user_id, day + off AS day
        |  FROM days CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o),
        |wau AS (SELECT day, count(*) AS wau FROM contrib GROUP BY day)
        |SELECT d.day, d.dau, w.wau,
        |       (d.dau * 1000) // w.wau AS stickiness_pm
        |FROM dau d JOIN wau w ON d.day = w.day
        |ORDER BY d.day ASC""".stripMargin,
    "q_evt_markov" ->
      """WITH t AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts ASC, event_id ASC)
        |           AS to_type
        |  FROM events),
        |tr AS (SELECT from_type, to_type FROM t WHERE to_type IS NOT NULL),
        |tot AS (SELECT from_type, count(*) AS from_total
        |        FROM tr GROUP BY from_type)
        |SELECT tr.from_type, to_type, count(*) AS n, from_total
        |FROM tr JOIN tot ON tr.from_type = tot.from_type
        |GROUP BY tr.from_type, to_type, from_total
        |ORDER BY tr.from_type ASC, to_type ASC""".stripMargin,
    "q_evt_ohlc" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |         epoch_us(ts) AS us,
        |         epoch_us(ts) // 3600000000 AS hr,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY event_type, hr
        |                            ORDER BY us ASC, event_id ASC) AS ra,
        |         row_number() OVER (PARTITION BY event_type, hr
        |                            ORDER BY us DESC, event_id DESC) AS rd
        |  FROM e)
        |SELECT event_type, hr,
        |       max(CASE WHEN ra = 1 THEN cents END) AS open_cents,
        |       max(cents) AS high_cents,
        |       min(cents) AS low_cents,
        |       max(CASE WHEN rd = 1 THEN cents END) AS close_cents,
        |       count(*) AS n,
        |       CAST(sum(cents) AS BIGINT) AS vol_cents
        |FROM r
        |GROUP BY event_type, hr
        |ORDER BY event_type ASC, hr ASC""".stripMargin,
    "q_evt_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |         epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |isl AS (
        |  SELECT user_id,
        |         day - row_number() OVER (PARTITION BY user_id
        |                                  ORDER BY day ASC) AS island,
        |         day
        |  FROM days),
        |runs AS (
        |  SELECT user_id, island,
        |         count(*) AS len, min(day) AS start_day
        |  FROM isl GROUP BY user_id, island),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |            ORDER BY len DESC, start_day ASC) AS rn
        |  FROM runs)
        |SELECT user_id,
        |       CAST(sum(len) AS BIGINT) AS active_days,
        |       count(*) AS n_streaks,
        |       CAST(max(CASE WHEN rn = 1 THEN len END) AS BIGINT) AS best_streak,
        |       max(CASE WHEN rn = 1 THEN start_day END) AS best_start_day
        |FROM rk
        |GROUP BY user_id
        |ORDER BY user_id ASC""".stripMargin,
    "q_evt_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         count(*) AS cnt
        |  FROM events GROUP BY event_type, day),
        |m AS (
        |  SELECT event_type, count(*) AS n, sum(cnt) AS s,
        |         sum(cnt * cnt) AS q
        |  FROM daily GROUP BY event_type)
        |SELECT daily.event_type, day, cnt,
        |       CAST((n * cnt - s) * (n * cnt - s) >
        |            4 * (n * q - s * s) AS INT) AS is_outlier
        |FROM daily JOIN m ON daily.event_type = m.event_type
        |ORDER BY daily.event_type ASC, day ASC""".stripMargin,
    "q_evt_retention" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id,
        |         epoch_us(ts) // 604800000000 AS w
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, min(w) AS w0 FROM ev GROUP BY user_id)
        |SELECT w0 AS cohort_week, w - w0 AS week_offset,
        |       CAST(count(DISTINCT ev.user_id) AS BIGINT) AS retained
        |FROM ev JOIN cohort USING (user_id)
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week ASC, week_offset ASC""".stripMargin,
    "q_ts_gapfill" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |daily AS (
        |  SELECT event_type, day, count(*) AS cnt_raw,
        |         CAST(sum(cents) AS BIGINT) AS cents_raw
        |  FROM ev GROUP BY event_type, day),
        |cal AS (
        |  SELECT unnest(generate_series(min(day), max(day),
        |                                INTERVAL 1 DAY))::DATE AS day
        |  FROM ev),
        |types AS (SELECT DISTINCT event_type FROM ev)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS d,
        |       coalesce(cnt_raw, 0) AS cnt,
        |       coalesce(last_value(cents_raw IGNORE NULLS) OVER (
        |         PARTITION BY event_type ORDER BY day ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
        |         AS carried_cents
        |FROM cal CROSS JOIN types
        |LEFT JOIN daily USING (event_type, day)
        |ORDER BY event_type ASC, d ASC""".stripMargin,
    "q_evt_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE user_id % 17 = 0),
        |c AS (
        |  SELECT *, lag(event_type) OVER
        |    (PARTITION BY user_id ORDER BY us ASC, event_id ASC) AS prev_type
        |  FROM e),
        |ch AS (
        |  SELECT * FROM c
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |       CAST(row_number() OVER w AS BIGINT) AS version,
        |       event_type, us AS valid_from_us,
        |       lead(us) OVER w AS valid_to_us,
        |       CAST(lead(us) OVER w IS NULL AS INT) AS is_current
        |FROM ch
        |WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
        |ORDER BY user_id ASC, version ASC""".stripMargin,
    // rank on epoch_us, not raw ts: the parquet carries NANOSECOND
    // timestamps which Spark truncates to µs on read — ranking the oracle
    // by ns-precision ts could pick a different same-µs survivor.
    "q_evt_latest" ->
      """SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id ASC""".stripMargin,
    "q_evt_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (
        |  SELECT user_id, min(us) AS v_us FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(us) AS c_us FROM e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE event_type = 'click' AND us > v_us GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(us) AS p_us FROM e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE event_type = 'purchase' AND us > c_us GROUP BY e.user_id)
        |SELECT stage, CAST(n_users AS BIGINT) AS n_users FROM (
        |  SELECT '1_view' AS stage, count(*) AS n_users FROM v
        |  UNION ALL SELECT '2_click', count(*) FROM c
        |  UNION ALL SELECT '3_purchase', count(*) FROM p)
        |ORDER BY stage ASC""".stripMargin,
    "q_evt_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) // 1000000 AS ws,
        |       event_type,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents,
        |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
        |         / 100 AS sum_val
        |FROM events
        |GROUP BY ws, event_type
        |ORDER BY ws ASC, event_type ASC""".stripMargin,
    "q_evt_sliding" ->
      """SELECT ws, count(*) AS cnt
        |FROM (
        |  SELECT epoch_us(ts) // 1000000
        |         - (epoch_us(ts) // 1000000) % 1800 AS ws FROM events
        |  UNION ALL
        |  SELECT epoch_us(ts) // 1000000
        |         - (epoch_us(ts) // 1000000) % 1800 - 1800 AS ws FROM events)
        |GROUP BY ws
        |ORDER BY ws ASC""".stripMargin,
    "q_evt_session" ->
      """WITH g AS (
        |  SELECT user_id, event_id,
        |         epoch_us(ts) // 1000000 AS epoch_s,
        |         epoch_us(ts) // 1000000
        |           - lag(epoch_us(ts) // 1000000)
        |             OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_s
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM g),
        |sq AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |            ORDER BY epoch_s ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq
        |  FROM f)
        |SELECT user_id, CAST(sess_seq AS BIGINT) AS sess_seq,
        |       count(*) AS n_events,
        |       min(epoch_s) AS start_s, max(epoch_s) AS end_s,
        |       max(epoch_s) - min(epoch_s) AS dur_s
        |FROM sq
        |GROUP BY user_id, sess_seq
        |ORDER BY user_id ASC, sess_seq ASC""".stripMargin
  )
}
