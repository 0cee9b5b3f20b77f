package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Learned-model and time-series analytics: closed-form regression,
  * generative classification, autocorrelation, and change-point
  * detection — the "fit a tiny model over a huge corpus" family a
  * training-data pipeline runs for curriculum/mixture decisions.
  *
  * Shared design rule (the repo-wide sufficient-statistics discipline):
  * the corpus-scale stage only ever computes BOUNDED sufficient
  * statistics (per-bin sums, per-(lang,token) counts, per-day counts)
  * with map-side combine; the model math then runs on that bounded
  * set in exact integer micro-units, so results hash-match the DuckDB
  * oracle at any corpus size and no driver-side loop ever appears.
  *
  * Signed integer division: both engines truncate toward zero (Spark
  * `div` = Java long division; DuckDB `//` measured −7//2 = −3), so
  * plain `div`/`//` stays exact-parity even on the possibly-negative
  * OLS numerators here — the one family in the repo that divides a
  * sign-carrying value. (DuckDB's `//` is NOT floor division despite
  * the Python-like spelling; an explicit-floor Spark twin was measured
  * off-by-one against it on the negative slope.)
  */
object Learn {

  // ---------------------------------------------------------------- linreg

  /** Binned ordinary least squares per return flag: regress average
    * line-item price (cents, integer-divided per bin) on quantity over
    * the ≤50 distinct quantity bins. Binning first is the scale design,
    * not a shortcut: the corpus-scale pass is one map-side-combined
    * groupBy producing ≤ |flags|·50 sufficient-statistic rows, and the
    * OLS normal equations then run on that bounded set in exact long
    * arithmetic (n ≤ 50, x ≤ 50, y ≤ 2²⁴ cents ⇒ the 10⁶-scaled
    * numerator stays ≤ 2⁶¹ — overflow-free at ANY corpus size, where
    * raw-row Σxy·n would overflow long at ~10⁸ rows). Slope/intercept
    * in integer micro-units; the numerators can be negative, covered by
    * the truncate-toward-zero parity noted on the object scaladoc. */
  def mlLinreg(s: SparkSession, d: String): DataFrame = {
    val bins = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("rf"),
        expr("CAST(l_quantity AS BIGINT)").as("q"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .groupBy(col("rf"), col("q"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
      .withColumn("y", expr("sum_cents div n_rows"))
    bins.groupBy(col("rf"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("q")).as("sx"), sum(col("y")).as("sy"),
        sum(col("q") * col("q")).as("sxx"),
        sum(col("q") * col("y")).as("sxy"))
      .withColumn("num", expr("n_bins * sxy - sx * sy"))
      .withColumn("den", expr("n_bins * sxx - sx * sx"))
      .withColumn("slope_micro", expr("(1000000 * num) div den"))
      .withColumn("icept_micro",
        expr("(1000000 * sy - slope_micro * sx) div n_bins"))
      .select(col("rf"), col("n_bins"), col("slope_micro"), col("icept_micro"))
      .orderBy(col("rf").asc)
  }

  // ------------------------------------------------------------ naive bayes

  /** Multinomial Naive Bayes language classifier (add-one smoothing),
    * trained on the even-doc_id half of `documents` and evaluated on the
    * odd half — the confusion matrix a pipeline uses to calibrate its
    * language router. Deterministic split (doc_id parity), deterministic
    * argmax (score desc, lang asc), and EXACT integer scores: every log
    * is [[Text.withLgMicro]] micro-nats computed on the vocabulary-sized
    * count table (never the token stream), so
    *   score(d, l) = lg D_l + Σ_t c_t·lg(ct_{l,t}+1) − n_t·lg(N_l+V)
    * hash-matches the oracle. Scale shape: train counts are one
    * map-side-combined (lang, token) agg; the vocabulary size V and the
    * per-language constants ride 1-row/|langs|-row broadcast folds
    * (crossJoin of a broadcast aggregate — the repo's standard scalar
    * fold, no driver action); scoring is the test token stream × |langs|
    * (a bounded ≤5× fan-out) left-joined to the vocab-sized count table
    * on (lang, token) — an equi-join that shuffles on the token key,
    * never a pair blow-up. */
  def mlNaiveBayes(s: SparkSession, d: String): DataFrame = {
    val toksCol = split(col("text"), " ")
    val docs = Tables.documents(s, d)
    val train = docs.filter(col("doc_id") % 2 === 0)
    // Round 15 (guide §2.3/§2.4): the (lang, token) count table is the
    // model — VOCABULARY-sized (|langs|·V rows), yet the old plan
    // re-derived it from the corpus-scale token stream FOUR times
    // (vocab / langStats / ctL / the second langC broadcast): 8 parquet
    // scans, 23 Exchanges, zero ReusedExchange (the consumers prune
    // different columns, so the subtrees never hash equal —
    // plans/r15/q_ml_naivebayes_before.txt). One lazily-checkpointed
    // leaf + the count that materializes it (the clusterLabels
    // memberBound pattern) collapses the train side to ONE token pass,
    // and the exact row count licenses broadcasting the model under
    // every downstream join (§3.1) — the old test-side join fell to
    // SortMergeJoin and shuffled the 5×-fanned test token stream on
    // (cl, tok) to probe a table that fits in a task's hand.
    val ct = Hints.checkpoint(
      Tables.spread(train)
        .select(col("lang"), explode(toksCol).as("tok"))
        .groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("ct")),
      eager = false)
    val ctRows = ct.count()
    val vocab = ct.agg(countDistinct(col("tok")).as("vn"))
    val langStats = ct.groupBy(col("lang")).agg(sum(col("ct")).as("nl"))
      .crossJoin(broadcast(vocab))
      .join(train.groupBy(col("lang")).agg(count(lit(1)).as("dl")), "lang")
    val langC = Text.withLgMicro(
        Text.withLgMicro(langStats, "nl + vn", "lg_nv"), "dl", "lg_dl")
      .select(col("lang").as("cl"), col("lg_nv"), col("lg_dl"))
    val ctL = Text.withLgMicro(ct, "ct + 1", "lg_ct1")
      .select(col("lang").as("cl"), col("tok"), col("lg_ct1"))
    val testToks = Tables.spread(docs.filter(col("doc_id") % 2 === 1))
      .select(col("doc_id"), col("lang").as("true_lang"),
        explode(toksCol).as("tok"))
      .groupBy(col("doc_id"), col("true_lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val scored = testToks
      // class fan-out from the cached leaf (not langC): langC's dl
      // aggregate re-scans documents, and this arm only needs the
      // distinct class labels — one dl scan total, not two
      .crossJoin(broadcast(ct.select(col("lang").as("cl")).distinct()))
      .join(Hints.bcOrHash(ctL, ctRows), Seq("cl", "tok"), "left")
      .withColumn("term", col("c") * coalesce(col("lg_ct1"), lit(0L)))
      .groupBy(col("doc_id"), col("true_lang"), col("cl"))
      .agg(sum(col("term")).as("s_term"), sum(col("c")).as("n_toks"))
      .join(broadcast(langC), Seq("cl"))
      .withColumn("score",
        col("lg_dl") + col("s_term") - col("n_toks") * col("lg_nv"))
    // Argmax as a map-side-combinable aggregate instead of a
    // row_number window (§2.3 "aggregate before you shuffle"): the
    // window shuffled every (doc, class) row by doc_id and sorted; the
    // min_by struct ordering ((-score, cl) lexicographic) picks the
    // identical winner — max score, ties to the ascending class —
    // with partial aggregation absorbing the 5× class fan-out before
    // the exchange. Scores are micro-nat longs ≪ 2⁶², so the negation
    // is overflow-free.
    scored
      .groupBy(col("doc_id"), col("true_lang"))
      .agg(min_by(col("cl"),
        struct((-col("score")).as("ns"), col("cl"))).as("cl"))
      .groupBy(col("true_lang"), col("cl"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("true_lang"), col("cl").as("pred_lang"), col("n_docs"))
      .orderBy(col("true_lang").asc, col("pred_lang").asc)
  }

  // -------------------------------------------------------------- autocorr

  /** Lag-1..7 autocorrelation of the daily event-count series — the
    * weekly-seasonality probe run before gap-filling or resampling a
    * telemetry stream. The corpus-scale stage is ONE map-side-combined
    * daily count; the lagged self-join and Pearson sufficient statistics
    * run on the calendar-bounded series (days, not events). Pair
    * alignment is an equi-join on day+lag (the `explode(sequence)`
    * fan-out, 7× a ≤10³-row series), never a range join. The correlation
    * itself divides EXACT long sums (counts and their products — no
    * ordering sensitivity) as IEEE doubles, rounded at 6; num is also
    * emitted raw so the exact part of the result is hash-pinned. */
  def tsAutocorr(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val a = daily
      .select(col("day"), col("cnt").as("x"),
        explode(expr("sequence(CAST(1 AS BIGINT), CAST(7 AS BIGINT))")).as("lag"))
      .withColumn("tday", col("day") + col("lag"))
    val b = daily.select(col("day").as("tday"), col("cnt").as("y"))
    a.join(b, "tday")
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("num", expr("n_pairs * sxy - sx * sy"))
      .withColumn("denx", expr("n_pairs * sxx - sx * sx"))
      .withColumn("deny", expr("n_pairs * syy - sy * sy"))
      .withColumn("r", when(col("denx") > 0 && col("deny") > 0,
          round(col("num").cast("double") /
            sqrt(col("denx").cast("double") * col("deny").cast("double")), 6))
        .otherwise(lit(0.0)))
      .select(col("lag"), col("n_pairs"), col("num"), col("r"))
      .orderBy(col("lag").asc)
  }

  // ------------------------------------------------------------ changepoint

  /** CUSUM change-point detection on the daily event-count series: the
    * day where the cumulative deviation from the global mean peaks in
    * magnitude (Page 1954's cumulative-sum chart, argmax form) — the
    * standard "did the pipeline's volume regime shift, and when?" audit.
    * Exact integer micro-units throughout: cum_t = Σ 10⁶·cnt, dev_t =
    * cum_t − t·mean_micro (sign-carrying but never divided), pre/post
    * means by non-negative integer division, argmax tie-broken by
    * earliest day. The single-partition windows run on the POST-AGG
    * daily series — calendar-bounded (one row per day, independent of
    * corpus size), so the non-parallel sort is a constant-size epilogue,
    * the same boundedness argument as q_ts_gapfill. */
  def tsChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val tot = daily.agg(sum(col("cnt")).as("tot"), count(lit(1)).as("nd"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(tot))
      .withColumn("t", row_number().over(Window.orderBy(col("day"))).cast("long"))
      .withColumn("cum", sum(expr("cnt * 1000000")).over(wCum))
      .withColumn("mean_micro", expr("(1000000 * tot) div nd"))
      .withColumn("dev", col("cum") - col("t") * col("mean_micro"))
      .withColumn("rn", row_number().over(
        Window.orderBy(abs(col("dev")).desc, col("day").asc)))
      .filter(col("rn") === 1)
      .select(col("day").as("cp_day"), col("t").as("cp_t"),
        col("nd").as("n_days"), col("dev").as("cusum_micro"),
        col("mean_micro"),
        expr("cum div t").as("pre_mean_micro"),
        when(col("t") < col("nd"),
            expr("(1000000 * tot - cum) div (nd - t)"))
          .otherwise(lit(0L)).as("post_mean_micro"))
  }

  // -------------------------------------------------------------- theil-sen

  /** Theil–Sen robust slope of the daily event-count series (Theil 1950 /
    * Sen 1968): the rank-median over all pairwise slopes — the
    * outlier-immune twin of [[mlLinreg]]'s OLS for trend monitoring (one
    * ingestion-glitch day cannot move it). The pair enumeration is
    * O(days²) BY DESIGN on the calendar-bounded post-agg series (≤10³
    * days → ≤5·10⁵ pairs regardless of corpus size — same boundedness
    * argument as [[tsChangepoint]]'s windows; the corpus-scale stage is
    * only the daily count). Slopes in integer micro-units (negative
    * slopes covered by the truncate-toward-zero parity), median =
    * rank-⌈n/2⌉ under the total order (slope, day-pair) exactly like
    * q_stats_mad; intercept = the same rank-median of per-day residuals
    * under the median slope. */
  def tsTheilsen(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val a = daily.select(col("day").as("da"), col("cnt").as("ya"))
    val b = daily.select(col("day").as("db"), col("cnt").as("yb"))
    val slopes = a.join(b, col("da") < col("db"))
      .select(col("da"), col("db"),
        expr("(1000000 * (yb - ya)) div (db - da)").as("sl"))
    val slopeMed = slopes
      .withColumn("rn", row_number().over(
        Window.orderBy(col("sl").asc, col("da").asc, col("db").asc)))
      .withColumn("np", count(lit(1)).over(Window.partitionBy(lit(1))))
      .filter(col("rn") === expr("(np + 1) div 2"))
      .select(col("sl").as("slope_micro"), col("np").as("n_pairs"))
    daily.crossJoin(broadcast(slopeMed))
      .withColumn("resid", expr("1000000 * cnt - slope_micro * day"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("resid").asc, col("day").asc)))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy(lit(1))))
      .filter(col("rn") === expr("(nd + 1) div 2"))
      .select(col("nd").as("n_days"), col("n_pairs"), col("slope_micro"),
        col("resid").as("icept_micro"))
  }

  // -------------------------------------------------------------- decompose

  /** Additive seasonal decomposition of the daily event-count series
    * (the classical moving-average method): trend = centered 7-day
    * moving average, weekly seasonal = per-day-of-week mean of the
    * detrended interior, residual = the rest — the volume-regime
    * fingerprint read before alerting on [[tsChangepoint]]. Exact
    * integer micro-units: trend_micro = Σ₇·10⁶ div 7 only where the
    * window is FULL (7 rows — edges carry no trend, exactly the
    * classical definition), seasonal/residual subtractions are exact,
    * the per-dow mean divides a sign-carrying sum under the
    * truncate-toward-zero parity. Same calendar-bounded post-agg
    * boundedness as the rest of the ts family. */
  def tsDecompose(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val trended = daily
      .withColumn("w_n", count(lit(1)).over(w7))
      .withColumn("w_sum", sum(col("cnt")).over(w7))
      .filter(col("w_n") === 7)
      .withColumn("trend_micro", expr("(1000000 * w_sum) div 7"))
      .withColumn("dow", pmod(col("day"), lit(7L)))
      .withColumn("det", expr("1000000 * cnt - trend_micro"))
    val seasonal = trended.groupBy(col("dow"))
      .agg(sum(col("det")).as("s_det"), count(lit(1)).as("n_dow"))
      .select(col("dow"), expr("s_det div n_dow").as("seasonal_micro"))
    trended.join(broadcast(seasonal), "dow")
      .select(col("day"), col("dow"), col("cnt"), col("trend_micro"),
        col("seasonal_micro"),
        (col("det") - col("seasonal_micro")).as("resid_micro"))
      .orderBy(col("day").asc)
  }

  // ------------------------------------------------------------------ holt

  /** Holt's linear exponential smoothing forecast (Holt 1957/2004,
    * public method) of the daily event-count series, h = 1..7 days out —
    * the capacity-planning projection run beside [[tsDecompose]]. The
    * recurrence (level/trend update per day) is inherently sequential,
    * so it runs as ONE `aggregate` higher-order function over the
    * day-ordered count array — a single codegen'd fold over the
    * calendar-bounded series after the corpus-scale daily count, not a
    * driver loop and not an O(days) join chain. Multiply-free exact
    * integer smoothing (α = 1/2: l' = (10⁶y + l + b) div 2; β = 3/10:
    * b' = (3(l'−l) + 7b) div 10) keeps every intermediate ≤ 10⁶·maxcnt
    * — overflow-proof where a 10⁶-scaled α product would saturate long
    * at ~10¹² events/day — and sign-carrying steps ride the
    * truncate-toward-zero parity. DuckDB twin: `list_reduce` over the
    * same struct stream (elements pre-lifted to the accumulator shape —
    * reduce seeds with the first element, which IS the l₀ = 10⁶·y₁,
    * b₀ = 0 init on both engines). */
  def tsHolt(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val lp = "(y.l + acc.l + acc.b) div 2"
    val st = daily
      .agg(expr("transform(array_sort(collect_list(struct(day, cnt))), " +
          "x -> struct(CAST(x.cnt * 1000000 AS BIGINT) AS l, " +
          "CAST(0 AS BIGINT) AS b))").as("ys"),
        count(lit(1)).as("n_days"))
      .select(col("n_days"), expr(
        s"""aggregate(
           |  slice(ys, 2, size(ys) - 1),
           |  ys[0],
           |  (acc, y) -> struct(
           |    CAST($lp AS BIGINT) AS l,
           |    CAST((3 * ($lp - acc.l) + 7 * acc.b) div 10 AS BIGINT) AS b))
           |""".stripMargin).as("st"))
    st.select(col("n_days"), col("st.l").as("level_micro"),
        col("st.b").as("trend_micro"),
        explode(expr("sequence(CAST(1 AS BIGINT), CAST(7 AS BIGINT))")).as("h"))
      .select(col("h"), col("n_days"), col("level_micro"), col("trend_micro"),
        (col("level_micro") + col("h") * col("trend_micro")).as("forecast_micro"))
      .orderBy(col("h").asc)
  }

  // ------------------------------------------------------------ registration

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_linreg"     -> mlLinreg,
    "q_ml_naivebayes" -> mlNaiveBayes,
    "q_ts_autocorr"   -> tsAutocorr,
    "q_ts_changepoint" -> tsChangepoint,
    "q_ts_theilsen"   -> tsTheilsen,
    "q_ts_decompose"  -> tsDecompose,
    "q_ts_holt"       -> tsHolt
  )

  val oracle: Map[String, String] = Map(
    "q_ml_linreg" ->
      """WITH b AS (
        |  SELECT l_returnflag AS rf, CAST(l_quantity AS BIGINT) AS q,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |           // CAST(count(*) AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1, 2),
        |s AS (
        |  SELECT rf, CAST(count(*) AS BIGINT) AS n_bins,
        |         CAST(sum(q) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(q * q) AS BIGINT) AS sxx,
        |         CAST(sum(q * y) AS BIGINT) AS sxy
        |  FROM b GROUP BY rf),
        |n AS (
        |  SELECT rf, n_bins, sx, sy,
        |         n_bins * sxy - sx * sy AS num,
        |         n_bins * sxx - sx * sx AS den
        |  FROM s)
        |SELECT rf, n_bins,
        |       CAST((1000000 * num) // den AS BIGINT) AS slope_micro,
        |       CAST((1000000 * sy - ((1000000 * num) // den) * sx) // n_bins
        |         AS BIGINT) AS icept_micro
        |FROM n
        |ORDER BY rf ASC""".stripMargin,
    "q_ml_naivebayes" -> {
      val values = Text.lnMicro.map { case (k, lm) => s"($k, $lm)" }
        .mkString(", ")
      s"""WITH ln(k, lm) AS (SELECT * FROM (VALUES $values) t(k, lm)),
         |tr AS (
         |  SELECT lang, unnest(string_split(text, ' ')) AS tok
         |  FROM documents WHERE doc_id % 2 = 0),
         |ct AS (
         |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS ct
         |  FROM tr GROUP BY 1, 2),
         |v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vn FROM ct),
         |ls AS (
         |  SELECT ct.lang, CAST(sum(ct.ct) AS BIGINT) AS nl
         |  FROM ct GROUP BY ct.lang),
         |pr AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS dl
         |  FROM documents WHERE doc_id % 2 = 0 GROUP BY lang),
         |lc AS (
         |  SELECT ls.lang AS cl,
         |         ${Text.lgMicroSql("ls.nl + v.vn", "la")} AS lg_nv,
         |         ${Text.lgMicroSql("pr.dl", "lb")} AS lg_dl
         |  FROM ls, v
         |  JOIN pr ON ls.lang = pr.lang),
         |ctl AS (
         |  SELECT lang AS cl, tok,
         |         ${Text.lgMicroSql("ct + 1", "lc2")} AS lg_ct1
         |  FROM ct),
         |tt AS (
         |  SELECT doc_id, true_lang, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT doc_id, lang AS true_lang,
         |               unnest(string_split(text, ' ')) AS tok
         |        FROM documents WHERE doc_id % 2 = 1)
         |  GROUP BY 1, 2, 3),
         |sc AS (
         |  SELECT tt.doc_id, tt.true_lang, lc.cl,
         |         lc.lg_dl + sum(tt.c * coalesce(ctl.lg_ct1, 0))
         |           - sum(tt.c) * lc.lg_nv AS score
         |  FROM tt
         |  CROSS JOIN lc
         |  LEFT JOIN ctl ON ctl.cl = lc.cl AND ctl.tok = tt.tok
         |  GROUP BY tt.doc_id, tt.true_lang, lc.cl, lc.lg_dl, lc.lg_nv),
         |p AS (
         |  SELECT doc_id, true_lang, cl,
         |         row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY score DESC, cl ASC) AS rn
         |  FROM sc)
         |SELECT true_lang, cl AS pred_lang, CAST(count(*) AS BIGINT) AS n_docs
         |FROM p WHERE rn = 1
         |GROUP BY 1, 2
         |ORDER BY true_lang ASC, pred_lang ASC""".stripMargin
    },
    "q_ts_autocorr" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT l.lag, a.cnt AS x, b.cnt AS y
        |  FROM daily a
        |  CROSS JOIN (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag) l
        |  JOIN daily b ON b.day = a.day + l.lag),
        |s AS (
        |  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM p GROUP BY lag)
        |SELECT lag, n_pairs,
        |       CAST(n_pairs * sxy - sx * sy AS BIGINT) AS num,
        |       CASE WHEN n_pairs * sxx - sx * sx > 0
        |             AND n_pairs * syy - sy * sy > 0
        |            THEN round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
        |              / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
        |                   * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
        |            ELSE 0.0 END AS r
        |FROM s
        |ORDER BY lag ASC""".stripMargin,
    // The natural DuckDB twin (list_reduce over lifted structs) is
    // UNUSABLE: measured on 1.0.0, a chained reduce whose second struct
    // field reads an accumulator field aliases the accumulator with the
    // half-written output (field b's expression sees the freshly
    // assigned l — b := acc.l - 7 returned the NEW l minus 7). The
    // recurrence is therefore unrolled as a recursive CTE, one row per
    // day — sequential by nature, calendar-bounded like the Spark fold.
    "q_ts_holt" -> {
      val lp = "(i.cnt * 1000000 + h.l + h.b) // 2"
      s"""WITH RECURSIVE daily AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM events GROUP BY 1),
         |idx AS MATERIALIZED (
         |  SELECT cnt, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
         |         CAST(count(*) OVER () AS BIGINT) AS n_days
         |  FROM daily),
         |h(t, l, b) AS (
         |  SELECT t, CAST(cnt * 1000000 AS BIGINT), CAST(0 AS BIGINT)
         |  FROM idx WHERE t = 1
         |  UNION ALL
         |  SELECT i.t, CAST($lp AS BIGINT),
         |         CAST((3 * ($lp - h.l) + 7 * h.b) // 10 AS BIGINT)
         |  FROM h JOIN idx i ON i.t = h.t + 1),
         |st AS (
         |  SELECT l, b FROM h ORDER BY t DESC LIMIT 1)
         |SELECT hh.h, (SELECT max(n_days) FROM idx) AS n_days,
         |       st.l AS level_micro, st.b AS trend_micro,
         |       CAST(st.l + hh.h * st.b AS BIGINT) AS forecast_micro
         |FROM st, (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS h) hh
         |ORDER BY hh.h ASC""".stripMargin
    },
    "q_ts_theilsen" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |sl AS (
        |  SELECT a.day AS da, b.day AS db,
        |         CAST((1000000 * (b.cnt - a.cnt)) // (b.day - a.day)
        |           AS BIGINT) AS sl
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |sm AS (
        |  SELECT sl AS slope_micro, np AS n_pairs FROM (
        |    SELECT sl, da, db,
        |           row_number() OVER (ORDER BY sl ASC, da ASC, db ASC) AS rn,
        |           CAST(count(*) OVER () AS BIGINT) AS np
        |    FROM sl)
        |  WHERE rn = (np + 1) // 2),
        |res AS (
        |  SELECT d.day, sm.n_pairs, sm.slope_micro,
        |         CAST(1000000 * d.cnt - sm.slope_micro * d.day AS BIGINT)
        |           AS resid
        |  FROM daily d, sm)
        |SELECT nd AS n_days, n_pairs, slope_micro, resid AS icept_micro
        |FROM (
        |  SELECT n_pairs, slope_micro, resid,
        |         row_number() OVER (ORDER BY resid ASC, day ASC) AS rn,
        |         CAST(count(*) OVER () AS BIGINT) AS nd
        |  FROM res)
        |WHERE rn = (nd + 1) // 2""".stripMargin,
    "q_ts_decompose" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT day, cnt,
        |         count(*) OVER (ORDER BY day
        |           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w_n,
        |         CAST(sum(cnt) OVER (ORDER BY day
        |           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
        |           AS w_sum
        |  FROM daily),
        |tr AS (
        |  SELECT day, cnt, day % 7 AS dow,
        |         (1000000 * w_sum) // 7 AS trend_micro,
        |         1000000 * cnt - (1000000 * w_sum) // 7 AS det
        |  FROM t WHERE w_n = 7),
        |se AS (
        |  SELECT dow,
        |         CAST(sum(det) // count(*) AS BIGINT) AS seasonal_micro
        |  FROM tr GROUP BY dow)
        |SELECT tr.day, tr.dow, tr.cnt,
        |       CAST(tr.trend_micro AS BIGINT) AS trend_micro,
        |       se.seasonal_micro,
        |       CAST(tr.det - se.seasonal_micro AS BIGINT) AS resid_micro
        |FROM tr JOIN se ON tr.dow = se.dow
        |ORDER BY tr.day ASC""".stripMargin,
    "q_ts_changepoint" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS tot,
        |         CAST(count(*) AS BIGINT) AS nd
        |  FROM daily),
        |c AS (
        |  SELECT day, cnt, tot, nd,
        |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
        |         CAST(sum(cnt * 1000000) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum,
        |         CAST((1000000 * tot) // nd AS BIGINT) AS mean_micro
        |  FROM daily, t),
        |d AS (SELECT *, cum - t * mean_micro AS dev FROM c),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY abs(dev) DESC, day ASC) AS rn
        |  FROM d)
        |SELECT day AS cp_day, t AS cp_t, nd AS n_days,
        |       CAST(dev AS BIGINT) AS cusum_micro, mean_micro,
        |       CAST(cum // t AS BIGINT) AS pre_mean_micro,
        |       CAST(CASE WHEN t < nd THEN (1000000 * tot - cum) // (nd - t)
        |                 ELSE 0 END AS BIGINT) AS post_mean_micro
        |FROM r WHERE rn = 1""".stripMargin
  )
}
