package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pins the `observe()` declarative-metrics surface: metrics ride the
  * query plan itself (CollectMetrics — computed during the SAME pass,
  * no second scan) and arrive through the Observation handle. The
  * data-quality counters a production pipeline attaches to every job —
  * the declarative twin of the AccumulatorV2 counters already specced. */
class ObserveSpec extends SparkSpec {

  test("observe() metrics match the same aggregates computed separately") {
    val obs = Observation("docs_quality")
    val df = Tables.documents(spark, sf0001)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("n_chars").cast("long")).as("sum_chars"),
        count(when(col("lang") === "en", 1)).as("n_en"))
      .filter(col("n_chars") > 0)
    val kept = df.count()
    val m = obs.get
    // observe sees pre-filter rows: it is attached below the filter
    val expect = Tables.documents(spark, sf0001)
      .agg(count(lit(1)), sum(col("n_chars").cast("long")),
        count(when(col("lang") === "en", 1)))
      .collect()(0)
    assert(m("n_rows") == expect.getLong(0))
    assert(m("sum_chars") == expect.getLong(1))
    assert(m("n_en") == expect.getLong(2))
    assert(kept <= expect.getLong(0))
  }

  test("observe() on a grouped pipeline still reports input-side rows once") {
    val obs = Observation("pre_agg")
    val out = Tables.lineitem(spark, sf0001)
      .observe(obs, count(lit(1)).as("n_lines"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
      .collect()
    assert(out.map(_.getLong(1)).sum == obs.get("n_lines"))
  }
}
