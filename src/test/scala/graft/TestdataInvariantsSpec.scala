package graft

import org.apache.spark.sql.functions._

/** sf0.001 golden invariants (FIXTURES.md §A) — catches data drift before
  * it shows up as a confusing oracle mismatch. */
class TestdataInvariantsSpec extends SparkSpec {

  test("row counts match the measured fixture table") {
    val expected = Map("region" -> 5L, "nation" -> 25L, "supplier" -> 10L,
      "customer" -> 150L, "part" -> 200L, "orders" -> 1500L,
      "lineitem" -> 6000L, "events" -> 1000L, "documents" -> 500L,
      "embeddings" -> 500L)
    expected.foreach { case (t, n) =>
      assert(Tables(spark, sf0001, t).count() == n, s"table $t")
    }
  }

  test("o_orderkey unique; n_chars == length(text); embeddings dim 64") {
    val o = Tables.orders(spark, sf0001)
    assert(o.select("o_orderkey").distinct().count() == o.count())
    assert(Tables.documents(spark, sf0001)
      .filter(col("n_chars") =!= length(col("text"))).count() == 0)
    assert(Tables.embeddings(spark, sf0001)
      .filter(size(col("embedding")) =!= 64).count() == 0)
  }

  test("events.ts converts to timestamp (ns→µs) with expected range") {
    val e = Tables.events(spark, sf0001)
      .agg(min("ts").cast("string"), max("ts").cast("string")).head()
    assert(e.getString(0).startsWith("2024-01-0"))
    assert(e.getString(1).startsWith("2024-01-3"))
  }
}
