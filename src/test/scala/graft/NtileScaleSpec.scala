package graft

import org.apache.spark.sql.functions._

/** The scalable quartile path (approx cutoffs + narrow assignment) must
  * closely agree with the exact single-task ntile it replaces at scale. */
class NtileScaleSpec extends SparkSpec {

  test("approxQuartiles agrees with exact ntile on ≥97% of rows") {
    import org.apache.spark.sql.expressions.Window
    val c = Tables.customer(spark, sf0001)
    val exact = c.withColumn("quartile",
      ntile(4).over(Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc))
        .cast("long"))
      .select("c_custkey", "quartile")
    val approx = operators.Windows.approxQuartiles(c, "c_acctbal")
      .select(col("c_custkey").as("k2"), col("quartile").as("q2"))
    val joined = exact.join(approx, col("c_custkey") === col("k2"))
    val total = joined.count().toDouble
    val agree = joined.filter(col("quartile") === col("q2")).count().toDouble
    assert(agree / total >= 0.97, s"agreement ${agree / total}")
  }
}
