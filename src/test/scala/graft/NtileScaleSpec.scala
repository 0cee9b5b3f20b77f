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

  test("two-pass exact ntile equals the single-window answer row-for-row") {
    // q_win_ntile_exact2 claims EXACTNESS, not agreement: every row's
    // (quartile, run_min_bal, run_max_bal) must equal the single-task
    // window form on both fixtures.
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val exact = operators.Windows.winNtile(spark, sf).collect()
      val two = operators.Windows.winNtileExact2(spark, sf).collect()
      assert(exact.length == two.length, s"$sf: row counts differ")
      exact.zip(two).foreach { case (a, b) =>
        assert(a == b, s"$sf: $a != $b") }
    }
  }

  test("histogram quartiles are balanced within bin granularity (≤10% skew)") {
    // q_win_ntile_hist trades exact rank boundaries for bin-granular
    // cutoffs; the quartile populations must still come out near n/4 —
    // a drift beyond bin-tie noise means the cutoff selection is wrong.
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val rows = operators.Windows.winNtileHist(spark, sf).collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
      val counts = rows.map(_.getLong(1))
      val ideal = counts.sum / 4.0
      counts.foreach(c => assert(math.abs(c - ideal) <= 0.10 * ideal,
        s"$sf: quartile count $c vs ideal $ideal"))
      // bands must tile the value range in order: hi(q) < lo(q+1)
      val los = rows.map(_.getDouble(2)); val his = rows.map(_.getDouble(3))
      (0 until 3).foreach(i => assert(his(i) < los(i + 1),
        s"$sf: band $i hi ${his(i)} overlaps band ${i + 1} lo ${los(i + 1)}"))
    }
  }
}
