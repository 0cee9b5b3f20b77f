package graft

import org.apache.spark.sql.functions._

/** Semantic pins for q_dq_benford: a local replay of the first-digit
  * census and the Benford-law axioms on the shared expected table.
  */
class BenfordSpec extends SparkSpec {

  test("benford: digit census equals a local replay") {
    val prices = Tables.lineitem(spark, sf0001)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0))
    val digits = prices.map(p =>
      math.floor(p).toLong.toString.head.asDigit.toLong)
    val cnt = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = digits.length.toLong
    val rows = operators.Analytics.dqBenford(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1L to 9L))
    rows.foreach { case (d, n, obs, exp, dev) =>
      assert(n == cnt.getOrElse(d, 0L), s"digit $d count")
      assert(obs == n * 1000000L / total, s"digit $d obs_ppm")
      assert(dev == math.abs(obs - exp), s"digit $d dev_ppm")
    }
  }

  test("benford: the expected table satisfies the law's axioms") {
    val exp = operators.Analytics.dqBenford(spark, sf0001).collect()
      .map(_.getLong(3)).toSeq
    assert(exp == exp.sorted.reverse, s"exp_ppm must decrease: $exp")
    // ln(1+1/d) telescopes to ln 10, so the ppm table sums to ~1e6
    // (integer-div loss < 9 ppm)
    assert(math.abs(exp.sum - 1000000L) < 9, s"sum ${exp.sum}")
    // the canonical first-digit share: P(1) = ln(2)/ln(10) = 30.1%
    assert(math.abs(exp.head - 301030L) < 10, s"P(1) = ${exp.head}")
  }
}
