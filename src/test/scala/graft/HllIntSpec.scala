package graft

/** Accuracy guarantees for the integer-exact HyperLogLog
  * (q_approx_hll_int). The ORACLE proves both engines compute the same
  * numbers; this spec proves those numbers are a good estimate — raw HLL
  * error std is 1.04/√m ≈ 6.5% at m=256, and the small-range
  * linear-counting branch (pre-rounded integer lookup) must hold the same
  * envelope in the sparse regime the fixtures occupy. */
class HllIntSpec extends SparkSpec {

  private def check(sfDir: String, tolPct: Int): Unit = {
    val rows = operators.Aggs.approxHllInt(spark, sfDir).collect()
    assert(rows.length == 5, s"expected 5 event types, got ${rows.length}")
    for (r <- rows) {
      val (et, exact, est) = (r.getString(0), r.getLong(2), r.getLong(3))
      val errPct = math.abs(est - exact) * 100.0 / exact
      assert(errPct <= tolPct,
        f"$et: hll_users=$est vs exact=$exact ($errPct%.1f%% > $tolPct%%)")
      assert(est > 0)
      // Regime bookkeeping: zero_buckets in range, and in the
      // linear-counting regime the m·ln(m/V) estimate itself must hold
      // the accuracy envelope against the EXACT count. (Deliberately not
      // `raw >= est`: m·ln(m/V) is not bounded by the raw estimate across
      // the whole branch — small V near the 640 boundary gives
      // 256·ln(256/V) above raw — so that inequality would be a fixture
      // accident, not a property.)
      val (raw, zeros) = (r.getLong(4), r.getLong(5))
      assert(zeros >= 0 && zeros <= 255)
      if (zeros > 0 && raw <= 640) {
        val lc = 256.0 * math.log(256.0 / zeros)
        val lcErrPct = math.abs(lc - exact) * 100.0 / exact
        assert(lcErrPct <= tolPct,
          f"$et: linear-count ${lc}%.1f vs exact=$exact ($lcErrPct%.1f%% > $tolPct%%)")
      }
    }
  }

  test("hll_users within 10% of exact distinct count at sf0.001 and sf0.01") {
    check(sf0001, 10)
    check("/root/testdata/sf0.01", 10)
  }
}
