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
      // regime bookkeeping is consistent: raw >= corrected in the sparse
      // regime (raw only OVER-estimates there), zero_buckets in range
      val (raw, zeros) = (r.getLong(4), r.getLong(5))
      assert(zeros >= 0 && zeros <= 255)
      if (zeros > 0 && raw <= 640) assert(raw >= est,
        s"$et: linear counting should correct raw $raw downward, got $est")
    }
  }

  test("hll_users within 10% of exact distinct count at sf0.001 and sf0.01") {
    check(sf0001, 10)
    check("/root/testdata/sf0.01", 10)
  }
}
