package graft

/** Guards on the driver contract itself — failures here are silent
  * holes in the graded surface, not behavior bugs:
  *
  *  - the queries/oracleSql maps are merged with `++` across operator
  *    modules, so a key collision between two modules would silently
  *    DROP one implementation;
  *  - an oracleSql entry without a queries entry makes the driver run an
  *    oracle against nothing;
  *  - a queries entry without an oracle is only legitimate for the
  *    enumerated sketch/hash queries — anything else slipping into that
  *    bucket downgrades its correctness gate to rows>0 unnoticed;
  *  - oracle SQL must be single-statement with no trailing semicolon
  *    (SURVEY §7.4.8 — the driver wraps it).
  */
class ContractSpec extends SparkSpec {

  // Only the true approximation sketches remain oracle-less: their OUTPUT
  // is estimator-defined (HLL/percentile_approx internals), not a
  // deterministic value DuckDB could reproduce. The former members
  // q_dedup_minhash / q_dedup_simhash were re-pointed at deterministic
  // md5/polynomial hashes in round 4 and now carry hard oracles;
  // q_approx_cms followed in round 5 (Carter–Wegman modular hash never
  // overflows, so DuckDB replays the sketch exactly).
  private val declaredNoOracle = Set(
    "q_approx_distinct", "q_win_ntile_approx", "q_approx_hll")

  test("module maps merge without key collisions") {
    val qSum = SparkEntry.modules.map(_._1.size).sum
    val oSum = SparkEntry.modules.map(_._2.size).sum
    assert(SparkEntry.queries.size == qSum,
      "a query id collides across modules and was silently dropped")
    assert(SparkEntry.oracleSql.size == oSum,
      "an oracle id collides across modules and was silently dropped")
  }

  test("every oracle has a query; every oracle-less query is a declared sketch") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    assert(q -- o == declaredNoOracle,
      s"unexpected no-oracle queries: ${(q -- o) -- declaredNoOracle}; " +
        s"stale declared set: ${declaredNoOracle -- (q -- o)}")
  }

  test("oracle SQL is single-statement, no trailing semicolon") {
    // only the trailing check: ';' INSIDE a literal is legitimate (the
    // tag-classify problemchars regex contains one)
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.trim.endsWith(";"), s"$k ends with ';'")
    }
  }

  test("query ids follow the q_ naming contract") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.startsWith("q_") && k.matches("q_[a-z0-9_]+"), s"bad id: $k")
    }
  }
}
