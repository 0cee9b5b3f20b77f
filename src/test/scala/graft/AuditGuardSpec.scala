package graft

import org.apache.spark.sql.functions._

/** The audit size guard (Dedup.auditSample): at corpus scale the
  * block-quadratic audits run over a deterministic md5-keyed sample by
  * DEFAULT. These tests force the guard at fixture scale (a fake corpus
  * count > AuditCap) and pin the properties the at-scale gate rests on:
  * determinism, sane selectivity, and — the load-bearing one — that
  * sampling COMMUTES with the audits: the LSH twin over the forced
  * sample equals the all-pairs audit over the same sample, i.e. the
  * twins' recall argument survives subsampling. */
class AuditGuardSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"

  test("auditDivisor: identity under the cap, ceil(n/cap) above it") {
    val cap = operators.Dedup.AuditCap
    assert(operators.Dedup.auditDivisor(0) == 1L)
    assert(operators.Dedup.auditDivisor(cap) == 1L)
    assert(operators.Dedup.auditDivisor(cap + 1) == 2L)
    assert(operators.Dedup.auditDivisor(8 * cap) == 8L)
    // 10x replica scale: 50k docs -> divisor 7, ~7.1k sampled
    assert(operators.Dedup.auditDivisor(50000L) == 7L)
    // 100x replica scale: 500k docs -> divisor 62, ~8.1k sampled
    assert(operators.Dedup.auditDivisor(500000L) == 62L)
  }

  test("auditSample: identity at fixture scale; deterministic ~1/s sample when forced") {
    val docs = Tables.documents(spark, sf0001)
    val n = Tables.rowCount(spark, sf0001, "documents")
    // under the cap: the exact same plan (identity, no filter)
    assert(operators.Dedup.auditSample(docs, n, "doc_id").queryExecution
      .analyzed.sameResult(docs.queryExecution.analyzed))
    // forced divisor 8: deterministic, plausible binomial mass
    val forced = 8 * operators.Dedup.AuditCap
    val s1 = operators.Dedup.auditSample(docs, forced, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val s2 = operators.Dedup.auditSample(docs, forced, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2 && s1.nonEmpty)
    // 500 docs / divisor 8 ≈ 62 expected; allow wide binomial slack
    assert(s1.size > 30 && s1.size < 110, s"suspicious sample size ${s1.size}")
  }

  test("sampling commutes with the jaccard audit: LSH twin == all-pairs on the forced sample") {
    // sf0.1 (50k docs) forced down to ~1/8: the largest equality check
    // the suite can afford, and the exact shape the guard produces at
    // corpus scale (sampled blocks, same banding geometry).
    val docs = Tables.documents(spark, sf01)
    val sample = operators.Dedup.auditSample(docs,
      8 * operators.Dedup.AuditCap, "doc_id")
    val allPairs = operators.Dedup.dedupJaccardOn(sample)
      .collect().map(_.toString).toSeq
    val twin = operators.Dedup.dedupJaccardLshOn(sample)
      .collect().map(_.toString).toSeq
    assert(twin == allPairs, "jaccard LSH twin diverged on the audit sample")
  }

  test("sampling commutes with the containment audit on the forced sample") {
    val docs = Tables.documents(spark, sf01)
    val sample = operators.Dedup.auditSample(docs,
      8 * operators.Dedup.AuditCap, "doc_id")
    val allPairs = operators.Dedup.dedupContainOn(sample)
      .collect().map(_.toString).toSeq
    val twin = operators.Dedup.dedupContainLshOn(sample)
      .collect().map(_.toString).toSeq
    assert(twin == allPairs, "containment LSH twin diverged on the audit sample")
  }

  test("guarded queries at fixture scale are byte-identical to the unguarded forms") {
    // the guard must be a no-op below the cap — the oracled results the
    // driver gates on cannot move
    val g = SparkEntry.queries("q_dedup_jaccard")(spark, sf0001)
      .collect().map(_.toString).toSeq
    val u = operators.Dedup.dedupJaccardOn(Tables.documents(spark, sf0001))
      .collect().map(_.toString).toSeq
    assert(g == u)
  }
}
