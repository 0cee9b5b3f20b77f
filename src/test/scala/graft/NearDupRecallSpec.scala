package graft

import org.apache.spark.sql.functions._

/** Pins what licenses q_dedup_neardup's naive all-pairs oracle: the LSH
  * candidates→verify pipeline must EQUAL the exact answer on the driver's
  * own verify data (sf0.01). Precision is structural (candidates are
  * re-verified); this test is the recall half — if banding or hashing
  * changes ever drop a qualifying pair, the gate breaks here first, not
  * in the driver's CORRECTNESS run. */
class NearDupRecallSpec extends SparkSpec {

  private def exactPairs(d: String): Set[(Long, Long)] = {
    val docs = Tables.documents(spark, d)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), expr(
        "array_distinct(CASE WHEN size(toks) >= 2 THEN " +
          "transform(sequence(1, size(toks) - 1), " +
          "i -> concat_ws(' ', slice(toks, i, 2))) " +
          "ELSE slice(toks, 1, 0) END)").as("tset"))
    val a = docs.select(col("doc_id").as("a_id"), col("tset").as("ta"))
    val b = docs.select(col("doc_id").as("b_id"), col("tset").as("tb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni", (size(col("ta")) + size(col("tb"))).cast("long") - col("inter"))
      .filter(col("uni") > 0 && col("inter").cast("double") / col("uni") >= 0.7)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("nearDupPairs equals the exact all-pairs answer at sf0.01") {
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(d).isDirectory)
    val lsh = operators.Dedup.dedupNeardup(spark, d)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = exactPairs(d)
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    assert(lsh == exact,
      s"missed=${(exact -- lsh).take(10)} extras=${(lsh -- exact).take(10)}")
  }
}
