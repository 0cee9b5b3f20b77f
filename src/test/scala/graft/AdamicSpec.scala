package graft

import org.apache.spark.sql.functions._
import IntLg.lg

/** Semantic pins for q_graph_adamic: a local replay of the weighted
  * common-neighbor score over the bipartite customer–supplier graph,
  * and the Adamic–Adar axiom (hub neighbors contribute less than rare
  * ones).
  */
class AdamicSpec extends SparkSpec {

  test("adamic: top-20 scores equal a local replay") {
    val edges = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .join(Tables.orders(spark, sf0001)
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck")), "ok")
      .filter(col("ck") % 100 === 0)
      .select(col("ck"), col("sk")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp: Map[Long, List[Long]] = edges.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.sorted.toList).toMap
    val aaW = bySupp.collect {
      case (sk, cks) if cks.length >= 2 =>
        sk -> 1000000000000L / lg(cks.length.toLong)
    }
    val pairScores = bySupp.toSeq.flatMap { case (sk, cks) =>
      for (a <- cks; b <- cks if a < b) yield ((a, b), sk)
    }.groupBy(_._1).map { case ((a, b), hits) =>
      (a, b, hits.length.toLong, hits.map(h => aaW(h._2)).sum)
    }.toSeq
    val expected = pairScores
      .sortBy { case (a, b, _, aa) => (-aa, a, b) }.take(20)
    val got = operators.Graph.graphAdamic(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("adamic: the hub penalty axiom holds in the integer weights") {
    // A shared neighbor of degree d must contribute strictly less than
    // one of degree d' < d, and the weight must stay positive.
    val ws = Seq(2L, 3L, 10L, 100L, 10000L).map(d => 1000000000000L / lg(d))
    assert(ws == ws.sorted.reverse && ws.forall(_ > 0), s"weights: $ws")
  }
}
