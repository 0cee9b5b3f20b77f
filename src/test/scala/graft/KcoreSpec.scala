package graft

import org.apache.spark.sql.functions._

/** Semantic pins for q_graph_kcore: a local replay of the whole peel at
  * a scale where it actually bites (sf0.01 drops 345 of 1880 nodes over
  * 4 rounds; sf0.001's support graph is already its own 2-core, which
  * would leave the peel loop untested), plus the k-core invariants.
  */
class KcoreSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private def localPeel(d: String): (Map[Long, Long], Int) = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val supCnt = scala.collection.mutable.Map[(Long, Long), Int]()
    byOrder.values.foreach { pks =>
      val s = pks.sorted
      for (i <- s.indices; j <- (i + 1) until s.length)
        supCnt((s(i), s(j))) = supCnt.getOrElse((s(i), s(j)), 0) + 1
    }
    // .toSeq BEFORE collect: collecting (a, b) pairs straight off a Map
    // rebuilds a Map and silently collapses edges sharing a first node
    val edges = supCnt.toSeq.collect { case (e, n) if n >= 2 => e }
    var alive = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var rounds = 0
    var done = false
    while (!done) {
      rounds += 1
      val deg = scala.collection.mutable.Map[Long, Long]()
      edges.foreach { case (a, b) =>
        if (alive(a) && alive(b)) {
          deg(a) = deg.getOrElse(a, 0L) + 1; deg(b) = deg.getOrElse(b, 0L) + 1
        }
      }
      val next = alive.filter(n => deg.getOrElse(n, 0L) >= 2)
      done = next == alive
      alive = next
    }
    val coreDeg = scala.collection.mutable.Map[Long, Long]()
    edges.foreach { case (a, b) =>
      if (alive(a) && alive(b)) {
        coreDeg(a) = coreDeg.getOrElse(a, 0L) + 1
        coreDeg(b) = coreDeg.getOrElse(b, 0L) + 1
      }
    }
    val all = edges.flatMap(e => Seq(e._1, e._2)).distinct
    (all.map(n => n -> coreDeg.getOrElse(n, 0L)).toMap, rounds)
  }

  test("kcore: peel equals a local replay where the peel actually drops nodes") {
    val (expected, rounds) = localPeel(sf001)
    assert(rounds >= 3, s"fixture regression: peel converged in $rounds " +
      "rounds — the loop is no longer exercised")
    val got = operators.Graph.graphKcore(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == expected.size)
    got.foreach { case (node, inCore, coreDeg) =>
      assert(coreDeg == expected(node), s"node $node core_deg")
      assert(inCore == (if (expected(node) > 0) 1L else 0L), s"node $node flag")
    }
    val nDropped = got.count(_._2 == 0L)
    assert(nDropped > 0 && nDropped < got.length,
      s"peel degenerate: $nDropped of ${got.length} dropped")
  }

  test("kcore: invariant — every core member has core degree >= k") {
    val rows = operators.Graph.graphKcore(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    rows.foreach { case (inCore, coreDeg) =>
      if (inCore == 1L) assert(coreDeg >= 2L, s"core member with deg $coreDeg")
      else assert(coreDeg == 0L, "non-member with nonzero core degree")
    }
  }

  test("kcore: unconverged peel fails loudly, not silently") {
    val ex = intercept[IllegalStateException] {
      operators.Graph.graphKcore(spark, sf001, k = 2, maxRounds = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
