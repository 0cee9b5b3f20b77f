package graft

import org.apache.spark.sql.functions._

/** Semantic pins for q_dedup_semdedup (the SemDeDup-style embedding
  * pruner): a from-scratch local replay of the whole pipeline — quantize,
  * codebook argmin-assign, within-cluster cosine-threshold pruning — plus
  * plan-shape pins for the two stages' scale contracts. A replayed DuckDB
  * oracle alone can't catch a statistically dead stage (the round-7
  * MinHash lesson), so the balance pin asserts the partition actually
  * spreads the corpus.
  */
class SemDedupSpec extends SparkSpec {

  private def quant(v: Seq[Float]): Array[Long] =
    v.map(x => math.min(127L, math.max(-128L,
      math.floor(x.toDouble * 64.0 + 0.5).toLong))).toArray

  private def replay(): Seq[(Long, Long, Long)] = {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), quant(r.getSeq[Float](1))))
    val k = operators.Sim.semK(vecs.length.toLong)
    val cents = vecs.filter(_._1 < k).sortBy(_._1)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val asg = vecs.map { case (id, qv) =>
      val cid = cents.map { case (c, cv) => (l2(qv, cv), c) }.min._2
      (id, cid, qv, qv.map(v => v * v).sum)
    }
    val dropped = (for {
      (aId, cA, qa, na) <- asg
      (bId, cB, qb, nb) <- asg
      if cA == cB && aId < bId
      dot = qa.zip(qb).map { case (x, y) => x * y }.sum
      if dot > 0 && dot * dot * 400 >= na * nb * 49
    } yield bId).toSet
    asg.map { case (id, cid, _, _) =>
      (id, cid, if (dropped(id)) 1L else 0L)
    }.sortBy(_._1).toSeq
  }

  test("semdedup: assign + prune equals a local replay") {
    val rows = operators.Sim.dedupSemdedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == replay())
  }

  test("semdedup: the partition is non-degenerate and the prune bites") {
    // Quality, not equality: every cluster must receive a reasonable
    // share (a collapsed assignment — all vectors in one cluster — would
    // still hash-match its replayed oracle while silently reverting to
    // the quadratic all-pairs regime), and the threshold must actually
    // drop something at fixture scale (τ tuned for non-degeneracy).
    val rows = operators.Sim.dedupSemdedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = rows.length.toLong
    val k = operators.Sim.semK(n)
    val sizes = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(sizes.keySet.size == k, s"expected $k clusters, got ${sizes.keySet}")
    assert(sizes.values.max <= 3 * n / k,
      s"degenerate partition, cluster sizes: $sizes")
    val nDropped = rows.count(_._3 == 1L)
    assert(nDropped > 0 && nDropped < n,
      s"threshold degenerate: $nDropped of $n dropped")
  }

  test("prune_proto: per-cluster hardest-60% cut equals a local replay") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), quant(r.getSeq[Float](1))))
    val k = operators.Sim.semK(vecs.length.toLong)
    val cents = vecs.filter(_._1 < k).sortBy(_._1)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val asg = vecs.map { case (id, qv) =>
      val (d, c) = cents.map { case (c, cv) => (l2(qv, cv), c) }.min
      (id, c, d)
    }
    val expected = asg.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val ranked = rows.sortBy { case (id, _, d) => (-d, id) }
      val nKeep = (3 * rows.length + 4) / 5
      ranked.zipWithIndex.map { case ((id, c, d), i) =>
        (id, c, d, if (i < nKeep) 1L else 0L)
      }
    }.sortBy(_._1)
    val got = operators.Sim.embPruneProto(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("prune_proto: the cut is stratified — exactly ceil(0.6·csize) kept per cluster") {
    val rows = operators.Sim.embPruneProto(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (cid, rs) =>
      val kept = rs.count(_._2 == 1L)
      assert(kept == (3 * rs.length + 4) / 5,
        s"cluster $cid: $kept of ${rs.length} kept")
    }
  }

  test("prune_proto: plan is the broadcast-codebook assign + ONE cid window") {
    val p = SparkEntry.queries("q_emb_prune_proto")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in prune_proto:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"prune_proto should not join beyond the 1-row codebook fold:\n$p")
    assert(p.contains("Window"), s"missing the per-cluster rank window:\n$p")
  }

  test("semdedup: plan is map-only assign + cluster-keyed hash pair join") {
    val p = SparkEntry.queries("q_dedup_semdedup")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // Stage-1 codebook join is the 1-row broadcast fold (nested-loop on a
    // single-row build is the intended shape); stage-2 pair join must be
    // the cluster-keyed shuffled-hash join, never a cartesian.
    assert(!p.contains("CartesianProduct"), s"cartesian in semdedup:\n$p")
    assert(p.contains("ShuffledHashJoin"),
      s"pair join lost the cluster-key hash shape:\n$p")
  }
}
