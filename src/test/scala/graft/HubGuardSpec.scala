package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Hub-degree guard for the adjacency leaves (round 15, VERDICT r14
  * item 5): the collect_set/collect_list leaves emit one row per node,
  * which a 100-TB power-law hub makes unbounded. Graph.hubGuard measures
  * max degree in the SAME job that materializes the leaf and, above the
  * cap, rebuilds it degree-capped (hash-segmented rows of ≤ width dsts).
  * Pins: (1) the guard actually segments a synthetic hub and the degree
  * table stays exact; (2) all four iterative consumers produce
  * INTEGER-IDENTICAL output when force-segmented (hubCap low enough that
  * every fixture node splits) — the contribution algebra
  * (sum/min/count) is segment-associative, so this is equality, not
  * approximation. */
class HubGuardSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.toString)

  test("hubGuard splits a synthetic hub into bounded segment rows; " +
      "degree table stays exact; under the cap the leaf passes through") {
    import spark.implicits._
    // star: hub 0 ↔ 1..40, plus a bounded pair (100, 101)
    val edges = ((1L to 40L).map(i => (0L, i)) :+ (100L, 101L))
      .toDF("a_pk", "b_pk")
    val raw = graft.operators.Hints.checkpoint(
      edges.union(edges.select(col("b_pk"), col("a_pk"))
          .toDF("a_pk", "b_pk"))
        .groupBy(col("a_pk").as("node"))
        .agg(collect_list(col("b_pk")).as("dsts")),
      eager = false)
    // cap 8, width 8: the hub (deg 40) must split into ≥5 rows of ≤~8
    val (adj, nodes, bound) = Graph.hubGuard(raw, cap = 8, width = 8)
    assert(bound === 43) // 42 nodes... hub + 40 leaves + 2 pair nodes
    val segCounts = adj.groupBy(col("node")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(segCounts(0L) >= 5, s"hub must be segmented: $segCounts")
    assert(adj.select(max(size(col("dsts")))).head().getInt(0) <= 8 * 3,
      "hash segmenting keeps rows near the width (3x slack for skew)")
    val degs = nodes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(degs(0L) === 40 && degs(1L) === 1 && degs(100L) === 1)
    // under the cap: leaf passes through one-row-per-node with deg col
    val (adj2, nodes2, bound2) = Graph.hubGuard(raw, cap = 1 << 21)
    assert(bound2 === 43)
    assert(adj2.groupBy(col("node")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count() === 0)
    assert(nodes2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === degs)
  }

  test("force-segmented ≡ unsegmented: pagerank, bfs, cc, kcore are " +
      "integer-identical under a hubCap that splits every fixture node") {
    // hubCap = 1 forces the segmented path for the whole graph — the
    // strongest exercise of the segment-associative contribution algebra
    // (each dst lives in exactly one segment of its src; sums/mins/
    // counts over disjoint segments equal the unsegmented aggregate).
    assert(rows(Graph.pagerank(spark, sf0001, hubCap = 1))
      === rows(Graph.pagerank(spark, sf0001)))
    assert(rows(Graph.graphBfs(spark, sf0001, hubCap = 1))
      === rows(Graph.graphBfs(spark, sf0001)))
    assert(rows(Graph.graphKcore(spark, sf0001, hubCap = 1))
      === rows(Graph.graphKcore(spark, sf0001)))
    val edges = Graph.copurchaseEdges(spark, sf0001)
    assert(rows(Graph.ccAdjacency(spark, edges, hubCap = 1))
      === rows(Graph.ccAdjacency(spark, edges)))
  }
}
