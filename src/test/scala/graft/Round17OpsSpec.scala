package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-14 (17th ops wave) rework: adjacency-leaf
  * connected components ([[operators.Graph.ccAdjacency]] — min-label
  * propagation with pointer jumping, replacing the edge-shaped star
  * contraction for q_graph_cc) and the ANN state's write-time
  * auto-compaction. The census-vs-union-find replay for the declared
  * q_graph_cc lives in Round16OpsSpec and still applies verbatim; these
  * tests pin the NEW algorithm's properties directly.
  */
class Round17OpsSpec extends SparkSpec {

  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)],
      maxRounds: Int = 16): Map[Long, Long] =
    operators.Graph.ccAdjacency(spark,
        edges.toDF("a_pk", "b_pk"), maxRounds = maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ccAdjacency: chains converge to the component minimum, islands stay apart") {
    // a diameter-8 path (worst case for plain propagation), a triangle,
    // and a 2-node island — every node must land on its component min
    val chain = (1L until 9L).map(i => (i + 1, i))
    val tri = Seq((11L, 10L), (12L, 11L), (12L, 10L))
    val island = Seq((21L, 20L))
    val got = labelsOf(chain ++ tri ++ island)
    assert((1L to 9L).forall(got(_) == 1L), s"chain labels: $got")
    assert((10L to 12L).forall(got(_) == 10L), s"triangle labels: $got")
    assert(Seq(20L, 21L).forall(got(_) == 20L), s"island labels: $got")
    assert(got.size == 14)
  }

  test("ccAdjacency: pointer jumping keeps rounds logarithmic on a long path") {
    // a diameter-64 path: plain min-label propagation needs ~64 rounds;
    // with the lbl(lbl(v)) shortcut the label horizon at least doubles
    // per round, so 9 rounds must suffice (2^8 > 64). A budget this far
    // under the linear bound fails fast if the jump leg is ever dropped.
    val path = (1L until 65L).map(i => (i + 1, i))
    val got = labelsOf(path, maxRounds = 9)
    assert((1L to 65L).forall(got(_) == 1L))
  }

  test("ccAdjacency: fails fast when the round budget is too small") {
    val path = (1L until 65L).map(i => (i + 1, i))
    val e = intercept[IllegalStateException](labelsOf(path, maxRounds = 2))
    assert(e.getMessage.contains("did not converge"))
  }

  test("ccAdjacency: shuffle variant (hint threshold 0) matches the broadcast variant") {
    val edges = (1L until 40L).map(i => (i + 1, i)) ++
      Seq((50L, 41L), (51L, 50L), (51L, 41L))
    val bc = labelsOf(edges)
    val sh = operators.Graph.ccAdjacency(spark,
        edges.toDF("a_pk", "b_pk"), maxBc = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bc == sh)
  }
}
