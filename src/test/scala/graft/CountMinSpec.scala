package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMinSketch

/** The count-min guarantees the no-oracle gate row never checks:
  * one-sided error (estimates never undercount), exact recovery when the
  * key space is far below the cell count, and bit-exact mergeability —
  * the property that lets per-partition partials union up a hierarchy. */
class CountMinSpec extends SparkSpec {

  test("estimates never undercount, and are exact for a sparse key space") {
    val rows = operators.Aggs.approxCms(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"user ${r.getLong(0)}: cms $est < exact $exact")
    }
    // sf0.001 has ~15 distinct users vs 4x256 cells — collisions are
    // near-impossible, so the sketch should be EXACT here.
    assert(rows.forall(_.getLong(3) == 0L),
      "sparse-key sketch should have zero overcount at 15 keys / 1024 cells")
  }

  test("sketch of two disjoint halves merges to the whole-data sketch") {
    val cms = udaf(CountMinSketch)
    val ev = Tables.events(spark, sf0001)
    val whole = ev.agg(cms(col("user_id"))).head().getSeq[Long](0)
    val halves = ev.withColumn("h", col("event_id") % 2)
      .groupBy(col("h")).agg(cms(col("user_id")).as("sk"))
      .collect().map(_.getSeq[Long](1).toArray)
    val merged = CountMinSketch.merge(halves(0), halves(1))
    assert(merged.toSeq == whole,
      "elementwise merge of half-sketches != whole-data sketch")
  }

  test("reduce places each key in exactly DEPTH cells, total mass = n") {
    val sk = Seq(1L, 2L, 3L, 1L).foldLeft(CountMinSketch.zero)(
      CountMinSketch.reduce)
    assert(sk.sum == 4L * CountMinSketch.Depth, "each update must hit DEPTH cells")
    assert(CountMinSketch.estimate(sk, 1L) == 2L)
    assert(CountMinSketch.estimate(sk, 2L) == 1L)
    assert(CountMinSketch.estimate(sk, 99L) <= 4L, "phantom key bounded by mass")
  }
}
