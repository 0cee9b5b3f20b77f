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

  test("property: CW slots in range and estimates never undercount, any Long keys") {
    // The round-5 Carter–Wegman hash folds x with floorMod before the
    // affine map, so even Long.MinValue must land in [0, Width) on every
    // row — and the one-sided error guarantee must hold for arbitrary
    // multisets, not just fixture ids.
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val keys = Gen.listOfN(64, Gen.oneOf(
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.oneOf(0L, -1L, 1L, Long.MinValue, Long.MaxValue,
        CountMinSketch.P, -CountMinSketch.P)))
    val prop = forAll(keys) { xs =>
      val slotsOk = xs.forall(x => (0 until CountMinSketch.Depth).forall { r =>
        val s = CountMinSketch.slot(r, x)
        s >= 0 && s < CountMinSketch.Width
      })
      val sk = xs.foldLeft(CountMinSketch.zero)(CountMinSketch.reduce)
      val oneSided = xs.groupBy(identity).forall { case (x, occ) =>
        CountMinSketch.estimate(sk, x) >= occ.size
      }
      slotsOk && oneSided
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("property: merging split sketches equals the whole-data sketch, any split") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val gen = for {
      xs <- Gen.listOfN(48, Gen.choose(-100000L, 100000L))
      cut <- Gen.choose(0, 48)
    } yield (xs, cut)
    val prop = forAll(gen) { case (xs, cut) =>
      val (l, r) = xs.splitAt(cut)
      val whole = xs.foldLeft(CountMinSketch.zero)(CountMinSketch.reduce)
      // merge mutates its first argument — feed it fresh fold results
      val merged = CountMinSketch.merge(
        l.foldLeft(CountMinSketch.zero)(CountMinSketch.reduce),
        r.foldLeft(CountMinSketch.zero)(CountMinSketch.reduce))
      merged.toSeq == whole.toSeq
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}
