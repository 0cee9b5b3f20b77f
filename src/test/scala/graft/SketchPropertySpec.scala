package graft

import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Randomized laws for the sketch-family primitives — pure-JVM replicas
  * of the algebra the declared queries rely on, checked over the whole
  * generator-reachable input space rather than fixture examples:
  * bottom-k mergeability (the union-sketch correctness law), the KMV
  * small-set exactness branch, Bloom's one-sided guarantee, and
  * greedy-selection permutation invariance.
  */
class SketchPropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def fold(hex: String, digits: Int): Long =
    hex.take(digits).foldLeft(0L)((a, c) =>
      a * 16 + "0123456789abcdef".indexOf(c))

  private def bottomK(xs: Iterable[Long], k: Int): Vector[Long] =
    xs.toVector.distinct.sorted.take(k)

  test("bottom-k is mergeable: sketch of union == merge of sketches") {
    val setGen = Gen.listOf(Gen.choose(0L, 1000L))
    val prop = forAll(setGen, setGen, Gen.choose(1, 32)) { (a, b, k) =>
      bottomK(a ++ b, k) == bottomK(bottomK(a, k) ++ bottomK(b, k), k)
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }

  test("KMV small-set branch is exact: |hashes| < k estimates exactly") {
    val prop = forAll(Gen.listOf(Gen.choose(-5000L, 5000L))) { keys =>
      val hs = keys.map(x => fold(md5hex(x.toString), 8)).distinct
      val kept = bottomK(hs, 64)
      // the declared estimator: exact when the sketch holds everything
      val est =
        if (kept.length < 64) kept.length.toLong
        else 63L * (1L << 32) / math.max(kept.last, 1L)
      hs.length >= 64 || est == hs.length.toLong
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }

  test("bloom: members are always claimed (one-sided error only)") {
    def positions(key: Long): Set[Long] =
      (0 until 3).map(i => fold(md5hex(s"$key#$i"), 8) % 4096L).toSet
    val setGen = Gen.listOf(Gen.choose(0L, 100000L)).map(_.toSet)
    val prop = forAll(setGen, setGen) { (build, probe) =>
      val bits = build.flatMap(positions)
      val claimed = probe.filter(p => positions(p).subsetOf(bits))
      (probe intersect build).forall(claimed.contains)
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop).passed)
  }

  test("greedy k-center picks are invariant under input permutation") {
    val vecGen = Gen.listOfN(4, Gen.choose(-100L, 100L)).map(_.toArray)
    val setGen = Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, vecGen))
      .map(_.zipWithIndex.map { case (v, i) => i.toLong -> v })
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def greedy(vs: Seq[(Long, Array[Long])], k: Int): Vector[Long] = {
      val m = vs.toMap
      var sel = Vector(vs.map(_._1).min)
      while (sel.length < math.min(k, vs.length)) {
        val best = vs.map(_._1).filterNot(sel.contains)
          .map(id => (id, sel.map(s => d2(m(id), m(s))).min))
          .minBy(t => (-t._2, t._1))._1
        sel :+= best
      }
      sel
    }
    val prop = forAll(setGen, Gen.choose(0L, 999L)) { (vs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(vs)
      greedy(vs, 3) == greedy(shuffled, 3)
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }
}
