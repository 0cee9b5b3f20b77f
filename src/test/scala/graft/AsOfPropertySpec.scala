package graft

import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.plans.AsOfJoinApi

/** Randomized pins for the round's hand-built surfaces: the custom
  * as-of exec against a 10-line in-memory reference (random tables,
  * random partitioning), Morton bijectivity, and the count-min
  * over-approximation law. A hand-written physical operator gets the
  * strongest check we can give it — not examples, the whole input
  * space the generator reaches. */
class AsOfPropertySpec extends SparkSpec {

  /** Reference semantics: latest right (time, id) at-or-before, per key. */
  private def refAsof(ls: Seq[(Long, Long, Long)], rs: Seq[(Long, Long, Long)])
      : Map[Long, Option[Long]] =
    ls.map { case (id, k, t) =>
      val cands = rs.filter(r => r._2 == k && r._3 <= t)
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(r => (r._3, r._1))._1))
    }.toMap

  test("asof exec equals the in-memory reference on random tables") {
    import spark.implicits._
    val rowGen = for {
      id <- Gen.choose(0L, 10000L)
      k <- Gen.choose(0L, 6L)  // few keys -> dense per-key collisions
      t <- Gen.choose(0L, 20L) // small time domain -> many exact ties
    } yield (id, k, t)
    // (k, t) unique per side: within a (k, t) tie there would be more
    // than one eligible "latest" right row and the exec's input-order
    // tie rule vs the reference's maxBy could legitimately disagree.
    // Row ids reassigned by index so map keys never collide.
    val tableGen = Gen.listOfN(30, rowGen)
      .map(_.groupBy(r => (r._2, r._3)).map(_._2.head).toList
        .zipWithIndex.map { case ((_, k, t), i) => (i.toLong, k, t) })
    val prop = forAll(tableGen, tableGen, Gen.choose(1, 4)) { (ls, rs, parts) =>
      val l = ls.toDF("id", "k", "t").repartition(parts)
      val r = rs.toDF("rid", "rk", "rt").repartition(parts)
      val got = AsOfJoinApi.join(l, r, "k", "rk", "t", "rt")
        .select("id", "rid").collect()
        .map(x => x.getLong(0) ->
          (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
      val want = refAsof(ls, rs)
      if (got != want)
        println(s"MISMATCH\n  l=$ls\n  r=$rs\n  got=$got\n  want=$want")
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"asof property falsified: $res")
  }

  test("morton codes are bijective on the 8-bit x 8-bit domain") {
    import spark.implicits._
    // Exhaustive, not sampled: all 65536 cells through the SAME SQL the
    // query uses, asserting distinctness (bijectivity) and range.
    val cells = (for (x <- 0 until 256; y <- 0 until 256) yield (x.toLong, y.toLong))
      .toDF("zx", "zy")
    val morton = (0 until 8).map { b =>
      s"((zx div ${1L << b}) % 2) * ${1L << (2 * b)} + " +
        s"((zy div ${1L << b}) % 2) * ${1L << (2 * b + 1)}"
    }.mkString(" + ")
    val codes = cells.selectExpr(s"$morton AS m")
    assert(codes.distinct().count() == 65536L, "morton collided")
    val mm = codes.agg(org.apache.spark.sql.functions.min("m"),
      org.apache.spark.sql.functions.max("m")).head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == 65535L)
  }

  test("count-min never undercounts on random multisets") {
    import graft.functions.CountMinSketch
    val gen = Gen.listOfN(200, Gen.choose(-50L, 50L))
    val prop = forAll(gen) { xs =>
      val sk = xs.foldLeft(CountMinSketch.zero)(CountMinSketch.reduce)
      xs.distinct.forall { x =>
        CountMinSketch.estimate(sk, x) >= xs.count(_ == x)
      }
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(50), prop).passed)
  }
}
