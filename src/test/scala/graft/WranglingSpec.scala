package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}

/** Wrangling-trio semantics (SURVEY.md §5.2.2/§5.2.4): normalization
  * mapping + idempotence, tag-classify regex classes, postcode shapes. */
class WranglingSpec extends SparkSpec {

  private val mapping = Map("St" -> "Street", "St." -> "Street",
    "Ave" -> "Avenue", "Rd" -> "Road")
  private def updateName(name: String): String = {
    val parts = name.split(" ")
    val last = parts.last
    (parts.dropRight(1) :+ mapping.getOrElse(last, last)).mkString(" ")
  }

  test("street normalization maps trailing token and is idempotent") {
    assert(updateName("King St") == "King Street")
    assert(updateName("King Street West") == "King Street West")
    val gen = for {
      base <- Gen.oneOf("King", "Queen", "Main")
      suffix <- Gen.oneOf("St", "St.", "Ave", "Rd", "Street", "Lane")
    } yield s"$base $suffix"
    val prop = forAll(gen) { n => updateName(updateName(n)) == updateName(n) }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("tag classification matches the template's four regex classes") {
    import spark.implicits._
    val df = Seq("name", "addr:street", "weird#char", "Name", "a:b:c")
      .toDF("key")
      .withColumn("cls",
        when(col("key").rlike("^([a-z]|_)*$"), "lower")
          .when(col("key").rlike("^([a-z]|_)*:([a-z]|_)*$"), "lower_colon")
          .when(col("key").rlike("[=+/&<>;'\"?%#$@,. \t\r\n]"), "problemchars")
          .otherwise("other"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "name" -> "lower", "addr:street" -> "lower_colon",
      "weird#char" -> "problemchars", "Name" -> "other", "a:b:c" -> "other"))
  }

  test("postcode normalization: upper-case + shape validation") {
    import spark.implicits._
    val df = Seq("m5v", "M4W", "#7x", "9AB").toDF("pc")
      .withColumn("norm", upper(col("pc")))
      .withColumn("valid", col("norm").rlike("^[A-Z][0-9][A-Z]$"))
    val got = df.collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(got == Map("m5v" -> true, "M4W" -> true, "#7x" -> false, "9AB" -> false))
  }

  test("dedup signature is stable under token permutation (property)") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.oneOf("the", "fast", "key", "sort", "scan"))
    val prop = forAll(gen) { words =>
      val perm = scala.util.Random.shuffle(words)
      def sig(ws: List[String]): String =
        spark.createDataset(Seq(ws.mkString(" "))).toDF("text")
          .select(concat_ws(" ",
            array_sort(array_distinct(split(col("text"), " ")))).as("sig"))
          .head().getString(0)
      sig(words) == sig(perm)
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop).passed)
  }

  test("haversine properties: symmetry, identity, non-negativity, bound") {
    val h = operators.Geo.haversineKm
    val gen = for {
      lat1 <- Gen.choose(-89.0, 89.0); lon1 <- Gen.choose(-179.0, 179.0)
      lat2 <- Gen.choose(-89.0, 89.0); lon2 <- Gen.choose(-179.0, 179.0)
    } yield (lat1, lon1, lat2, lon2)
    val prop = forAll(gen) { case (a, b, c, d) =>
      val fwd = h(a, b, c, d); val rev = h(c, d, a, b)
      math.abs(fwd - rev) < 1e-9 && fwd >= 0 &&
        fwd <= 20039.0 && // half the mean circumference + slack
        h(a, b, a, b) == 0.0
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("jaccard properties: range [0,1], self-similarity 1 (property)") {
    val gen = for {
      a <- Gen.nonEmptyListOf(Gen.choose(0, 30))
      b <- Gen.nonEmptyListOf(Gen.choose(0, 30))
    } yield (a.toSet, b.toSet)
    val prop = forAll(gen) { case (sa, sb) =>
      val inter = (sa & sb).size.toDouble
      val jac = inter / (sa.size + sb.size - inter)
      jac >= 0.0 && jac <= 1.0 &&
        { val self = sa.size.toDouble / sa.size; self == 1.0 }
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("set operation cardinality laws vs Scala sets (property)") {
    import spark.implicits._
    val gen = for {
      a <- Gen.listOf(Gen.choose(0, 20))
      b <- Gen.listOf(Gen.choose(0, 20))
    } yield (a, b)
    val prop = forAll(gen) { case (a, b) =>
      val da = a.toDF("v"); val db = b.toDF("v")
      da.union(db).distinct().count() == (a.toSet ++ b.toSet).size &&
      da.intersect(db).count() == (a.toSet & b.toSet).size &&
      da.except(db).count() == (a.toSet -- b.toSet).size
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop).passed)
  }
}
