package graft

import org.apache.spark.sql.functions._

/** Typed-row fixture for the Dataset-surface test (top-level for the
  * implicit Encoder derivation). */
case class Ev(user_id: Long, value: Double)

/** OSM-XML → star flattening golden test (FIXTURES.md §B). */
class OsmXmlSpec extends SparkSpec {

  private def fixture: String =
    getClass.getResource("/sample.osm").getPath

  test("nodes: 3 rows with typed attributes") {
    val n = sources.OsmXml.nodes(spark, fixture).orderBy("id").collect()
    assert(n.length == 3)
    assert(n(0).getLong(0) == 1L && n(0).getDouble(1) == 43.6532)
    assert(n(1).getAs[String]("user") == "bob")
  }

  test("nodes_tags: colon split + problemchars dropped → 3 rows") {
    val t = sources.OsmXml.nodesTags(spark, fixture)
      .orderBy("id", "key").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("key"),
        r.getAs[String]("value"), r.getAs[String]("type")))
    assert(t.toSeq == Seq(
      (2L, "amenity", "cafe", "regular"),
      (2L, "postcode", "m5v 1j2", "addr"),
      (2L, "street", "King St", "addr")))
  }

  test("ways + ways_tags + ways_nodes: ordered nd positions; relation skipped") {
    val w = sources.OsmXml.ways(spark, fixture).collect()
    assert(w.length == 1 && w(0).getAs[String]("user") == "carol")
    val wt = sources.OsmXml.waysTags(spark, fixture).orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("value"), r.getAs[String]("type")))
    assert(wt.toSeq == Seq(("highway", "residential", "regular"),
      ("name", "King Street West", "regular")))
    val wn = sources.OsmXml.waysNodes(spark, fixture).orderBy("position").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("node_id"), r.getAs[Int]("position")))
    assert(wn.toSeq == Seq((100L, 1L, 0), (100L, 2L, 1), (100L, 3L, 2)))
  }

  test("audit finds unexpected street types before cleaning, none after") {
    val tags = sources.OsmXml.nodesTags(spark, fixture)
    val before = sources.OsmPipeline.auditStreetTypes(tags).collect()
    assert(before.length == 1 && before(0).getString(0) == "St"
      && before(0).getLong(1) == 1L)
    val after = sources.OsmPipeline.auditStreetTypes(
      sources.OsmXml.cleanTags(tags)).collect()
    assert(after.isEmpty)
  }

  test("processMap writes the cleaned 5-table star; report queries run over it") {
    val out = java.nio.file.Files.createTempDirectory("graft-osm").toString
    val star = sources.OsmPipeline.processMap(spark, fixture, out)
    assert(star.keySet == Set("nodes", "nodes_tags", "ways", "ways_tags", "ways_nodes"))
    assert(spark.read.parquet(s"$out/nodes").count() == 3)
    assert(spark.read.parquet(s"$out/nodes_tags")
      .filter(col("key") === "street").head().getAs[String]("value") == "King Street")
    val top = sources.OsmPipeline.topContributors(star).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(top.head == ("alice", 2L)) // nodes 1 and 3
    val amen = sources.OsmPipeline.topAmenities(star).collect()
    assert(amen.length == 1 && amen(0).getString(0) == "cafe")
  }

  test("tag census counts all top-level element types; contributor count dedups") {
    assert(sources.OsmPipeline.tagCensus(spark, fixture) ==
      Map("node" -> 3L, "way" -> 1L, "relation" -> 1L))
    val star = sources.OsmXml.loadStar(spark, fixture)
    assert(sources.OsmPipeline.contributorCount(star) == 3) // alice, bob, carol
  }

  test("validation: star conforms to the declared schema; violations surface") {
    import org.apache.spark.sql.types._
    val nodes = sources.OsmXml.nodes(spark, fixture)
    val expected = StructType(Seq(
      StructField("id", LongType), StructField("lat", DoubleType),
      StructField("lon", DoubleType), StructField("user", StringType),
      StructField("uid", LongType), StructField("version", StringType),
      StructField("changeset", LongType), StructField("timestamp", StringType)))
    Validate.conforms(nodes, expected, Seq("id", "lat", "lon", "uid"))
    // a violating frame is detected
    import spark.implicits._
    val dirty = Seq((Some(1L), Some("a")), (None, Some("b")), (Some(3L), None))
      .toDF("id", "user")
    assert(Validate.nullViolations(dirty, Seq("id", "user")).count() == 2)
    intercept[IllegalStateException] {
      Validate.conforms(dirty, dirty.schema, Seq("id"))
    }
  }

  test("typed Dataset surface: case-class rows through groupByKey") {
    import spark.implicits._
    val ds = Tables.events(spark, sf0001)
      .select(col("user_id"), col("value")).as[Ev]
    val counts = ds.groupByKey(_.user_id).count().collect().toMap
    val expected = Tables.events(spark, sf0001).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == expected)
  }

  test("cleaning pass: St→Street, postcode upper-cased; idempotent") {
    val cleaned = sources.OsmXml.cleanTags(sources.OsmXml.nodesTags(spark, fixture))
    val vals = cleaned.orderBy("id", "key").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    assert(vals("street") == "King Street")
    assert(vals("postcode") == "M5V 1J2")
    val twice = sources.OsmXml.cleanTags(cleaned).orderBy("id", "key").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    assert(twice == vals)
  }
}
