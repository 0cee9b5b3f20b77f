package graft

import org.apache.spark.sql.functions._

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
