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
