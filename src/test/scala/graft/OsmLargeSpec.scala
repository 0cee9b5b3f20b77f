package graft

import org.apache.spark.sql.functions._

/** Larger OSM golden: a deterministic 1,320-element synthetic extract
  * written as FOUR .osm files in one directory, so the XML source's
  * multi-file (multi-partition) read path is exercised — the small
  * sample.osm golden is a single split by construction. Every expected
  * number below is derived arithmetically from the generator, never
  * measured-and-pasted. */
class OsmLargeSpec extends SparkSpec {

  private val NodesN = 1200
  private val WaysN = 80
  private val RelsN = 40
  private val Files = 4

  /** Deterministic multi-file extract: nodes split round-robin-by-range
    * across files; ways/relations likewise. Tag pattern per node id i:
    *  - i%3==0  → addr:street ("King St" if i%6==0 else "Queen Ave")
    *              + addr:postcode "m5v 1j2" (lowercase, cleaning target)
    *  - i%5==0  → amenity cycling cafe/bank/school by (i/5)%3
    *  - i%11==0 → a problemchars key ("weird key") the splitter must drop
    */
  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-osm-large")
    val nodesPerFile = NodesN / Files
    val waysPerFile = WaysN / Files
    val relsPerFile = RelsN / Files
    for (f <- 0 until Files) {
      val sb = new StringBuilder
      sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<osm version=\"0.6\">\n"
      for (j <- 1 to nodesPerFile) {
        val i = f * nodesPerFile + j
        sb ++= s"""  <node id="$i" lat="${43.0 + i * 1e-4}" lon="${-79.0 - i * 1e-4}" user="user${i % 7}" uid="${i % 7}" version="1" changeset="${1000 + i}" timestamp="2015-01-01T00:00:00Z""""
        val tags = new StringBuilder
        if (i % 3 == 0) {
          val street = if (i % 6 == 0) "King St" else "Queen Ave"
          tags ++= s"""    <tag k="addr:street" v="$street"/>\n"""
          tags ++= "    <tag k=\"addr:postcode\" v=\"m5v 1j2\"/>\n"
        }
        if (i % 5 == 0) {
          val amenity = Seq("cafe", "bank", "school")((i / 5) % 3)
          tags ++= s"""    <tag k="amenity" v="$amenity"/>\n"""
        }
        if (i % 11 == 0)
          tags ++= "    <tag k=\"weird key\" v=\"skip-me\"/>\n"
        if (tags.isEmpty) sb ++= "/>\n"
        else { sb ++= ">\n"; sb ++= tags; sb ++= "  </node>\n" }
      }
      for (j <- 1 to waysPerFile) {
        val w = f * waysPerFile + j
        sb ++= s"""  <way id="${10000 + w}" user="wuser${w % 3}" uid="${100 + w % 3}" version="1" changeset="${2000 + w}" timestamp="2015-02-01T00:00:00Z">\n"""
        for (p <- 0 until 5)
          sb ++= s"""    <nd ref="${(w * 5 + p) % NodesN + 1}"/>\n"""
        sb ++= "    <tag k=\"highway\" v=\"residential\"/>\n"
        sb ++= s"""    <tag k="name" v="Route $w"/>\n"""
        sb ++= "  </way>\n"
      }
      for (j <- 1 to relsPerFile) {
        val r = f * relsPerFile + j
        sb ++= s"""  <relation id="${20000 + r}" user="ruser" uid="200" version="1" changeset="${3000 + r}" timestamp="2015-03-01T00:00:00Z">\n"""
        sb ++= s"""    <member type="way" ref="${10000 + (r * 2) % WaysN + 1}" role="outer"/>\n"""
        sb ++= s"""    <member type="node" ref="${(r * 7) % NodesN + 1}" role="inner"/>\n"""
        sb ++= "  </relation>\n"
      }
      sb ++= "</osm>\n"
      java.nio.file.Files.writeString(dir.resolve(s"part-$f.osm"), sb.toString)
    }
    dir.toString
  }

  test("multi-file read really is multi-partition") {
    assert(sources.OsmXml.nodes(spark, fixtureDir).rdd.getNumPartitions >= 2,
      "4-file extract should not collapse into one input split")
  }

  test("element counts across files: nodes, ways, relations, census") {
    assert(sources.OsmXml.nodes(spark, fixtureDir).count() == NodesN)
    assert(sources.OsmXml.ways(spark, fixtureDir).count() == WaysN)
    assert(sources.OsmXml.relations(spark, fixtureDir).count() == RelsN)
    assert(sources.OsmPipeline.tagCensus(spark, fixtureDir) ==
      Map("node" -> NodesN.toLong, "way" -> WaysN.toLong, "relation" -> RelsN.toLong))
  }

  test("nodes_tags at volume: split/drop rules hold arithmetically") {
    val streets = (1 to NodesN).count(_ % 3 == 0)       // 400
    val amenities = (1 to NodesN).count(_ % 5 == 0)     // 240
    val t = sources.OsmXml.nodesTags(spark, fixtureDir)
    assert(t.count() == 2L * streets + amenities)       // problem keys dropped
    assert(t.filter(col("key") === "street" && col("type") === "addr").count() == streets)
    assert(t.filter(col("key").contains(" ")).count() == 0)
    // amenity histogram: each of cafe/bank/school gets exactly a third
    val amen = sources.OsmPipeline.topAmenities(
      Map("nodes_tags" -> t)).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(amen == Map("cafe" -> 80L, "bank" -> 80L, "school" -> 80L))
  }

  test("ways_nodes ordering and relation members at volume") {
    val wn = sources.OsmXml.waysNodes(spark, fixtureDir)
    assert(wn.count() == WaysN * 5L)
    assert(wn.groupBy("id").agg(max("position").as("mx"))
      .filter(col("mx") =!= 4).count() == 0)
    // spot-check one way's exact ordered refs against the generator rule
    val w7 = wn.filter(col("id") === 10007).orderBy("position").collect()
      .map(_.getAs[Long]("node_id")).toSeq
    assert(w7 == (0 until 5).map(p => ((7 * 5 + p) % NodesN + 1).toLong))
    val rm = sources.OsmXml.relationsMembers(spark, fixtureDir)
    assert(rm.count() == RelsN * 2L)
    assert(rm.filter(col("position") === 0).filter(col("member_type") =!= "way").count() == 0)
    assert(rm.filter(col("position") === 1).filter(col("member_type") =!= "node").count() == 0)
    val r3 = rm.filter(col("id") === 20003).orderBy("position").collect()
    assert(r3(0).getAs[Long]("ref") == 10000 + (3 * 2) % WaysN + 1)
    assert(r3(0).getAs[String]("role") == "outer")
    assert(r3(1).getAs[Long]("ref") == (3 * 7) % NodesN + 1)
  }

  test("audit → clean at volume: St/Ave corrected, postcodes upper-cased") {
    val tags = sources.OsmXml.nodesTags(spark, fixtureDir)
    val before = sources.OsmPipeline.auditStreetTypes(tags).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val kings = (1 to NodesN).count(_ % 6 == 0)         // 200
    val queens = (1 to NodesN).count(i => i % 3 == 0 && i % 6 != 0) // 200
    assert(before == Map("St" -> kings.toLong, "Ave" -> queens.toLong))
    val cleaned = sources.OsmXml.cleanTags(tags)
    assert(sources.OsmPipeline.auditStreetTypes(cleaned).collect().isEmpty)
    val streetVals = cleaned.filter(col("key") === "street")
      .select("value").distinct().collect().map(_.getString(0)).toSet
    assert(streetVals == Set("King Street", "Queen Avenue"))
    assert(cleaned.filter(col("key") === "postcode" && col("value") =!= "M5V 1J2")
      .count() == 0)
  }

  test("processMap + reports over the large star") {
    val out = java.nio.file.Files.createTempDirectory("graft-osm-large-star").toString
    val star = sources.OsmPipeline.processMap(spark, fixtureDir, out)
    assert(spark.read.parquet(s"$out/nodes").count() == NodesN)
    assert(spark.read.parquet(s"$out/ways_nodes").count() == WaysN * 5L)
    // contributors: 7 node uids (0..6) + 3 way uids (100..102), no overlap
    assert(sources.OsmPipeline.contributorCount(star) == 10)
    val expected = ((1 to NodesN).groupBy(i => ("user" + i % 7, (i % 7).toLong))
      .view.mapValues(_.size.toLong).toMap ++
      (1 to WaysN).groupBy(w => ("wuser" + w % 3, (100 + w % 3).toLong))
        .view.mapValues(_.size.toLong).toMap)
    val top = sources.OsmPipeline.topContributors(star, k = 15).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    assert(top.toMap == expected)
    // the report really is sorted by contribution count
    assert(top.map(_._2).toSeq == top.map(_._2).sortBy(-_).toSeq)
  }
}
