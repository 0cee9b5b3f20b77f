package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OSM-XML → relational star flattener: the reference pipeline's core ETL
  * re-expressed on Spark 4's native XML source (semantic spec: the Udacity
  * "shape_element" contract — see SURVEY.md §1.1 [U]; /root/reference was
  * empty, so no file:line citations exist).
  *
  * Output is the fixed 5-table star schema:
  *   nodes(id, lat, lon, user, uid, version, changeset, timestamp)
  *   nodes_tags(id, key, value, type)   ways(id, user, uid, ...)
  *   ways_tags(id, key, value, type)    ways_nodes(id, node_id, position)
  *
  * Semantics preserved from the reference:
  *  - tag keys matching problemchars are dropped;
  *  - keys containing ':' split at the FIRST colon → (type, rest-of-key);
  *  - way→nd refs keep document order, materialized as `position`;
  *  - <relation> elements are skipped entirely (rowTag selection).
  *
  * Scale: the XML source splits files across tasks and each element
  * flattens independently — the same streaming-ETL shape as iterparse,
  * but partition-parallel.
  */
object OsmXml {

  val ProblemChars = "[=+/&<>;'\"?%#$@,. \t\r\n]"

  /** Street-type correction dictionary (audit.py `update_name` analog). */
  val DefaultMapping: Map[String, String] = Map(
    "St" -> "Street", "St." -> "Street", "Ave" -> "Avenue", "Rd" -> "Road")

  private def splitTags(df: DataFrame): DataFrame =
    df.select(col("_id").as("id"), explode(col("tag")).as("t"))
      .select(col("id"), col("t._k").as("k"), col("t._v").as("value"))
      .filter(!col("k").rlike(ProblemChars))
      .withColumn("type",
        when(col("k").contains(":"), substring_index(col("k"), ":", 1))
          .otherwise("regular"))
      .withColumn("key",
        when(col("k").contains(":"),
          expr("substring(k, length(substring_index(k, ':', 1)) + 2)"))
          .otherwise(col("k")))
      .select(col("id"), col("key"), col("value"), col("type"))

  def nodes(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "node").load(path)
      .select(
        col("_id").cast("long").as("id"),
        col("_lat").cast("double").as("lat"),
        col("_lon").cast("double").as("lon"),
        col("_user").as("user"),
        col("_uid").cast("long").as("uid"),
        col("_version").cast("string").as("version"),
        col("_changeset").cast("long").as("changeset"),
        col("_timestamp").cast("string").as("timestamp"))

  def nodesTags(spark: SparkSession, path: String): DataFrame =
    splitTags(spark.read.format("xml").option("rowTag", "node").load(path)
      .filter(col("tag").isNotNull))

  def ways(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "way").load(path)
      .select(
        col("_id").cast("long").as("id"),
        col("_user").as("user"),
        col("_uid").cast("long").as("uid"),
        col("_version").cast("string").as("version"),
        col("_changeset").cast("long").as("changeset"),
        col("_timestamp").cast("string").as("timestamp"))

  def waysTags(spark: SparkSession, path: String): DataFrame =
    splitTags(spark.read.format("xml").option("rowTag", "way").load(path)
      .filter(col("tag").isNotNull))

  def waysNodes(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "way").load(path)
      .select(col("_id").cast("long").as("id"),
        posexplode(col("nd")).as(Seq("position", "nd")))
      .select(col("id"), col("nd._ref").cast("long").as("node_id"),
        col("position").cast("int").as("position"))

  /** <relation> header attributes — the element type the 5-table star
    * deliberately skips (reference contract); exposed as its own reader
    * so multipolygon/route consumers aren't forced back to raw XML. */
  def relations(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "relation").load(path)
      .select(
        col("_id").cast("long").as("id"),
        col("_user").as("user"),
        col("_uid").cast("long").as("uid"),
        col("_version").cast("string").as("version"),
        col("_changeset").cast("long").as("changeset"),
        col("_timestamp").cast("string").as("timestamp"))

  /** relation→member list in document order (type/ref/role + position) —
    * the ways_nodes analog for relations. */
  def relationsMembers(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "relation").load(path)
      .select(col("_id").cast("long").as("id"),
        posexplode(col("member")).as(Seq("position", "m")))
      .select(col("id"), col("m._type").as("member_type"),
        col("m._ref").cast("long").as("ref"), col("m._role").as("role"),
        col("position").cast("int").as("position"))

  /** The full star in one call. */
  def loadStar(spark: SparkSession, path: String): Map[String, DataFrame] = Map(
    "nodes"      -> nodes(spark, path),
    "nodes_tags" -> nodesTags(spark, path),
    "ways"       -> ways(spark, path),
    "ways_tags"  -> waysTags(spark, path),
    "ways_nodes" -> waysNodes(spark, path))

  /** Cleaning pass (audit.py analog): map the trailing street-type token
    * through the correction dict; upper-case postcodes. Pure column
    * expressions — constant-folded literal map, no UDF, no shuffle. */
  def cleanTags(tags: DataFrame, mapping: Map[String, String] = DefaultMapping): DataFrame = {
    val mapCol = map(mapping.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
    val lastTok = regexp_extract(col("value"), "(\\S+)$", 1)
    tags
      .withColumn("value",
        when(col("type") === "addr" && col("key") === "street",
          concat(
            expr("substring(value, 1, length(value) - length(regexp_extract(value, '(\\\\S+)$', 1)))"),
            coalesce(element_at(mapCol, lastTok), lastTok)))
          .when(col("type") === "addr" && col("key") === "postcode",
            upper(col("value")))
          .otherwise(col("value")))
  }
}
