package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Geospatial operators (SURVEY.md §2.11): bounding-box filtering and a
  * haversine-distance scalar UDF — the "geospatial UDFs" surface from the
  * north star. Coordinates are derived deterministically from keys
  * (testdata has no lat/lon), as integer arithmetic + 0.5 so both engines
  * agree bit-for-bit on the inputs.
  */
object Geo {

  /** Haversine great-circle distance in km. Registered as a Scala UDF —
    * note UDFs are opaque to Catalyst (never put one in a filter that
    * should push down); it runs post-filter here. Delegates to the same
    * static formula the native `haversine_km` expression evaluates and
    * code-generates, so the two surfaces cannot drift (GeoExprSpec). */
  val haversineKm: (Double, Double, Double, Double) => Double =
    (lat1, lon1, lat2, lon2) => graft.functions.Haversine.km(lat1, lon1, lat2, lon2)

  private def withCoords(df: DataFrame): DataFrame =
    df.withColumn("lat", (col("c_custkey") % 180 - 90).cast("double") + 0.5)
      .withColumn("lon", ((col("c_custkey") * 7) % 360 - 180).cast("double") + 0.5)

  /** Bounding-box filter + count per nation (min/max lat-lon audit analog). */
  def geoBbox(s: SparkSession, d: String): DataFrame = {
    val c = withCoords(Tables.customer(s, d))
    val n = broadcast(Tables.nation(s, d))
    c.filter(col("lat").between(-45.0, 45.0) && col("lon").between(-90.0, 90.0))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("cnt"),
        round(min(col("lat")), 1).as("min_lat"),
        round(max(col("lat")), 1).as("max_lat"))
      .orderBy(col("n_name").asc)
  }

  /** Top-50 customers nearest a fixed anchor by haversine UDF distance.
    * Ranking uses the ROUNDED distance + unique key tiebreak so a 1-ulp
    * libm difference between engines can never flip the order. */
  def geoHaversine(s: SparkSession, d: String): DataFrame = {
    val hav = udf(haversineKm)
    withCoords(Tables.customer(s, d))
      .withColumn("dist_km",
        round(hav(col("lat"), col("lon"), lit(43.6532), lit(-79.3832)), 3))
      .select(col("c_custkey"), col("lat"), col("lon"), col("dist_km"))
      .orderBy(col("dist_km").asc, col("c_custkey").asc)
      .limit(50)
  }

  /** Grid-cell (geohash-style) spatial aggregation: 10°×10° cells via
    * floor division — the partition-key pattern that turns spatial joins
    * and density maps into equi-key work at scale (cell id = shuffle key,
    * exactly like the time bucket in the range join). floor(x/10.0), not
    * integer `div`: Spark's div truncates toward zero while DuckDB's //
    * floors, so negative coordinates would disagree. */
  def geoGrid(s: SparkSession, d: String): DataFrame =
    withCoords(Tables.customer(s, d))
      .withColumn("cell_lat", floor(col("lat") / 10.0).cast("long"))
      .withColumn("cell_lon", floor(col("lon") / 10.0).cast("long"))
      .groupBy(col("cell_lat"), col("cell_lon"))
      .agg(count(lit(1)).as("cnt"), min(col("c_custkey")).as("first_cust"))
      .orderBy(col("cell_lat").asc, col("cell_lon").asc)

  /** 8-bit-per-axis Morton (Z-order) interleave as portable integer
    * arithmetic: bit b of x lands at position 2b, of y at 2b+1. Written
    * with div/mod + power-of-two multipliers (no shift operators) so the
    * SAME formula renders for Spark (`div`) and DuckDB (`//`) — generated
    * from one constant, like the langid/decontam oracles. */
  private def mortonSql(divOp: String): String =
    (0 until 8).map { b =>
      s"((zx $divOp ${1L << b}) % 2) * ${1L << (2 * b)} + " +
        s"((zy $divOp ${1L << b}) % 2) * ${1L << (2 * b + 1)}"
    }.mkString(" + ")

  /** Z-ORDER data layout: map each row's 2-D cell to a Morton code and
    * roll up per 64-cell z-block (morton div 64). Consecutive z-blocks
    * cover spatially COMPACT regions — bbox_area per block stays small —
    * which is what makes `repartitionByRange(morton) + write` prune
    * multi-dimensional predicates from file-level min/max stats at
    * 100 TB; a row-order layout gives every file a corpus-wide bbox. The
    * declared output is the per-block locality audit (count + bbox), all
    * exact integer math. */
  def geoZorder(s: SparkSession, d: String): DataFrame =
    withCoords(Tables.customer(s, d))
      .withColumn("zx", (floor((col("lon") + 180.0) / 2.0)).cast("long"))
      .withColumn("zy", (floor((col("lat") + 90.0) / 2.0)).cast("long"))
      .withColumn("morton", expr(mortonSql("div")))
      .withColumn("zblock", expr("morton div 64"))
      .groupBy(col("zblock"))
      .agg(count(lit(1)).as("cnt"),
        min(col("zx")).as("min_x"), max(col("zx")).as("max_x"),
        min(col("zy")).as("min_y"), max(col("zy")).as("max_y"))
      .withColumn("bbox_area",
        (col("max_x") - col("min_x") + 1) * (col("max_y") - col("min_y") + 1))
      .orderBy(col("zblock").asc)

  /** The same nearest-50 ranking as q_geo_haversine, computed by the
    * NATIVE codegen expression instead of the UDF — the "functions, not
    * UDFs" tier of the preference order: no closure boxing per row, and
    * the distance stays inside whole-stage codegen (plan-asserted). The
    * oracle is identical to q_geo_haversine's formula SQL. */
  def geoDistNative(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExprs.register(s)
    withCoords(Tables.customer(s, d))
      .withColumn("dist_km",
        round(expr("haversine_km(lat, lon, 43.6532d, -79.3832d)"), 3))
      .select(col("c_custkey"), col("lat"), col("lon"), col("dist_km"))
      .orderBy(col("dist_km").asc, col("c_custkey").asc)
      .limit(50)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_geo_dist_native" -> geoDistNative,
    "q_geo_zorder"    -> geoZorder,
    "q_geo_bbox"      -> geoBbox,
    "q_geo_haversine" -> geoHaversine,
    "q_geo_grid"      -> geoGrid
  )

  private val haversineOracle =
    """SELECT c_custkey, lat, lon,
      |       round(2 * 6371.0088 * asin(sqrt(
      |         pow(sin(radians(43.6532 - lat) / 2), 2)
      |         + cos(radians(lat)) * cos(radians(43.6532))
      |           * pow(sin(radians(-79.3832 - lon) / 2), 2))), 3) AS dist_km
      |FROM (
      |  SELECT c_custkey,
      |         CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.5 AS lat,
      |         CAST((c_custkey * 7) % 360 - 180 AS DOUBLE) + 0.5 AS lon
      |  FROM customer)
      |ORDER BY dist_km ASC, c_custkey ASC
      |LIMIT 50""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_geo_dist_native" -> haversineOracle,
    "q_geo_zorder" ->
      s"""WITH cells AS (
        |  SELECT CAST(floor((lon + 180.0) / 2.0) AS BIGINT) AS zx,
        |         CAST(floor((lat + 90.0) / 2.0) AS BIGINT) AS zy
        |  FROM (
        |    SELECT CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.5 AS lat,
        |           CAST((c_custkey * 7) % 360 - 180 AS DOUBLE) + 0.5 AS lon
        |    FROM customer)),
        |m AS (
        |  SELECT zx, zy, ${mortonSql("//")} AS morton FROM cells)
        |SELECT morton // 64 AS zblock, count(*) AS cnt,
        |       min(zx) AS min_x, max(zx) AS max_x,
        |       min(zy) AS min_y, max(zy) AS max_y,
        |       (max(zx) - min(zx) + 1) * (max(zy) - min(zy) + 1) AS bbox_area
        |FROM m
        |GROUP BY zblock
        |ORDER BY zblock ASC""".stripMargin,
    "q_geo_grid" ->
      """SELECT CAST(floor(lat / 10.0) AS BIGINT) AS cell_lat,
        |       CAST(floor(lon / 10.0) AS BIGINT) AS cell_lon,
        |       count(*) AS cnt, min(c_custkey) AS first_cust
        |FROM (
        |  SELECT c_custkey,
        |         CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.5 AS lat,
        |         CAST((c_custkey * 7) % 360 - 180 AS DOUBLE) + 0.5 AS lon
        |  FROM customer)
        |GROUP BY cell_lat, cell_lon
        |ORDER BY cell_lat ASC, cell_lon ASC""".stripMargin,
    "q_geo_bbox" ->
      """SELECT n_name, count(*) AS cnt,
        |       round(min(lat), 1) AS min_lat,
        |       round(max(lat), 1) AS max_lat
        |FROM (
        |  SELECT c_nationkey,
        |         CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.5 AS lat,
        |         CAST((c_custkey * 7) % 360 - 180 AS DOUBLE) + 0.5 AS lon
        |  FROM customer)
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE lat BETWEEN -45.0 AND 45.0 AND lon BETWEEN -90.0 AND 90.0
        |GROUP BY n_name
        |ORDER BY n_name ASC""".stripMargin,
    "q_geo_haversine" -> haversineOracle
  )
}
