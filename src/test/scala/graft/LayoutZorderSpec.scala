package graft

import org.apache.spark.sql.functions._

/** The Z-order layout's load-bearing property, measured on the actual
  * written files: every file's (partkey × suppkey) bounding box is a
  * small 2-D TILE, where a 1-D sort on partkey alone produces full-width
  * STRIPES on the suppkey axis — the difference that lets a conjunctive
  * 2-D range predicate prune on both columns' min/max stats. */
class LayoutZorderSpec extends SparkSpec {

  private def fileBoxes(dir: String) =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("p0"), max("l_partkey").as("p1"),
        min("l_suppkey").as("s0"), max("l_suppkey").as("s1"))
      .collect()
      .map(r => (r.getLong(2) - r.getLong(1), r.getLong(4) - r.getLong(3)))

  test("z-ordered files tile BOTH key domains; a 1-d sort stripes one of them") {
    // materialize the declared layout (idempotent) and read its boxes
    SparkEntry.queries("q_src_zorder")(spark, sf0001).collect()
    val zDir = operators.Relational.layoutDir(spark, sf0001, "lineitem", "zorder_li")
    val zBoxes = fileBoxes(zDir)

    // contrast layout: same data, range-sorted on partkey only
    val oneDir = java.nio.file.Files.createTempDirectory("graft-1dsort").toString
    Tables.lineitem(spark, sf0001)
      .repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(oneDir)
    val oneBoxes = fileBoxes(oneDir)

    val pFull = 200L  // part count at sf0.001 (TestdataInvariantsSpec)
    val sFull = 10L   // supplier count
    // z-order: most files span well under half of EACH domain
    val zTiled = zBoxes.count { case (ps, ss) =>
      ps <= pFull / 2 && ss <= sFull / 2 }
    assert(zTiled >= zBoxes.length / 2,
      s"z-order did not tile: ${zBoxes.mkString(", ")}")
    // 1-d sort: partkey spans are tight but suppkey spans are (near-)full
    // on essentially every file — the stripe shape z-order exists to fix
    val striped = oneBoxes.count { case (_, ss) => ss >= sFull - 2 }
    assert(striped >= oneBoxes.length - 2,
      s"expected suppkey stripes in the 1-d layout: ${oneBoxes.mkString(", ")}")

    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(oneDir)).iterator().asScala
      .toSeq.sortBy(-_.getNameCount)
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("zvalue interleave is monotone-local: adjacent cells differ in low bits only") {
    import spark.implicits._
    // 4x4 grid: the z-curve visits (0,0),(1,0),(0,1),(1,1),(2,0)... —
    // pin the first quad exactly (bit-interleave definition, a=x lsb)
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 3L))
      .toDF("a", "b")
      .withColumn("z", operators.Relational.zvalue(col("a"), col("b"), 2))
    val z = df.collect().map(_.getLong(2)).toSeq
    assert(z == Seq(0L, 1L, 2L, 3L, 15L), s"z-values off: $z")
  }
}
