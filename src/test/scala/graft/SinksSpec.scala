package graft

import org.apache.spark.sql.functions._

/** Source/sink round-trips (SURVEY §2.1 non-query rows): the reference
  * exports CSV; parquet is the Verify harness's native sink. */
class SinksSpec extends SparkSpec {

  test("CSV sink round-trips the cleaned star tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val tags = sources.OsmXml.cleanTags(
      sources.OsmXml.nodesTags(spark, getClass.getResource("/sample.osm").getPath))
    tags.write.mode("overwrite").option("header", "true").csv(s"$dir/nodes_tags")
    val back = spark.read.option("header", "true").csv(s"$dir/nodes_tags")
    assert(back.count() == tags.count())
    assert(back.columns.toSeq == Seq("id", "key", "value", "type"))
    val street = back.filter(col("key") === "street").head()
    assert(street.getAs[String]("value") == "King Street")
  }

  test("CSV source: PERMISSIVE mode surfaces corrupt records instead of failing") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-dirty").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/dirty.csv"),
      "1,alice\nnot_a_number,bob\n3,carol\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    try {
      assert(df.count() == 3)
      val bad = df.filter(col("_corrupt_record").isNotNull).collect()
      assert(bad.length == 1 && bad(0).getAs[String]("_corrupt_record")
        .startsWith("not_a_number"))
      assert(df.filter(col("id").isNotNull).count() == 2)
    } finally df.unpersist()
  }

  test("ORC sink round-trips lineitem columns byte-exact with pushdown intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
    li.write.mode("overwrite").orc(s"$dir/li")
    val back = spark.read.orc(s"$dir/li")
    assert(back.count() == li.count())
    assert(back.orderBy(col("l_orderkey"), col("l_linenumber")).collect()
      .sameElements(li.orderBy(col("l_orderkey"), col("l_linenumber")).collect()))
    // the second columnar format keeps the same pushdown contract
    val filtered = back.filter(col("l_quantity") < 10)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("LessThan"),
      s"ORC scan lost predicate pushdown:\n$p")
  }

  test("JSON-lines sink round-trips documents with schema and values intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    docs.write.mode("overwrite").json(s"$dir/docs")
    // read back WITH the schema (json inference would widen/reorder);
    // the newline-delimited layout is splittable, so at scale the read
    // parallelizes per line block exactly like CSV
    val back = spark.read.schema(docs.schema).json(s"$dir/docs")
    assert(back.count() == docs.count())
    val a = docs.orderBy(col("doc_id")).collect()
    val b = back.orderBy(col("doc_id")).collect()
    assert(a.sameElements(b), "JSONL round-trip altered rows")
  }

  test("XML sink round-trips the nodes table (sample.py writes OSM XML)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xml").toString
    val nodes = sources.OsmXml.nodes(spark, getClass.getResource("/sample.osm").getPath)
    nodes.write.mode("overwrite").format("xml")
      .option("rootTag", "osm").option("rowTag", "node")
      .save(s"$dir/nodes")
    val back = spark.read.format("xml").option("rowTag", "node")
      .load(s"$dir/nodes")
    assert(back.count() == nodes.count())
    assert(back.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("ORC sink round-trips with schema and values intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val df = operators.Aggs.aggGroupby(spark, sf0001)
    df.write.mode("overwrite").orc(s"$dir/q1")
    val back = spark.read.orc(s"$dir/q1")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy(col("l_returnflag"), col("l_linestatus")).collect().toSeq ==
      df.collect().toSeq)
  }

  test("JSON-lines sink round-trips with an explicit read schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val df = operators.Text.textStats(spark, sf0001)
    df.write.mode("overwrite").json(s"$dir/stats")
    // schema-on-read: inference would widen longs fine but the production
    // shape pins the schema explicitly
    val back = spark.read.schema(df.schema).json(s"$dir/stats")
    assert(back.orderBy(col("lang")).collect().toSeq == df.collect().toSeq)
  }

  test("parquet sink preserves schema and order-insensitive content") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    val df = operators.Aggs.topkGroups(spark, sf0001)
    df.write.mode("overwrite").parquet(s"$dir/topk")
    val back = spark.read.parquet(s"$dir/topk")
    // nullability flags may widen through parquet; names+types must hold
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy(desc("cnt"), asc("user_id")).collect().toSeq ==
      df.collect().toSeq)
  }
}
