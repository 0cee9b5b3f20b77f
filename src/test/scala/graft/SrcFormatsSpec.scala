package graft

import org.apache.spark.sql.functions._

/** Pins for the text ingest surfaces (q_src_jsonl / q_src_csv): the
  * on-disk copies really are the claimed wire formats, and the
  * round-tripped rows are value-identical to the parquet originals —
  * not merely count-preserving.
  */
class SrcFormatsSpec extends SparkSpec {

  test("jsonl: files are newline-delimited JSON and rows round-trip exactly") {
    operators.Relational.srcJsonl(spark, sf0001).collect() // materialize dir
    val dir = new java.io.File(
      operators.Relational.layoutDir(spark, sf0001, "documents", "jsonl_docs"))
    val parts = dir.listFiles.filter(_.getName.endsWith(".json"))
    assert(parts.nonEmpty, s"no .json part files in $dir")
    val first = scala.io.Source.fromFile(parts.minBy(_.getName))
      .getLines().take(1).toList.head
    assert(first.startsWith("{") && first.contains("\"doc_id\""),
      s"not JSONL: $first")
    val orig = Tables.documents(spark, sf0001).orderBy(col("doc_id"))
    val back = spark.read.schema(orig.schema).json(dir.getPath)
      .orderBy(col("doc_id"))
    assert(back.collect().toSeq == orig.collect().toSeq)
  }

  test("csv: files carry a header and rows round-trip exactly, doubles included") {
    operators.Relational.srcCsv(spark, sf0001).collect()
    val dir = new java.io.File(
      operators.Relational.layoutDir(spark, sf0001, "customer", "csv_cust"))
    val parts = dir.listFiles.filter(_.getName.endsWith(".csv"))
    assert(parts.nonEmpty, s"no .csv part files in $dir")
    val header = scala.io.Source.fromFile(parts.minBy(_.getName))
      .getLines().take(1).toList.head
    assert(header.startsWith("c_custkey,"), s"missing header: $header")
    val orig = Tables.customer(spark, sf0001).orderBy(col("c_custkey"))
    val back = spark.read.schema(orig.schema).option("header", "true")
      .csv(dir.getPath).orderBy(col("c_custkey"))
    assert(back.collect().toSeq == orig.collect().toSeq)
  }
}
