package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pins the V2 write path: file-per-partition layout, manifest totals
  * folded from task commit messages, no stray temp files, and read-back
  * parity with the input rows. */
class TallySinkSpec extends SparkSpec {

  private def listNames(dir: String): Seq[String] =
    new File(dir).listFiles().map(_.getName).toSeq.sorted

  test("tally sink: manifest totals and files match the written rows") {
    val dir = Files.createTempDirectory("tally").toString
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"))
      .repartition(4, col("doc_id"))
    val nRows = df.count()
    df.write.format("tally").mode("append").option("path", dir).save()

    val names = listNames(dir)
    assert(names.contains("_tally"))
    val parts = names.filter(_.startsWith("part-"))
    assert(parts.nonEmpty && parts.size <= 4)
    assert(!names.exists(_.endsWith(".inprogress")), "temp files must not survive commit")

    val manifest = scala.io.Source.fromFile(new File(dir, "_tally")).getLines().toSeq
    def mval(k: String): Long =
      manifest.find(_.startsWith(s"$k=")).get.drop(k.length + 1).toLong
    assert(mval("rows") == nRows)
    assert(mval("files") == parts.size.toLong)
    assert(manifest.count(_.startsWith("file=")) == parts.size)

    // read-back parity: one TSV line per row, ids survive the trip
    val lines = parts.flatMap(p =>
      scala.io.Source.fromFile(new File(dir, p)).getLines().toSeq)
    assert(lines.size.toLong == nRows)
    assert(mval("bytes") == lines.map(_.getBytes("UTF-8").length + 1L).sum)
    val idsBack = lines.map(_.split("\t")(0).toLong).sorted
    val idsIn = df.select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(idsBack == idsIn)
  }

  test("tally sink: empty partitions produce no files but commit still succeeds") {
    val dir = Files.createTempDirectory("tally").toString
    val df = Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 3).repartition(8, col("doc_id"))
    df.write.format("tally").mode("append").option("path", dir).save()
    val parts = listNames(dir).filter(_.startsWith("part-"))
    assert(parts.size < 8, "empty partitions must not emit files")
    val manifest = scala.io.Source.fromFile(new File(dir, "_tally")).getLines().toSeq
    assert(manifest.contains(s"files=${parts.size}"))
  }
}
