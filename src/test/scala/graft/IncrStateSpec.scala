package graft

import org.apache.spark.sql.{DataFrame, Row}

import graft.operators.Dedup

/** Stored-state incremental dedup (round-11, VERDICT r10 item 2):
  * q_dedup_incr_stored writes the corpus signature/bucket table ONCE as
  * a persisted parquet artifact, then runs the delta path reading it.
  * Pins: (1) parity with the recompute form, (2) write-once idempotence
  * across constructions of the same corpus version, (3) the state is a
  * pure function of the CORPUS — deleting the delta from the input and
  * re-running yields bit-identical stored state. */
class IncrStateSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.toString)

  private lazy val fixtureFull: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-incrstate-full")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir.toString
  }

  private lazy val fixtureNoDelta: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-incrstate-nodelta")
    spark.read.parquet(s"$fixtureFull/documents.parquet")
      .filter("doc_id % 10 <> 7")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir.toString
  }

  test("stored-state form is row-identical to the recompute form") {
    val stored = rows(Dedup.dedupIncrStored(spark, fixtureFull))
    val recomputed = rows(Dedup.dedupIncr(spark, fixtureFull))
    assert(stored.nonEmpty, "fixture must produce at least one near-dup match")
    assert(stored === recomputed)
  }

  test("state is written once per corpus version and reused across runs") {
    Dedup.dedupIncrStored(spark, fixtureFull).count()
    val statePath = Dedup.sigStatePath(spark, fixtureFull)
    val marker = new org.apache.hadoop.fs.Path(statePath + "/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(marker), "ingest job must leave the commit marker")
    val mtime = fs.getFileStatus(marker).getModificationTime
    val again = Dedup.dedupIncrStored(spark, fixtureFull)
    again.count()
    assert(fs.getFileStatus(marker).getModificationTime === mtime,
      "second construction must NOT rewrite the stored state")
  }

  test("deleting the delta and re-running yields identical stored state") {
    Dedup.dedupIncrStored(spark, fixtureFull).count()
    val out = Dedup.dedupIncrStored(spark, fixtureNoDelta)
    assert(out.count() === 0L,
      "with the delta deleted there is nothing to match")
    val before = rows(spark.read.parquet(Dedup.sigStatePath(spark, fixtureFull)))
    val after = rows(spark.read.parquet(Dedup.sigStatePath(spark, fixtureNoDelta)))
    assert(before.nonEmpty)
    assert(after === before,
      "corpus signature state must be a pure function of the corpus side")
  }
}
