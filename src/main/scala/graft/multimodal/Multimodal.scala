package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Input row for the decode stage: an opaque binary payload + typed
  * metadata — the multimodal column pattern (image/audio/video travel as
  * `binary`, never as exploded rows). */
case class MediaIn(doc_id: Long, media: Array[Byte])

/** Output of the (stubbed) decoder: per-item feature summary. */
case class MediaFeat(doc_id: Long, n_bytes: Long, cnt_a: Long, cnt_e: Long,
  cnt_t: Long, ratio_a: Double, ratio_e: Double)

/** Multimodal column plumbing (driver-ordered extension).
  *
  * Real pipelines decode media with native libs inside a partition-wise
  * batch operator (Scala `mapPartitions` here — the JVM analog of
  * `mapInPandas`): the executor streams a partition of binary payloads
  * through the decoder without ever collecting to the driver, and emits a
  * typed feature row per item. No image/audio libs exist in this
  * container, so `decodeStub` is a deterministic fake (byte-histogram
  * features) — the Spark-side plumbing (schema, encoders, partition
  * batching, feature shape) is real and oracled; swap `decodeStub`'s body
  * for an actual decoder at deployment.
  */
object Multimodal {

  /** STUB: stands in for image/audio decode + feature extraction. Counts
    * selected bytes and derives ratio features — deterministic, so the
    * whole pipeline stays oracle-checkable. */
  def decodeStub(in: MediaIn): MediaFeat = {
    var a = 0L; var e = 0L; var t = 0L
    var i = 0
    val bytes = in.media
    while (i < bytes.length) {
      bytes(i) match {
        case 'a' => a += 1
        case 'e' => e += 1
        case 't' => t += 1
        case _   =>
      }
      i += 1
    }
    val n = bytes.length.toLong
    MediaFeat(in.doc_id, n, a, e, t,
      a.toDouble / n, e.toDouble / n)
  }

  /** Partition-wise decode: binary column in, typed features out. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[MediaIn]
      .mapPartitions(_.map(decodeStub))
      .toDF()
  }

  /** documents.text as the stand-in binary payload. */
  private def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("media"))

  /** Binary-column metadata ops: length, digest, first byte. */
  def mmBinary(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(
        col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("digest"),
        ascii(substring(col("media").cast("string"), 1, 1)).cast("long")
          .as("first_byte"))
      .orderBy(col("doc_id").asc)

  /** The mapPartitions decode pipeline end-to-end. */
  def mmFeatures(s: SparkSession, d: String): DataFrame =
    decodeFeatures(s, mediaTable(s, d)).orderBy(col("doc_id").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_binary"   -> mmBinary,
    "q_mm_features" -> mmFeatures
  )

  val oracle: Map[String, String] = Map(
    "q_mm_binary" ->
      """SELECT doc_id,
        |       length(text) AS n_bytes,
        |       md5(text) AS digest,
        |       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte
        |FROM documents
        |ORDER BY doc_id ASC""".stripMargin,
    "q_mm_features" ->
      """SELECT doc_id,
        |       length(text) AS n_bytes,
        |       length(text) - length(replace(text, 'a', '')) AS cnt_a,
        |       length(text) - length(replace(text, 'e', '')) AS cnt_e,
        |       length(text) - length(replace(text, 't', '')) AS cnt_t,
        |       CAST(length(text) - length(replace(text, 'a', '')) AS DOUBLE)
        |         / length(text) AS ratio_a,
        |       CAST(length(text) - length(replace(text, 'e', '')) AS DOUBLE)
        |         / length(text) AS ratio_e
        |FROM documents
        |ORDER BY doc_id ASC""".stripMargin
  )
}
