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

/** One sampled "frame": a byte window of the payload. */
case class MediaFrame(doc_id: Long, frame_id: Long, frame: Array[Byte])

/** A "resized" payload: fixed-size deterministic byte downsample. */
case class MediaResized(doc_id: Long, resized: Array[Byte])

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

  /** STUB frame sampler (video frame-sample analog): n evenly-spaced
    * fixed-width byte windows per payload. A real implementation would
    * seek keyframes with a codec; the batch shape (one payload → n typed
    * frame rows, partition-wise) is the real contract. */
  def frameSampleStub(in: MediaIn, nFrames: Int, width: Int): Seq[MediaFrame] = {
    val len = in.media.length
    (0 until nFrames).map { f =>
      val start = (len.toLong * f / nFrames).toInt
      val end = math.min(start + width, len)
      MediaFrame(in.doc_id, f.toLong, java.util.Arrays.copyOfRange(in.media, start, end))
    }
  }

  /** STUB resize (image-resize analog): deterministic every-k-th-byte
    * downsample to a fixed budget. Real code would call an image lib. */
  def resizeStub(in: MediaIn, targetBytes: Int): MediaResized = {
    val len = in.media.length
    if (len <= targetBytes) MediaResized(in.doc_id, in.media)
    else {
      val out = new Array[Byte](targetBytes)
      var i = 0
      while (i < targetBytes) {
        out(i) = in.media((len.toLong * i / targetBytes).toInt)
        i += 1
      }
      MediaResized(in.doc_id, out)
    }
  }

  /** Partition-wise frame sampling: one payload row → nFrames frame rows. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      nFrames: Int = 3, width: Int = 16): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[MediaIn]
      .flatMap(frameSampleStub(_, nFrames, width))
      .toDF()
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

  /** Frame sampling end-to-end, digested so the output is flat and the
    * frame extraction arithmetic is oracle-checkable byte-for-byte. */
  def mmFrames(s: SparkSession, d: String): DataFrame =
    sampleFrames(s, mediaTable(s, d))
      .select(col("doc_id"), col("frame_id"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5"))
      .orderBy(col("doc_id").asc, col("frame_id").asc)

  /** Resize end-to-end: the every-k-th-byte downsample stub through the
    * same typed partition-wise path as decode, digested flat. Docs at or
    * under the 24-byte budget pass through identity — the oracle mirrors
    * both branches. */
  def mmResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).select(col("doc_id"), col("media")).as[MediaIn]
      .mapPartitions(_.map(m => resizeStub(m, 24)))
      .toDF()
      .select(col("doc_id"),
        length(col("resized")).cast("long").as("resized_len"),
        md5(col("resized")).as("resized_md5"))
      .orderBy(col("doc_id").asc)
  }

  /** Perceptual blob dedup audit — the storage question for a media lake:
    * how many payloads collapse to the same content once normalized
    * (here: the deterministic 24-byte resize stub standing in for a
    * perceptual hash), and how many bytes would deduplicating them save?
    * Exact payload equality is useless for media (every file differs by
    * a header byte); the family key is the QUANTIZED decode-feature
    * vector (length ÷ 32, char-counts ÷ 4 — the stub analog of bucketing
    * a perceptual hash), which is how near-identical media actually
    * collide. Per family-size: family count, original byte mass, and
    * bytes saved keeping the min-doc_id representative (min_by /
    * arg_min on both engines). One typed partition-wise decode pass —
    * the features carry the byte length, so no second scan or join. */
  def mmDedup(s: SparkSession, d: String): DataFrame =
    decodeFeatures(s, mediaTable(s, d))
      .select(col("doc_id"), col("n_bytes"),
        expr("concat(n_bytes div 32, ':', cnt_a div 4, ':', cnt_e div 4, " +
          "':', cnt_t div 4)").as("pkey"))
      .groupBy(col("pkey"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("fam_bytes"),
        expr("min_by(n_bytes, doc_id)").as("keep_bytes"))
      .groupBy(col("n_docs"))
      .agg(count(lit(1)).as("n_families"),
        sum(col("fam_bytes")).as("orig_bytes"),
        sum(expr("fam_bytes - keep_bytes")).as("saved_bytes"))
      .orderBy(col("n_docs").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_dedup"    -> mmDedup,
    "q_mm_binary"   -> mmBinary,
    "q_mm_features" -> mmFeatures,
    "q_mm_resize"   -> mmResize,
    "q_mm_frames"   -> mmFrames
  )

  // These oracles equate Spark's byte-level ops on cast(text AS BINARY)
  // with DuckDB's character-level length/substr/md5 on text — equivalent
  // only because this corpus is single-byte ASCII (TestdataInvariantsSpec
  // pins that invariant; multi-byte UTF-8 would diverge byte vs char).
  val oracle: Map[String, String] = Map(
    // Same decode-feature arithmetic as q_mm_features, quantized into the
    // family key, then the family rollup; the byte/char equivalence note
    // above applies.
    "q_mm_dedup" ->
      """WITH f AS (
        |  SELECT doc_id, length(text) AS n_bytes,
        |         length(text) - length(replace(text, 'a', '')) AS cnt_a,
        |         length(text) - length(replace(text, 'e', '')) AS cnt_e,
        |         length(text) - length(replace(text, 't', '')) AS cnt_t
        |  FROM documents),
        |fam AS (
        |  SELECT (n_bytes // 32) || ':' || (cnt_a // 4) || ':'
        |           || (cnt_e // 4) || ':' || (cnt_t // 4) AS pkey,
        |         count(*) AS n_docs,
        |         CAST(sum(n_bytes) AS BIGINT) AS fam_bytes,
        |         CAST(arg_min(n_bytes, doc_id) AS BIGINT) AS keep_bytes
        |  FROM f GROUP BY 1)
        |SELECT n_docs, count(*) AS n_families,
        |       CAST(sum(fam_bytes) AS BIGINT) AS orig_bytes,
        |       CAST(sum(fam_bytes - keep_bytes) AS BIGINT) AS saved_bytes
        |FROM fam
        |GROUP BY n_docs
        |ORDER BY n_docs ASC""".stripMargin,
    "q_mm_binary" ->
      """SELECT doc_id,
        |       length(text) AS n_bytes,
        |       md5(text) AS digest,
        |       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte
        |FROM documents
        |ORDER BY doc_id ASC""".stripMargin,
    "q_mm_frames" ->
      """SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
        |       length(substr(text, (length(text) * frame_id) // 3 + 1, 16)) AS frame_len,
        |       md5(substr(text, (length(text) * frame_id) // 3 + 1, 16)) AS frame_md5
        |FROM documents CROSS JOIN (VALUES (0), (1), (2)) f(frame_id)
        |ORDER BY doc_id ASC, frame_id ASC""".stripMargin,
    "q_mm_resize" ->
      """WITH r AS (
        |  SELECT doc_id,
        |         CASE WHEN length(text) <= 24 THEN text
        |              ELSE array_to_string(list_transform(range(0, 24),
        |                i -> substr(text,
        |                  CAST((length(text) * i) // 24 AS INTEGER) + 1, 1)), '')
        |         END AS resized
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(length(resized) AS BIGINT) AS resized_len,
        |       md5(resized) AS resized_md5
        |FROM r
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
