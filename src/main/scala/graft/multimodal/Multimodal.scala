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

/** Parsed RIFF/WAVE header fields; None throughout when validation
  * fails (bad magic, inconsistent chunk sizes). */
case class WavMeta(doc_id: Long, valid: Long, channels: Option[Long],
  sample_rate: Option[Long], byte_rate: Option[Long],
  data_len: Option[Long], dur_micro: Option[Long])

/** Walked PNG-style chunk-directory summary; None when the walk fails
  * (bad signature, truncated chunk, trailing garbage). */
case class ChunkMeta(doc_id: Long, valid: Long, n_chunks: Option[Long],
  total_payload: Option[Long], last_type: Option[String])

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

  /** Assemble a REAL fixed binary layout — a canonical 44-byte RIFF/WAVE
    * PCM header (the public WAVE format: RIFF size, "WAVE", "fmt " chunk
    * of 16, audioFormat=1, channels, sampleRate, byteRate, blockAlign,
    * 16-bit samples, "data" chunk) followed by the payload bytes. Every
    * numeric field is little-endian, exactly as the format specifies.
    * Audio parameters derive deterministically from doc_id (1–2 channels,
    * 8/12/16/20 kHz) so the parse is oracle-checkable; docs where
    * doc_id % 97 == 0 get a corrupted magic ("RIFX") so the validity
    * census exercises the rejection path on real rows. */
  def buildWav(docId: Long, data: Array[Byte]): Array[Byte] = {
    val channels = (1 + docId % 2).toShort
    val rate = (8000 + (docId % 4) * 4000).toInt
    val byteRate = rate * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put((if (docId % 97 == 0) "RIFX" else "RIFF").getBytes("US-ASCII"))
    bb.putInt(36 + data.length)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII"))
    bb.putInt(16)                       // fmt chunk size (PCM)
    bb.putShort(1)                      // audioFormat = PCM
    bb.putShort(channels)
    bb.putInt(rate)
    bb.putInt(byteRate)
    bb.putShort((channels * 2).toShort) // blockAlign
    bb.putShort(16)                     // bits per sample
    bb.put("data".getBytes("US-ASCII"))
    bb.putInt(data.length)
    bb.put(data)
    bb.array()
  }

  /** Parse a RIFF/WAVE header from raw bytes — the real decode step: the
    * parser sees ONLY the byte array (no side-channel to the builder),
    * validates all four magics and both chunk-size invariants, and
    * decodes the little-endian u16/u32 fields by hand. Invalid payloads
    * degrade to a (valid=0, all-null) row instead of failing the task —
    * the posture a 100 TB media scan needs (bad files are data, not
    * exceptions). dur_micro = data_len * 1e6 / byte_rate, the duration a
    * player would report. */
  def parseWav(docId: Long, wav: Array[Byte]): WavMeta = {
    def u16(o: Int): Long = (wav(o) & 0xffL) | ((wav(o + 1) & 0xffL) << 8)
    def u32(o: Int): Long = (wav(o) & 0xffL) | ((wav(o + 1) & 0xffL) << 8) |
      ((wav(o + 2) & 0xffL) << 16) | ((wav(o + 3) & 0xffL) << 24)
    def tag(o: Int, t: String): Boolean =
      new String(wav, o, 4, "US-ASCII") == t
    val ok = wav.length >= 44 && tag(0, "RIFF") && tag(8, "WAVE") &&
      tag(12, "fmt ") && u32(16) == 16L && u16(20) == 1L &&
      tag(36, "data") && u32(40) == wav.length - 44L &&
      u32(4) == wav.length - 8L
    if (!ok) WavMeta(docId, 0L, None, None, None, None, None)
    else {
      val br = u32(28)
      val dl = u32(40)
      WavMeta(docId, 1L, Some(u16(22)), Some(u32(24)), Some(br), Some(dl),
        Some(dl * 1000000L / br))
    }
  }

  /** The 8-byte PNG signature (public spec): 0x89 'PNG' CR LF SUB LF. */
  private val PngSig: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a.toByte, '\n')

  private val ChunkTypes = Array("IHDR", "IDAT", "IEND")

  /** Assemble a PNG-style CHUNK DIRECTORY — the other canonical binary
    * shape after WAV's fixed header: a signature followed by a chain of
    * [length u32 BIG-endian][4-char type][payload] chunks that a reader
    * must WALK, not index. Chunk count = 1 + doc_id % 3, payload lengths
    * 8 + (doc_id + i) % 8, types cycling IHDR/IDAT/IEND — all derived
    * from doc_id so the walk is oracle-checkable. Docs where
    * doc_id % 89 == 0 get a corrupted signature byte. */
  def buildChunks(docId: Long): Array[Byte] = {
    val n = (1 + docId % 3).toInt
    val lens = (0 until n).map(i => (8 + (docId + i) % 8).toInt)
    val bb = java.nio.ByteBuffer.allocate(8 + lens.map(_ + 8).sum)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(PngSig)
    if (docId % 89 == 0) bb.put(3, 'X'.toByte)
    (0 until n).foreach { i =>
      bb.putInt(lens(i))
      bb.put(ChunkTypes(((docId + i) % 3).toInt).getBytes("US-ASCII"))
      var j = 0
      while (j < lens(i)) { bb.put(('a' + ((i + j) % 26)).toByte); j += 1 }
    }
    bb.array()
  }

  /** Walk a PNG-style chunk directory from raw bytes: validate the
    * signature, then repeatedly decode a big-endian u32 length + 4-char
    * type and hop over the payload. The walk must land EXACTLY on the
    * end of the buffer with ≥1 chunk — truncation, trailing garbage, or
    * a bad signature all degrade to a (valid=0, all-null) row, never a
    * task failure. */
  def parseChunks(docId: Long, b: Array[Byte]): ChunkMeta = {
    def u32be(o: Int): Long = ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    val sigOk = b.length >= 8 && PngSig.indices.forall(i => b(i) == PngSig(i))
    if (!sigOk) ChunkMeta(docId, 0L, None, None, None)
    else {
      var off = 8
      var n = 0L
      var payload = 0L
      var last: String = null
      var bad = false
      while (!bad && off < b.length) {
        if (off + 8 > b.length) bad = true
        else {
          val len = u32be(off)
          if (off + 8 + len > b.length) bad = true
          else {
            last = new String(b, off + 4, 4, "US-ASCII")
            payload += len
            n += 1
            off += 8 + len.toInt
          }
        }
      }
      if (bad || n == 0) ChunkMeta(docId, 0L, None, None, None)
      else ChunkMeta(docId, 1L, Some(n), Some(payload), Some(last))
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

  /** WAV-header round trip end-to-end: synthesize a spec-exact RIFF/WAVE
    * blob per document (payload = first 64 text bytes), then PARSE it
    * back byte-level in the same typed partition-wise pass — the
    * multimodal tier's "decode a real fixed binary layout" operator.
    * The parse can only succeed by decoding the little-endian fields
    * correctly; the ~1% corrupted-magic slice proves the validity census
    * actually rejects. Oracle recomputes the expected fields from the
    * same doc_id arithmetic the builder used — equality certifies
    * build→parse is the identity on every valid row. */
  def mmWavhdr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        substring(col("text"), 1, 64).cast("binary").as("media"))
      .as[MediaIn]
      .mapPartitions(_.map(m => parseWav(m.doc_id, buildWav(m.doc_id, m.media))))
      .toDF()
      .orderBy(col("doc_id").asc)
  }

  /** Chunk-directory round trip: build the PNG-style chain per document,
    * walk it back big-endian in the same typed partition-wise pass. The
    * ~1% corrupted-signature slice exercises the rejection path; the
    * oracle replays the chunk arithmetic from doc_id, so a match
    * certifies the big-endian walk end-to-end. */
  def mmChunks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => parseChunks(id, buildChunks(id))))
      .toDF()
      .orderBy(col("doc_id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_chunks"   -> mmChunks,
    "q_mm_dedup"    -> mmDedup,
    "q_mm_binary"   -> mmBinary,
    "q_mm_features" -> mmFeatures,
    "q_mm_resize"   -> mmResize,
    "q_mm_frames"   -> mmFrames,
    "q_mm_wavhdr"   -> mmWavhdr
  )

  // These oracles equate Spark's byte-level ops on cast(text AS BINARY)
  // with DuckDB's character-level length/substr/md5 on text — equivalent
  // only because this corpus is single-byte ASCII (TestdataInvariantsSpec
  // pins that invariant; multi-byte UTF-8 would diverge byte vs char).
  val oracle: Map[String, String] = Map(
    // The oracle recomputes the header fields from the builder's doc_id
    // arithmetic (channels = 1 + doc_id % 2, rate = 8000 + (doc_id % 4)
    // * 4000, payload = min(n_chars, 64) bytes — single-byte ASCII, see
    // note above); Spark's side must recover the SAME numbers by parsing
    // the little-endian bytes, so a match certifies the byte layout and
    // the decode together. The % 97 slice must parse as invalid.
    // Chunk arithmetic replay: i ranges over 0..n_chunks-1 via a range
    // join; total payload = Σ (8 + (doc_id + i) % 8); last type = the
    // IHDR/IDAT/IEND cycle at i = n_chunks - 1. The % 89 slice must walk
    // as invalid.
    "q_mm_chunks" ->
      """WITH c AS (
        |  SELECT d.doc_id, t.i
        |  FROM documents d, range(0, 3) t(i)
        |  WHERE t.i < 1 + d.doc_id % 3),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |         CAST(sum(8 + (doc_id + i) % 8) AS BIGINT) AS total_payload,
        |         (['IHDR', 'IDAT', 'IEND'])[CAST((doc_id + max(i)) % 3 AS INTEGER) + 1]
        |           AS last_type
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id,
        |       CAST(CASE WHEN doc_id % 89 = 0 THEN 0 ELSE 1 END AS BIGINT) AS valid,
        |       CASE WHEN doc_id % 89 = 0 THEN NULL ELSE n_chunks END AS n_chunks,
        |       CASE WHEN doc_id % 89 = 0 THEN NULL ELSE total_payload END AS total_payload,
        |       CASE WHEN doc_id % 89 = 0 THEN NULL ELSE last_type END AS last_type
        |FROM agg
        |ORDER BY doc_id ASC""".stripMargin,
    "q_mm_wavhdr" ->
      """SELECT doc_id,
        |       CAST(CASE WHEN doc_id % 97 = 0 THEN 0 ELSE 1 END AS BIGINT) AS valid,
        |       CASE WHEN doc_id % 97 = 0 THEN NULL
        |            ELSE CAST(1 + doc_id % 2 AS BIGINT) END AS channels,
        |       CASE WHEN doc_id % 97 = 0 THEN NULL
        |            ELSE CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) END AS sample_rate,
        |       CASE WHEN doc_id % 97 = 0 THEN NULL
        |            ELSE CAST((8000 + (doc_id % 4) * 4000)
        |                      * (1 + doc_id % 2) * 2 AS BIGINT) END AS byte_rate,
        |       CASE WHEN doc_id % 97 = 0 THEN NULL
        |            ELSE CAST(least(length(text), 64) AS BIGINT) END AS data_len,
        |       CASE WHEN doc_id % 97 = 0 THEN NULL
        |            ELSE CAST(least(length(text), 64) * 1000000
        |                      // ((8000 + (doc_id % 4) * 4000)
        |                         * (1 + doc_id % 2) * 2) AS BIGINT) END AS dur_micro
        |FROM documents
        |ORDER BY doc_id ASC""".stripMargin,
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
