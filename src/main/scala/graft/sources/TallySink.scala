package graft.sources

import java.io.{BufferedWriter, File, FileWriter}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 demonstration SINK — the write-side complement of
  * [[LatticeSource]]: a `TableProvider` + `SupportsWrite` whose
  * `BatchWrite` exercises the full two-phase commit protocol instead of
  * delegating to a built-in format.
  *
  * Output is one TSV file per non-empty input partition under the target
  * directory. What makes it a faithful protocol demo rather than a toy:
  *
  *  - Task isolation: each `DataWriter` streams rows to a hidden
  *    `.inprogress` temp file named by (partitionId, taskId), so
  *    speculative or retried attempts of the same partition never clobber
  *    each other, and a crashed attempt leaves no visible output.
  *  - Task commit: the rename to the final name happens in
  *    `DataWriter.commit`, which also returns a typed
  *    `WriterCommitMessage` carrying the task's row/byte tally.
  *  - Job commit: `BatchWrite.commit` runs on the driver AFTER every task
  *    committed, folds the tallies, and writes the `_tally` manifest —
  *    readers treat its presence as the atomicity marker (the `_SUCCESS`
  *    pattern). `abort` deletes any files an incomplete job left behind.
  *
  * Append-only (`TableCapability.BATCH_WRITE`): the schema is whatever
  * the query writes (`supportsExternalMetadata`), so
  * `df.write.format("tally").mode("append").option("path", dir)` works
  * for any flat schema of atomic types. TallySinkSpec pins file layout,
  * manifest totals, and read-back parity.
  */
class TallySink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tally"

  // Write-only: schema always arrives from the query via
  // supportsExternalMetadata; a read through this provider is a bug.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException("tally is a write-only sink")

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "tally sink requires option 'path'")
    new TallyTable(schema, path)
  }
}

class TallyTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  override def name(): String = s"tally($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new TallyBatchWrite(info.schema(), path, info.queryId())
        override def toStreaming: streaming.StreamingWrite =
          new TallyStreamingWrite(info.schema(), path)
      }
    }
}

/** Task tally returned from executor commit to driver commit. */
case class TallyCommit(file: String, rows: Long, bytes: Long)
    extends WriterCommitMessage

class TallyBatchWrite(schema: StructType, path: String, queryId: String)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new TallyWriterFactory(schema, path, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val tallies = messages.collect { case t: TallyCommit if t.rows > 0 => t }
    // The manifest IS the atomicity marker, so its own write must be atomic:
    // stream to a hidden temp sibling, then renameTo (atomic on a POSIX
    // filesystem). A driver crash mid-write leaves only ._tally.inprogress,
    // never a truncated _tally that readers would accept as success.
    val manifest = new File(path, "_tally")
    val tmp = new File(path, s"._tally.$queryId.inprogress")
    val w = new BufferedWriter(new FileWriter(tmp))
    try {
      w.write(s"rows=${tallies.map(_.rows).sum}\n")
      w.write(s"bytes=${tallies.map(_.bytes).sum}\n")
      w.write(s"files=${tallies.length}\n")
      tallies.map(_.file).sorted.foreach(f => w.write(s"file=$f\n"))
    } finally w.close()
    if (!tmp.renameTo(manifest))
      throw new java.io.IOException(s"tally sink: rename to $manifest failed")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.collect { case t: TallyCommit => t }
      .foreach(t => new File(path, t.file).delete())
    // Executors that died before task-level abort ran never produced a
    // commit message, so their .inprogress temps aren't named above; sweep
    // this job's orphans (temp names embed the queryId) so abort really
    // does remove everything an incomplete job left behind.
    val dir = new File(path)
    val orphans = Option(dir.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.getName.startsWith(".part-" + queryId) &&
        f.getName.endsWith(".inprogress"))
    orphans.foreach(_.delete())
  }
}

/** STREAMING write: the same two-phase protocol, made EXACTLY-ONCE under
  * micro-batch replay by determinism instead of a transaction log:
  *
  *  - Final data-file names are a pure function of (epochId, partitionId)
  *    — no taskId, no queryId — and task commit moves with
  *    REPLACE_EXISTING. A replayed epoch (restart after the sink wrote
  *    but before the engine committed the batch to its WAL) regenerates
  *    byte-identical content for the same offsets (the micro-batch is
  *    pinned by the offset log) and lands on the SAME file names, so
  *    replay overwrites rather than duplicates. This is the classic
  *    idempotent-sink contract Structured Streaming's exactly-once story
  *    is built on (file sink does the same via its manifest log).
  *  - Epoch commit writes a per-epoch `_tally.e<epoch>` manifest via the
  *    same atomic temp+rename; re-committing a replayed epoch rewrites
  *    identical totals — idempotent, never additive.
  *
  * Readers take the union of `part-e*.tsv` files; StreamTallySpec pins
  * no-duplication across a mid-stream restart and a forced epoch replay. */
class TallyStreamingWrite(schema: StructType, path: String)
    extends streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory =
    new TallyStreamingWriterFactory(schema, path)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val tallies = messages.collect { case t: TallyCommit if t.rows > 0 => t }
    // Deterministic names make replay idempotent only for partitions the
    // replay REGENERATES. If the replayed epoch has fewer partitions than
    // the first attempt (shuffle.partitions changed across a restart, or a
    // partition went empty), the first attempt's extra part-e<epoch>-p*.tsv
    // files would survive and duplicate rows for manifest-blind readers.
    // Sweep this epoch's part files that are NOT in the committed set,
    // BEFORE the manifest rename, so a manifest's existence always implies
    // the directory holds exactly its file list for that epoch.
    val committed = tallies.map(_.file).toSet
    val epochPrefix = f"part-e$epochId%06d-p"
    def sweepUncommitted(): Unit =
      Option(new File(path).listFiles()).getOrElse(Array.empty[File])
        .filter(f => f.getName.startsWith(epochPrefix) &&
          f.getName.endsWith(".tsv") && !committed.contains(f.getName))
        .foreach(_.delete())
    sweepUncommitted()
    val manifest = new File(path, f"_tally.e$epochId%06d")
    val tmp = new File(path, f"._tally.e$epochId%06d.inprogress")
    val w = new BufferedWriter(new FileWriter(tmp))
    try {
      w.write(s"rows=${tallies.map(_.rows).sum}\n")
      w.write(s"files=${tallies.length}\n")
      tallies.map(_.file).sorted.foreach(f => w.write(s"file=$f\n"))
    } finally w.close()
    java.nio.file.Files.move(tmp.toPath, manifest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // STRAGGLER WINDOW: the pre-rename sweep is not atomic with respect
    // to a zombie task from a PRIOR attempt of this same epoch — its
    // task-level rename to the deterministic final name can land after
    // the sweep and recreate an uncommitted part file. Re-sweep after
    // the manifest rename to close the common case (zombies that beat
    // the rename); a zombie landing after THIS sweep can still violate
    // the 'manifest implies exact file list' invariant for directory-
    // union readers, which is why the manifest embeds its file list:
    // a manifest-respecting reader (read only `file=` entries) is
    // correct under any straggler interleaving.
    sweepUncommitted()
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    // an aborted epoch's partial files are harmless (they will be
    // overwritten by the replay), but sweep its inprogress temps
    val dir = new File(path)
    Option(dir.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.getName.startsWith(".part-") &&
        f.getName.endsWith(".inprogress"))
      .foreach(_.delete())
  }
}

class TallyStreamingWriterFactory(schema: StructType, path: String)
    extends streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new TallyWriter(schema, path,
      f"part-e$epochId%06d-p$partitionId%05d.tsv", taskId)
}

class TallyWriterFactory(schema: StructType, path: String, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TallyWriter(schema, path, f"part-$queryId-$partitionId%05d.tsv", taskId)
}

class TallyWriter(schema: StructType, path: String,
    finalName: String, taskId: Long) extends DataWriter[InternalRow] {
  // taskId in the temp name keeps retried attempts of one partition from
  // colliding; only the committed attempt ever takes the final name
  private val tempFile = new File(path, s".$finalName.$taskId.inprogress")
  private var out: BufferedWriter = _
  private var rows = 0L
  private var bytes = 0L

  private def ensureOpen(): Unit = if (out == null) {
    tempFile.getParentFile.mkdirs()
    out = new BufferedWriter(new FileWriter(tempFile))
  }

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    val line = schema.fields.indices.map { i =>
      if (row.isNullAt(i)) "\\N"
      else schema.fields(i).dataType match {
        case LongType    => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType  => row.getDouble(i).toString
        case BooleanType => row.getBoolean(i).toString
        case StringType  => row.getUTF8String(i).toString
        case dt => throw new UnsupportedOperationException(
          s"tally sink: unsupported type $dt")
      }
    }.mkString("\t") + "\n"
    out.write(line)
    rows += 1
    bytes += line.getBytes("UTF-8").length
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    if (rows == 0) { tempFile.delete(); TallyCommit(finalName, 0, 0) }
    else {
      val dst = new File(path, finalName)
      // REPLACE_EXISTING: in batch mode the (queryId, partition) name is
      // unique so nothing is ever replaced; in streaming mode a replayed
      // epoch legitimately overwrites its own deterministic file — the
      // idempotence that makes the sink exactly-once under replay.
      java.nio.file.Files.move(tempFile.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      TallyCommit(finalName, rows, bytes)
    }
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    tempFile.delete()
  }

  override def close(): Unit = ()
}
