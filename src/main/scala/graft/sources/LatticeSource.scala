package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 demonstration source — the deepest extension tier on the
  * read side, complementing the XML star flattener (V1-style) and the
  * custom AsOfJoin operator (plan side): a `TableProvider` whose
  * `ScanBuilder` implements REAL filter pushdown and column pruning.
  *
  * The table is the deterministic point lattice the spatial join derives
  * from keys (`spark.read.format("lattice").option("n", …)`): id, the
  * 0.01°-lattice lat/lon, and a parity tag. What makes it a faithful
  * pushdown demo rather than a toy:
  *
  *  - `pushFilters` CONSUMES id-range predicates (>, >=, <, <=, =) by
  *    narrowing the generated key range — `planInputPartitions` then
  *    plans strictly fewer/smaller splits, which is observable in the
  *    scan description and in the row counts each partition serves
  *    (the V2 analog of parquet row-group pruning). Non-id filters are
  *    returned as residuals for Spark to evaluate.
  *  - `pruneColumns` narrows the produced schema, so a `select(lon)`
  *    never materializes lat/tag (the V2 analog of columnar projection).
  *  - `pushAggregation` COMPLETELY pushes ungrouped COUNT(*)/MIN(id)/
  *    MAX(id): the scan answers them in closed form over the (already
  *    filter-narrowed) key range and emits ONE row — zero rows ever
  *    cross the source boundary. This is the deepest V2 read tier
  *    (metadata-only aggregation, the analog of parquet footer
  *    count/min/max answering), and it composes with filter pushdown
  *    because Spark pushes filters first and only offers the aggregate
  *    when no residual filter remains.
  *  - `pushLimit` / `pushTopN` (id-ordered) truncate the planned range
  *    itself: LIMIT k keeps [lo, lo+k); ORDER BY id DESC LIMIT k keeps
  *    [hi−k, hi) served in descending order from a single partition, so
  *    Spark drops its own Sort+Limit entirely (fully pushed, not
  *    partial) — the generated-range analog of an index-ordered scan.
  *  - `estimateStatistics` reports the EXACT post-pushdown row count and
  *    byte size, so the static planner broadcasts a filter-narrowed
  *    lattice side without hints or AQE — pushdown feeding join
  *    strategy, the V2 statistics loop closed.
  *
  * LatticeSourceSpec pins both behaviors against the physical plan and
  * the row values against the shared derivation constants. Registered via
  * META-INF/services as short name `lattice`.
  */
class LatticeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "lattice"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LatticeTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LatticeTable(properties.getOrDefault("n", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt,
      properties.getOrDefault("batchRows", "100").toLong)
}

object LatticeTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** Shared with q_join_spatial's derivation — one constant set, two
    * consumers (the V2 reader and the DataFrame expression). */
  def lat(id: Long): Double = ((id * 37) % 12000) / 100.0 - 60 + 0.005
  def lon(id: Long): Double = ((id * 73) % 36000) / 100.0 - 180 + 0.005
}

class LatticeTable(n: Long, slices: Int, batchRows: Long = 100)
    extends Table with SupportsRead {
  override def name(): String = s"lattice($n)"
  override def schema(): StructType = LatticeTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LatticeScanBuilder(n, slices, batchRows)
}

class LatticeScanBuilder(n: Long, slices: Int, batchRows: Long = 100)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {

  private var lo = 0L
  private var hi = n
  private var pushed = Array.empty[Filter]
  private var required: StructType = LatticeTable.schema
  // Parsed pushed-aggregate plan: tokens in output order ("count"|"min"|"max").
  private var aggFuncs: Seq[String] = Nil
  // Pushed LIMIT/TopN: range truncation + serve order.
  private var descending = false
  private var limited = false

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int  => Some(i.toLong)
    case _       => None
  }

  // Saturating v+1: `id <= Long.MaxValue` must widen hi to the full range,
  // not overflow to Long.MinValue and produce an empty (wrong) scan. Same
  // guard on the lo side for `id > Long.MaxValue` (correctly empty, not
  // full-range via wraparound).
  private def succ(v: Long): Long =
    if (v == Long.MaxValue) Long.MaxValue else v + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filter {
      case GreaterThan("id", v) if asLong(v).isDefined =>
        // v = MaxValue admits no Long, so force an empty range instead of
        // relying on succ's saturation (which would wrongly include MaxValue).
        if (asLong(v).get == Long.MaxValue) { lo = n; hi = 0 }
        else lo = math.max(lo, asLong(v).get + 1)
        false
      case GreaterThanOrEqual("id", v) if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get); false
      case LessThan("id", v) if asLong(v).isDefined =>
        hi = math.min(hi, asLong(v).get); false
      case LessThanOrEqual("id", v) if asLong(v).isDefined =>
        hi = math.min(hi, succ(asLong(v).get)); false
      case EqualTo("id", v) if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get); hi = math.min(hi, succ(asLong(v).get)); false
      case _ => true
    }
    pushed = filters.diff(residual)
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("id"))
      case _                 => false
    }

  private def token(f: AggregateFunc): Option[String] = f match {
    case _: CountStar            => Some("count")
    case m: Min if isId(m.column) => Some("min")
    case m: Max if isId(m.column) => Some("max")
    case _                       => None
  }

  private def accepts(agg: Aggregation): Seq[Option[String]] =
    if (agg.groupByExpressions.nonEmpty) Seq(None)
    else agg.aggregateExpressions.toSeq.map(token)

  /** Closed-form answers are exact finals, never partials. An EMPTY
    * aggregation list must be declined, not vacuously accepted: the
    * optimizer prunes a pushed aggregate down to zero functions when an
    * outer count(*) discards its columns (df.count() over the agg
    * query), and claiming that push while building the plain row scan
    * trips Spark's column-count assertion. */
  override def supportCompletePushDown(agg: Aggregation): Boolean = {
    val parsed = accepts(agg)
    parsed.nonEmpty && parsed.forall(_.isDefined)
  }

  override def pushAggregation(agg: Aggregation): Boolean = {
    val parsed = accepts(agg)
    if (parsed.isEmpty || parsed.exists(_.isEmpty)) return false
    aggFuncs = parsed.flatten
    true
  }

  /** LIMIT k over the generated range IS a range truncation. */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, if (lo > Long.MaxValue - limit) Long.MaxValue else lo + limit)
    limited = true
    true
  }

  /** ORDER BY id [ASC|DESC] LIMIT k: keep the k-edge of the range and
    * serve it in the requested order — fully pushed, so Spark drops its
    * Sort+Limit. Multi-key or non-id orders are declined. */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (orders.length != 1 || !isId(orders(0).expression())) return false
    descending = orders(0).direction() == SortDirection.DESCENDING
    if (descending) lo = math.max(lo, if (hi < Long.MinValue + limit) Long.MinValue else hi - limit)
    else hi = math.min(hi, if (lo > Long.MaxValue - limit) Long.MaxValue else lo + limit)
    limited = true
    true
  }

  override def isPartiallyPushed(): Boolean = false

  override def build(): Scan =
    if (aggFuncs.nonEmpty)
      new LatticeAggScan(lo, math.max(lo, hi), aggFuncs, pushed)
    else
      // a pushed LIMIT/TopN must serve from ONE partition in key order;
      // the unlimited scan keeps its parallel slices
      new LatticeScan(lo, math.max(lo, hi), if (limited) 1 else slices,
        required, pushed, descending, limited, batchRows)
}

/** Aggregate-pushdown scan: one partition, one row, values computed from
  * the range bounds alone — the row universe is never enumerated. MIN/MAX
  * are null on an empty range (matching SQL aggregate semantics). */
class LatticeAggScan(lo: Long, hi: Long, funcs: Seq[String],
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case (f, i) => StructField(s"agg_${f}_$i", LongType, nullable = f != "count")
  })

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(LatticePartition(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory =
    new LatticeAggReaderFactory(funcs)

  override def description(): String =
    s"lattice AGG range=[$lo,$hi) funcs=[${funcs.mkString(", ")}] pushed=[${pushed.mkString(", ")}]"
}

class LatticeAggReaderFactory(funcs: Seq[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val lp = p.asInstanceOf[LatticePartition]
    val empty = lp.end <= lp.start
    val values: Seq[Any] = funcs.map {
      case "count" => math.max(0L, lp.end - lp.start)
      case "min"   => if (empty) null else lp.start
      case "max"   => if (empty) null else lp.end - 1
    }
    new PartitionReader[InternalRow] {
      private var served = false
      override def next(): Boolean = { val r = !served; served = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(values)
      override def close(): Unit = ()
    }
  }
}

class LatticeScan(lo: Long, hi: Long, slices: Int, schema: StructType,
    pushed: Array[Filter], descending: Boolean = false,
    limited: Boolean = false, batchRows: Long = 100) extends Scan with Batch
    with SupportsReportStatistics {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  /** The MICRO_BATCH_READ tier: the same (pushdown-narrowed, pruned)
    * generated range served as an append stream — `batchRows` ids become
    * available per trigger, the offset IS the next unserved id, and the
    * checkpointed offset round-trips through [[LatticeOffset]] json, so
    * a restarted query resumes mid-range without replay (pinned in
    * LatticeSourceSpec). This closes the DSv2 contract demonstrated by
    * the connector: batch read with five pushdown surfaces, catalog
    * routing, transactional write, and now incremental streaming read
    * from the identical table. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new LatticeMicroBatchStream(lo, math.max(lo, hi),
      math.max(1L, batchRows), schema)

  /** Exact stats for the post-pushdown range: generated data has no
    * estimation error, so the planner's broadcast decision is driven by
    * the true narrowed size (per-row bytes = the unsafe-row footprint of
    * the pruned schema, bounded below by the 8B id). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, hi - lo)
    private val rowBytes = math.max(8, schema.fields.map(_.dataType.defaultSize).sum + 8)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * rowBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val span = hi - lo
    if (span <= 0) return Array.empty
    val per = math.max(1L, (span + slices - 1) / slices)
    (0 until slices).iterator.flatMap { i =>
      val s = lo + i * per
      val e = math.min(hi, s + per)
      if (s < e) Some(LatticePartition(s, e): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LatticeReaderFactory(schema, descending)

  override def description(): String =
    s"lattice range=[$lo,$hi)" +
      (if (limited) s" limited${if (descending) " desc" else ""}" else "") +
      s" pushed=[${pushed.mkString(", ")}]"
}

case class LatticePartition(start: Long, end: Long) extends InputPartition

/** Stream offset = the next unserved lattice id; json is the bare long. */
case class LatticeOffset(v: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = v.toString
}

/** Micro-batch view of the [lo, hi) range, STATELESS by design: the
  * stream implements [[SupportsAdmissionControl]] so every availability
  * decision is the pure function `min(hi, start + batchRows)` of the
  * engine-supplied start offset — there is no cursor to desynchronize
  * from the checkpoint, which makes restart-without-replay correct by
  * construction (the first cut of this class kept a mutable cursor and
  * the restart spec caught it re-serving a committed batch; the
  * admission-control form is also how Spark's own rate source paces).
  * Each planned batch is ONE partition (the slice between consecutive
  * offsets); parallelism within a batch is the usual repartition
  * downstream. */
class LatticeMicroBatchStream(lo: Long, hi: Long, batchRows: Long,
    schema: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{
    CompositeReadLimit, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows}

  override def initialOffset(): Offset = LatticeOffset(lo)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)

  /** Rows this limit admits beyond `start`, honoring every ReadLimit
    * shape the engine can hand us: a bare maxRows, allAvailable (the
    * whole remaining range), and CompositeReadLimit (future trigger
    * modes combine maxRows with other admission settings — we extract
    * the tightest maxRows component rather than silently falling back
    * to the source's own batchRows). */
  private def admit(limit: ReadLimit): Long = limit match {
    case m: ReadMaxRows      => m.maxRows()
    case _: ReadAllAvailable => hi - lo // whole range; min(hi, ..) caps it
    case c: CompositeReadLimit =>
      val ls = c.getReadLimits
      val maxes = ls.collect { case m: ReadMaxRows => m.maxRows() }
      if (maxes.nonEmpty) maxes.min
      // A composite with allAvailable but no maxRows bound means "drain"
      // — admit the whole remaining range, same as a bare ReadAllAvailable
      // (falling back to batchRows here would silently re-pace a drain
      // trigger at the source's own default).
      else if (ls.exists(_.isInstanceOf[ReadAllAvailable])) hi - lo
      else batchRows
    case _ => batchRows
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LatticeOffset].v
    LatticeOffset(math.min(hi, s + math.max(1L, admit(limit))))
  }

  /** Deprecated non-admission path; the engine prefers the two-arg form
    * when SupportsAdmissionControl is present. */
  override def latestOffset(): Offset = LatticeOffset(hi)

  override def reportLatestOffset(): Offset = LatticeOffset(hi)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LatticeOffset].v
    val e = end.asInstanceOf[LatticeOffset].v
    if (s >= e) Array.empty else Array(LatticePartition(s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LatticeReaderFactory(schema)

  override def deserializeOffset(json: String): Offset =
    LatticeOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class LatticeReaderFactory(schema: StructType, descending: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val lp = p.asInstanceOf[LatticePartition]
    new PartitionReader[InternalRow] {
      private var cur = if (descending) lp.end else lp.start - 1
      override def next(): Boolean =
        if (descending) { cur -= 1; cur >= lp.start }
        else { cur += 1; cur < lp.end }
      override def get(): InternalRow = InternalRow.fromSeq(
        schema.fields.toSeq.map(_.name match {
          case "id"  => cur
          case "lat" => LatticeTable.lat(cur)
          case "lon" => LatticeTable.lon(cur)
          case "tag" => UTF8String.fromString(if (cur % 2 == 0) "even" else "odd")
        }))
      override def close(): Unit = ()
    }
  }
}
