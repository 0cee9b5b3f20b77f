package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet star schema (TESTDATA.md).
  *
  * Every operator binds its input tables through here so the whole engine
  * reads the same way: one parquet file per table under a scale-factor
  * directory. At cluster scale the same entry point would swap to a
  * partitioned/bucketed catalog table without touching any operator code.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet schema per file path, inferred once per JVM. Without an
    * explicit schema every `spark.read.parquet` launches a footer-reading
    * job at PLAN CONSTRUCTION time — one cluster scheduling round-trip
    * per table reference before any query runs, measured as exactly the
    * +1 job on all 243 query constructions. With the memo, inference runs
    * once per (path) and every later construction is job-free (pinned by
    * PlanQualitySpec's lazy-construction guard). A production catalog
    * makes this moot (the metastore holds the schema); this is the
    * path-reading equivalent.
    *
    * The memo key includes a (mtime, length) fingerprint of the path, so
    * an in-place fixture regeneration (TESTDATA.md warns the driver may
    * rewrite /root/testdata) invalidates the entry instead of serving a
    * stale schema to a long-lived session — the regenerated file gets one
    * fresh inference job, exactly like a first read. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Cheap staleness fingerprint: for a plain file its (mtime, length);
    * for a directory (multi-file parquet) the fold of every child's
    * (name, mtime, length). Fixture tables are single files, so this is
    * one stat call on the hot path. */
  private[graft] def pathFingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (st.isFile) s"${st.getModificationTime}:${st.getLen}"
    else fs.listStatus(p).sortBy(_.getPath.getName)
      .map(c => s"${c.getPath.getName}:${c.getModificationTime}:${c.getLen}")
      .mkString(",")
  }

  /** Exact table row count from parquet FOOTER metadata — a driver-side
    * file-stat + footer read, NO Spark job, memoized per (path,
    * fingerprint) like [[schemaCache]]. This is what the adaptive-width
    * operators (Dedup.annWidth, Sim.kgExtraWidth) consume: their bucket
    * width is a function of corpus size, and deriving it from a
    * DataFrame `.count()` at construction time posted a full Spark job
    * per plan build (the round-7 PlanQualitySpec laziness failure) AND
    * computed the input twice per execution. Footer row counts are the
    * same number a production catalog serves from table statistics —
    * zero scheduling round-trips, exact, and staleness-safe via the
    * fingerprint. Directory tables (the replica fixtures) sum their
    * part-file footers; at 1000-file scale that is still a pure
    * driver-side metadata pass, the same cost class as schema inference. */
  private val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def rowCount(spark: SparkSession, sfDir: String, name: String): Long = {
    val path = s"$sfDir/$name.parquet"
    val key = s"$path@${pathFingerprint(spark, path)}"
    rowCountCache.computeIfAbsent(key, { _ =>
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isFile) Seq(p)
        else fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath)
      java.lang.Long.valueOf(files.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum)
    })
  }

  private val statRangeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[(Long, Long)]]()

  /** Exact column (MIN, MAX) from parquet FOOTER statistics for an INT64
    * column — driver-side footer reads, NO Spark job, memoized per
    * (path, fingerprint) like [[rowCount]]. Returns None when any
    * row-group lacks the stat (caller must then guard in-plan). Round
    * 13: the zero-cost domain guard for packed-key encodings — a
    * per-element assert in the hot path was measurable on the basket
    * family at 100×, while the footer already knows the answer. */
  private[graft] def longStatRange(spark: SparkSession, sfDir: String,
      name: String, column: String): Option[(Long, Long)] = {
    val path = s"$sfDir/$name.parquet"
    val key = s"$path@$column@${pathFingerprint(spark, path)}"
    statRangeCache.computeIfAbsent(key, { _ =>
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isFile) Seq(p)
        else fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath)
      var min = Long.MaxValue
      var max = Long.MinValue
      var ok = true
      files.foreach { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getBlocks.asScala
            .flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == column)
            .foreach { c =>
              val st = c.getStatistics
              if (st == null || st.isEmpty || !st.hasNonNullValue) ok = false
              else (st.genericGetMin, st.genericGetMax) match {
                case (lo: java.lang.Long, hi: java.lang.Long) =>
                  min = math.min(min, lo.longValue())
                  max = math.max(max, hi.longValue())
                case _ => ok = false
              }
            }
        } finally r.close()
      }
      if (ok && max != Long.MinValue) Some((min, max)) else None
    })
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Some fixture generations store events.ts as TIMESTAMP(NANOS), which
    // Spark's vectorized reader rejects unless nanos are read as long.
    // Reading nanos as long is harmless for every other table and lets raw
    // reads succeed against either generation of fixtures.
    // NOTE: this is a session-wide runtime conf (there is no per-read
    // option for it), so loading any table through here also flips nanos
    // handling for parquet reads issued outside this library in the same
    // session. Deliberate trade-off: the driver contract runs queries on
    // fresh default sessions, and a partial loader that only works after
    // a manual conf call would be a worse surface.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/$name.parquet"
    val key = s"$path@${pathFingerprint(spark, path)}"
    val schema = schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Decouple per-row CPU-heavy featurization (shingling, hashing,
    * n-gram explosion) from the INPUT SPLIT COUNT: the fixture tables are
    * single-row-group parquet files, i.e. one unsplittable scan task, so
    * without this every narrow featurize pipeline serializes onto one
    * core until its first shuffle (measured: 1.9 s of a 4.1 s near-dup
    * run in the scan stage). One round-robin exchange of the raw rows is
    * orders cheaper than the compute it parallelizes — the standard move
    * whenever upstream files arrive few or skewed. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

  /** Write `df` Hive-partitioned by `key`: one directory per key value,
    * so an equality/IN predicate on the key prunes whole directories at
    * PLANNING time (PartitionFilters in the scan — zero I/O for pruned
    * values). The complement of bucketing: partitioning kills the scan
    * for selective key predicates, bucketing kills the shuffle for joins
    * on the key. Low-cardinality keys only — a high-cardinality partition
    * key makes a small-files problem, use bucketing for those. */
  def writePartitioned(df: DataFrame, path: String, key: String): Unit =
    df.write.mode("overwrite").partitionBy(key).parquet(path)

  /** Write `df` range-partitioned on `key`: rows are globally range-split
    * into `n` files whose per-file [min, max] key ranges tile WITHOUT
    * overlap (plan-asserted in PlanQualitySpec), so parquet footer
    * min/max stats prune a range predicate to the few files that can
    * match. The third layout lever: partitionBy kills equality scans,
    * this kills range scans, bucketBy kills the join shuffle. */
  def writeRange(df: DataFrame, path: String, key: String, n: Int = 8): Unit =
    df.repartitionByRange(n, df.col(key))
      .write.mode("overwrite").parquet(path)

  /** Write `df` as a bucketed+sorted catalog table: the storage-level
    * answer to the repeated fact⋈fact shuffle (see Joins scaladoc). Both
    * sides of a join bucketed on the join key with the same bucket count
    * plan with NO Exchange on that key — at 100 TB that turns every
    * lineitem⋈orders-shaped join from a full shuffle into a local merge
    * per bucket. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .saveAsTable(table)

  /** Idempotent bucketed copy of a source table, registered per
    * (sfDir, name) in the session catalog; subsequent reads hit the
    * bucketed files directly. The local analog of maintaining a bucketed
    * production catalog table alongside raw landing files. */
  def bucketedView(s: SparkSession, sfDir: String, name: String,
      key: String, numBuckets: Int = 8): DataFrame = {
    val tbl = s"graft_b_${name}_$sfDir".replaceAll("[^A-Za-z0-9]", "_")
    if (!s.catalog.tableExists(tbl)) {
      // The in-memory catalog forgets tables across sessions but their
      // warehouse directories persist; clear a stale location or the
      // managed-table create refuses it.
      val wh = s.conf.get("spark.sql.warehouse.dir")
      val path = new org.apache.hadoop.fs.Path(wh, tbl.toLowerCase)
      val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
      writeBucketed(apply(s, sfDir, name), tbl, key, numBuckets)
    }
    s.table(tbl)
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` has shipped in two storage dtypes across fixture
    * generations, so normalize by the dtype the READ actually produced,
    * not by assumption — the loader contract is a single stable output
    * type (session-TZ TimestampType, microsecond values):
    *   - TIMESTAMP(NANOS): read as long (nanosAsLong conf above), truncate
    *     ns→µs — exactly what DuckDB does reading the same file, so oracle
    *     comparisons stay exact.
    *   - timestamp[us] without tz: Spark reads TIMESTAMP_NTZ; cast to
    *     TimestampType (sessions here run UTC, and the driver compare
    *     strips tz, so values are unchanged).
    *   - already TimestampType: pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported dtype $other — fixture generation changed again?")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
