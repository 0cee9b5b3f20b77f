package graft

import org.apache.spark.sql.functions._

/** Pins the DataSource V2 surface: filter pushdown must shrink the planned
  * key range (fewer rows ever generated — the V2 analog of row-group
  * pruning), column pruning must narrow the scan output, residual filters
  * must still be applied by Spark, and the served values must match the
  * shared lattice derivation. */
class LatticeSourceSpec extends SparkSpec {

  private def read(n: Long) =
    spark.read.format("lattice").option("n", n.toString).load()

  test("short name resolves through META-INF service registration") {
    assert(read(100).count() == 100)
  }

  test("id-range filters push into the scan and shrink the planned range") {
    val df = read(1000).filter(col("id") >= 900 && col("id") < 950)
    assert(df.count() == 50)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[900,950)"),
      s"pushed range not visible in scan:\n$plan")
  }

  test("equality filter narrows to a single-row range") {
    val df = read(1000).filter(col("id") === 123)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[123,124)"), s"equality not pushed:\n$plan")
    assert(df.count() == 1)
  }

  test("non-id filters stay residual and still apply") {
    val df = read(100).filter(col("id") >= 50 && col("tag") === "even")
    assert(df.count() == 25)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[50,100)"), s"id filter not pushed:\n$plan")
    // the tag predicate must remain a Spark-side Filter, not be claimed
    assert(plan.contains("Filter"), s"residual filter disappeared:\n$plan")
  }

  test("column pruning narrows the scan output") {
    val df = read(100).select(col("lon"))
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("[lon#") && !scanLine.contains("lat#"),
      s"scan did not prune columns: $scanLine")
  }

  test("served values match the shared lattice derivation") {
    val rows = read(10).collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getString(3)))
    rows.foreach { case (id, lat, lon, tag) =>
      assert(lat == sources.LatticeTable.lat(id))
      assert(lon == sources.LatticeTable.lon(id))
      assert(tag == (if (id % 2 == 0) "even" else "odd"))
    }
    assert(rows.map(_._1).toSeq == (0L until 10L))
  }

  test("the declared q_src_lattice query pushes its id range into the connector") {
    val df = operators.Relational.srcLattice(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[5000,15000)"),
      s"declared query did not push its range:\n$plan")
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("even" -> 5000L, "odd" -> 5000L))
  }

  test("empty range after contradictory filters yields zero partitions, zero rows") {
    val df = read(1000).filter(col("id") >= 900 && col("id") < 100)
    assert(df.count() == 0)
  }

  test("ungrouped count/min/max push completely: the scan emits ONE closed-form row") {
    val df = read(1000000).filter(col("id") >= 5000 && col("id") < 15000)
      .agg(count(lit(1)).as("n_points"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("lattice AGG range=[5000,15000)"),
      s"aggregate not pushed into the connector:\n$plan")
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((10000L, 5000L, 14999L)))
  }

  test("pushed aggregate over an empty range: count 0, null min/max") {
    val df = read(1000).filter(col("id") >= 900 && col("id") < 100)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"))
    val r = df.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("LIMIT pushes as a range truncation composed with the filter range") {
    val df = read(1000000).filter(col("id") >= 100).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[100,105) limited"),
      s"limit not folded into the planned range:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(100L, 101L, 102L, 103L, 104L))
  }

  test("ORDER BY id DESC LIMIT pushes fully: range tail served descending, no Spark sort") {
    val df = read(1000).orderBy(col("id").desc).limit(3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[997,1000) limited desc"),
      s"top-N not pushed:\n$plan")
    assert(!plan.contains("TakeOrderedAndProject") && !plan.contains("Sort"),
      s"Spark kept its own sort despite full pushdown:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(999L, 998L, 997L))
  }

  test("non-id ORDER BY is declined: Spark keeps its top-k, values stay right") {
    val df = read(1000).orderBy(col("lat").asc, col("id").asc).limit(1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("limited"), s"non-id order wrongly claimed:\n$plan")
    val r = df.collect().head
    assert(r.getDouble(1) == (0 until 1000).map(i => sources.LatticeTable.lat(i.toLong)).min)
  }

  test("reported statistics reflect the pushed range and drive a hint-free broadcast") {
    // exact stats: 50 rows after pushdown, not the 1e6-row table
    val narrowed = read(1000000).filter(col("id") >= 0 && col("id") < 50)
    val stats = narrowed.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(50)) || stats.sizeInBytes < 10000,
      s"stats not narrowed by pushdown: $stats")
    // the static planner (no hint, no AQE replan needed) broadcasts the
    // narrowed side into a fact join purely from the reported size
    val fact = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), (col("l_orderkey") % 50).as("k"))
    val joined = fact.join(narrowed.select(col("id"), col("lat")),
      col("k") === col("id"))
    val plan = joined.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"narrowed lattice side not broadcast from reported stats:\n$plan")
  }

  test("count() OVER the pushed-agg query works (optimizer prunes to an empty push)") {
    // df.count() wraps the aggregate in an outer count(*), pruning the
    // inner aggregate's outputs to zero functions — the connector must
    // DECLINE that empty aggregation (not claim it and serve raw rows).
    // This is exactly the bench driver's action on every declared query.
    assert(operators.Relational.srcLatticeAgg(spark, sf0001).count() == 1L)
    assert(operators.Relational.srcCatalog(spark, sf0001).count() == 1L)
  }

  test("grouped or non-id aggregates stay Spark-side (rows flow, plan aggregates)") {
    val df = read(100).groupBy(col("tag")).agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("lattice AGG"), s"grouped agg wrongly claimed:\n$plan")
    assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("even" -> 50L, "odd" -> 50L))
  }

  test("V2 catalog routes pure SQL to the connector with pushdown intact") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.LatticeCatalog")
    val df = spark.sql(
      "SELECT id, tag FROM graft.gen.lattice_20000 WHERE id >= 5000 AND id < 5003")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[5000,5003)"),
      s"catalog-routed scan lost filter pushdown:\n$plan")
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((5000L, "even"), (5001L, "odd"), (5002L, "even")))
    // complete aggregate pushdown rides the catalog route too
    val agg = spark.sql(
      "SELECT count(*) AS n FROM graft.gen.lattice_20000 WHERE id < 100")
    assert(agg.queryExecution.executedPlan.toString.contains("lattice AGG"),
      "catalog-routed aggregate not pushed")
    assert(agg.collect().head.getLong(0) == 100L)
    // read-only: mutations are refused
    intercept[Exception](spark.sql("DROP TABLE graft.gen.lattice_20000"))
  }

  test("V2 catalog functions expose the shared derivation to SQL") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.LatticeCatalog")
    val r = spark.sql(
      "SELECT graft.gen.lattice_lat(7) AS la, graft.gen.lattice_lon(7) AS lo")
      .collect().head
    assert(r.getDouble(0) == sources.LatticeTable.lat(7L))
    assert(r.getDouble(1) == sources.LatticeTable.lon(7L))
    // catalog function values agree with the table's own columns
    val viaTable = spark.sql(
      "SELECT lat, lon FROM graft.gen.lattice_20000 WHERE id = 7").collect().head
    assert((r.getDouble(0), r.getDouble(1)) ==
      ((viaTable.getDouble(0), viaTable.getDouble(1))))
  }

  test("micro-batch stream drains the range in batchRows-sized offsets") {
    val ckpt = java.nio.file.Files.createTempDirectory("lattice-mb").toString
    val q = spark.readStream.format("lattice")
      .option("n", "500").option("batchRows", "200").load()
      .writeStream.format("memory").queryName("lattice_mb")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("lattice_mb").select(col("id")).collect()
        .map(_.getLong(0)).sorted
      assert(rows.toSeq == (0L until 500L))
      // 200-id admission per poll → exactly ceil(500/200)=3 non-empty
      // batches of sizes 200,200,100 — pins that the batchRows option
      // actually reaches LatticeMicroBatchStream (a silently-ignored
      // option would fall back to the default 100 and give 5 batches
      // with max 100)
      val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(sizes.length == 3 && sizes.max == 200,
        q.recentProgress.map(_.numInputRows).mkString(","))
      // values served by the stream match the shared derivation
      val r7 = spark.table("lattice_mb").filter(col("id") === 7).collect().head
      assert(r7.getDouble(r7.fieldIndex("lat")) == sources.LatticeTable.lat(7L))
    } finally q.stop()
  }

  test("admission control honors every ReadLimit shape, including composites") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val st = new sources.LatticeMicroBatchStream(0L, 1000L, 100L,
      sources.LatticeTable.schema)
    def next(limit: ReadLimit): Long =
      st.latestOffset(sources.LatticeOffset(0L), limit)
        .asInstanceOf[sources.LatticeOffset].v
    assert(next(ReadLimit.maxRows(40L)) == 40L)
    assert(next(ReadLimit.allAvailable()) == 1000L)
    // composite with a maxRows component: the tightest bound wins
    assert(next(ReadLimit.compositeLimit(
      Array(ReadLimit.maxRows(60L), ReadLimit.allAvailable()))) == 60L)
    // composite with allAvailable but NO maxRows must drain the range,
    // not silently re-pace at the source's own batchRows (ADVICE r7)
    assert(next(ReadLimit.compositeLimit(
      Array(ReadLimit.allAvailable(), ReadLimit.minRows(5L, 1000L)))) == 1000L)
    // unknown-only composite falls back to batchRows
    assert(next(ReadLimit.compositeLimit(
      Array(ReadLimit.minRows(5L, 1000L)))) == 100L)
  }

  test("micro-batch restart resumes from the checkpointed offset without replay") {
    val ckpt = java.nio.file.Files.createTempDirectory("lattice-mb2").toString
    val out = java.nio.file.Files.createTempDirectory("lattice-mb2-out").toString
    def run(n: Int): Unit = {
      val q = spark.readStream.format("lattice")
        .option("n", n.toString).option("batchRows", "100").load()
        .select(col("id"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run(200)
    assert(spark.read.parquet(out).count() == 200)
    // same checkpoint, wider range: only the unseen tail may be served —
    // the file sink's exactly-once log would expose any replay as
    // duplicate ids
    run(350)
    val ids = spark.read.parquet(out).select(col("id")).collect()
      .map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 350L),
      s"replayed or skipped ids: n=${ids.length}")
  }
}
