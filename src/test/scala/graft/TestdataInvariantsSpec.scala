package graft

import org.apache.spark.sql.functions._

/** sf0.001 golden invariants (FIXTURES.md §A) — catches data drift before
  * it shows up as a confusing oracle mismatch. */
class TestdataInvariantsSpec extends SparkSpec {

  test("row counts match the measured fixture table") {
    val expected = Map("region" -> 5L, "nation" -> 25L, "supplier" -> 10L,
      "customer" -> 150L, "part" -> 200L, "orders" -> 1500L,
      "lineitem" -> 6000L, "events" -> 1000L, "documents" -> 500L,
      "embeddings" -> 500L)
    expected.foreach { case (t, n) =>
      assert(Tables(spark, sf0001, t).count() == n, s"table $t")
      // the footer-metadata count (what adaptive-width operators consume
      // at plan-construction time, job-free) must agree with the scan
      assert(Tables.rowCount(spark, sf0001, t) == n, s"footer count $t")
    }
  }

  test("custkeys are dense 0..N-1 (licenses Graph.probeDegBound's /100 slice bound)") {
    // The link-prediction queries bound their mod-100 probe-slice degree
    // broadcast at |customer|/100 + 1 footer rows; that bound is only an
    // upper bound because custkeys are dense from 0, so exactly every
    // 100th key passes `% 100 = 0`. Pin density, and pin the derived
    // claim directly against the bound the operators use.
    val c = Tables(spark, sf0001, "customer")
    val n = Tables.rowCount(spark, sf0001, "customer")
    val r = c.agg(min(col("c_custkey")), max(col("c_custkey")),
      countDistinct(col("c_custkey"))).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == n - 1 && r.getLong(2) == n,
      s"custkey domain not dense 0..${n - 1}: $r")
    val slice = c.filter(col("c_custkey") % 100 === 0).count()
    assert(slice <= n / 100 + 1, s"probe slice $slice exceeds bound ${n / 100 + 1}")
  }

  test("rowCount sums part-file footers for directory tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rc").toString
    try {
      spark.range(1000).repartition(4).write.mode("overwrite")
        .parquet(s"$dir/t.parquet")
      assert(Tables.rowCount(spark, dir, "t") == 1000L)
    } finally {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("o_orderkey unique; n_chars == length(text); embeddings dim 64") {
    val o = Tables.orders(spark, sf0001)
    assert(o.select("o_orderkey").distinct().count() == o.count())
    assert(Tables.documents(spark, sf0001)
      .filter(col("n_chars") =!= length(col("text"))).count() == 0)
    assert(Tables.embeddings(spark, sf0001)
      .filter(size(col("embedding")) =!= 64).count() == 0)
  }

  test("all 10 tables load with analyzable schemas (fixture-regeneration canary)") {
    // The driver can and did regenerate /root/testdata mid-project (r4:
    // events.ts went parquet ns → µs and broke 73 queries at analysis
    // time). This is the cheap first gate: every loader must produce a
    // plan that ANALYZES and returns a row on the current fixtures.
    val loaders: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map("region" -> Tables.region, "nation" -> Tables.nation,
        "customer" -> Tables.customer, "supplier" -> Tables.supplier,
        "part" -> Tables.part, "orders" -> Tables.orders,
        "lineitem" -> Tables.lineitem, "events" -> Tables.events,
        "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)
    Tables.all.foreach { t =>
      val df = loaders(t)(spark, sf0001)
      assert(df.schema.nonEmpty, s"$t: empty schema")
      assert(df.limit(1).collect().length == 1, s"$t: no rows readable")
    }
  }

  test("events loader output contract: ts is TimestampType in the 2024-01 range") {
    // Asserts the LOADER's output contract, not the storage dtype — the
    // fixture has shipped ts as both TIMESTAMP(NANOS) and timestamp[us]
    // across generations, and Tables.events must normalize either to
    // session-TZ TimestampType with the same microsecond values.
    val e = Tables.events(spark, sf0001)
    assert(e.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
      s"ts normalized to ${e.schema("ts").dataType}, want TimestampType")
    val r = e.agg(min("ts").cast("string"), max("ts").cast("string")).head()
    assert(r.getString(0).startsWith("2024-01-0"))
    assert(r.getString(1).startsWith("2024-01-3"))
  }

  test("events loader normalizes every storage dtype generation (long-ns, ntz, tz)") {
    // The ns fixture generation no longer exists on disk, so synthesize
    // each branch's input: a LongType ts (what nanosAsLong yields on a
    // TIMESTAMP(NANOS) file), a TIMESTAMP_NTZ ts (the current timestamp[us]
    // generation), and a plain TimestampType ts. All three must come out
    // as session-TZ TimestampType with identical microsecond values.
    // Distinct dirs per branch — Tables memoizes schema per path.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val baseUs = 1704067200L * 1000000L // 2024-01-01T00:00:00Z in µs
    def dirFor(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft-evt-$tag").toString
    def loadFrom(tag: String, write: String => Unit): Long = {
      val d = dirFor(tag); write(s"$d/events.parquet")
      val e = Tables.events(spark, d)
      assert(e.schema("ts").dataType == TimestampType, s"$tag branch")
      e.select(unix_micros(col("ts"))).head().getLong(0)
    }
    import spark.implicits._
    val viaNs = loadFrom("ns", p =>
      // 1500 extra ns must truncate to 1 µs, exactly like DuckDB
      Seq((1L, baseUs * 1000L + 1500L)).toDF("event_id", "ts")
        .write.parquet(p))
    val viaNtz = loadFrom("ntz", p =>
      Seq((1L, baseUs + 1L)).toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
        .write.parquet(p))
    val viaTz = loadFrom("tz", p =>
      Seq((1L, baseUs + 1L)).toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
        .write.parquet(p))
    assert(viaNs == baseUs + 1L, s"ns→µs truncation: $viaNs")
    assert(viaNtz == baseUs + 1L, s"ntz cast: $viaNtz")
    assert(viaTz == baseUs + 1L, s"tz passthrough: $viaTz")
  }

  test("documents.text is single-byte ASCII (licenses byte≡char oracle equivalence)") {
    // The multimodal oracles compare Spark byte-level ops with DuckDB
    // character-level ops; only valid while every char is one byte.
    val bad = Tables.documents(spark, sf0001)
      .filter(length(col("text")) =!= octet_length(col("text"))).count()
    assert(bad == 0, s"$bad docs contain multi-byte characters")
  }

  test("jaccard (lang, source) blocks stay bounded (quadratic-growth guard)") {
    // q_dedup_jaccard is all-pairs WITHIN a block by design; its cost is
    // sum over blocks of C(sz, 2). This pins the block structure the
    // design assumes — if block count stops growing with the corpus (so
    // blocks grow linearly and pair counts quadratically), fail here
    // before the bench does. The declared scale path for unbounded
    // corpora is q_dedup_neardup (LSH candidates → verify).
    val blocks = Tables.documents(spark, sf0001)
      .groupBy("lang", "source").count().collect().map(_.getLong(2))
    val n = blocks.sum.toDouble
    val pairCount = blocks.map(s => s * (s - 1) / 2).sum
    assert(blocks.max <= n / 10,
      s"largest block ${blocks.max} exceeds n/10 — blocking no longer bounds the join")
    assert(pairCount <= 20 * n,
      s"blocked pair count $pairCount exceeds 20n — quadratic growth")
  }

  test("l_quantity stays in (0, 1000]: Q2's unit-cost division never sees zero") {
    // q_tpch_q2 computes round(l_extendedprice / l_quantity * 1000); a
    // regenerated fixture with a zero quantity would make Spark produce
    // Infinity (cast to Long.MaxValue) where DuckDB ERRORS on the cast —
    // a silent-divergence-vs-loud-failure split. Pin the domain so a
    // regeneration fails HERE with a clear message instead.
    val bad = Tables.lineitem(spark, sf0001)
      .filter(col("l_quantity") <= 0 || col("l_quantity") > 1000).count()
    assert(bad == 0, s"$bad lineitem rows outside (0, 1000] quantity domain")
  }

  test("part-3 query preconditions survive a fixture regeneration") {
    // q_sim_mmr / q_emb_coreset seed from vec_id 0 — a regenerated
    // embeddings table without it would fail with an empty broadcast
    assert(Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") === 0).count() == 1, "vec_id 0 missing")
    // q_approx_kmv_jacc needs >= 2 statuses for its pair generator
    assert(Tables.orders(spark, sf0001)
      .select(col("o_orderstatus")).distinct().count() >= 2,
      "fewer than 2 order statuses")
    // q_approx_bloom builds from the BUILDING segment
    assert(Tables.customer(spark, sf0001)
      .filter(col("c_mktsegment") === "BUILDING").count() > 0,
      "BUILDING segment empty")
    // q_text_surprise needs multi-token documents
    assert(Tables.documents(spark, sf0001)
      .filter(size(split(col("text"), " ")) >= 2).count() > 0,
      "no multi-token documents")
    // q_link_er reconstructs names as Customer#%09d — the linkage is
    // meaningless if the dimension's own format drifts
    val badName = Tables.customer(spark, sf0001)
      .filter(!col("c_name").rlike("^Customer#[0-9]{9}$")).count()
    assert(badName == 0, s"$badName customer names off the #%09d format")
  }

  test("user_id is non-negative: the CMS probe's pmod and % agree") {
    // The q_approx_cms oracle hashes with ((user_id % P) + P) % P and the
    // Spark probe with pmod — equal for all inputs — but the sketch
    // AGGREGATOR uses floorMod too; this pin documents the domain the
    // cross-engine agreement was verified on.
    val bad = Tables.events(spark, sf0001).filter(col("user_id") < 0).count()
    assert(bad == 0, s"$bad events rows with negative user_id")
  }
}
