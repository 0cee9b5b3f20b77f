package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-4 operators: recursive-CTE arithmetic,
  * lateral-join top-k semantics, sketch mergeability, gap-fill grid
  * algebra, SCD-2 interval continuity, n-gram duplication exactness, and
  * the Z-order tile-locality property. Each pins the rule the sf oracles
  * can't isolate (or, for the no-oracle sketch query, the accuracy bound
  * the gate never sees). */
class Round4OpsSpec extends SparkSpec {

  test("cross join: 125 region x nation pairs, each nation home exactly once") {
    val rows = operators.Joins.joinCross(spark, sf0001).collect()
    assert(rows.length == 125)
    assert(rows.map(_.getInt(2)).sum == 25)
  }

  test("unpivot: 3 flags x 3 metrics, values match the wide aggregation") {
    val long = operators.Aggs.aggUnpivot(spark, sf0001).collect()
    assert(long.length == 9)
    assert(long.map(_.getString(1)).toSet == Set("n_rows", "n_parts", "n_supps"))
    val nRowsA = long.find(r => r.getString(0) == "A" && r.getString(1) == "n_rows")
      .get.getLong(2)
    val direct = Tables.lineitem(spark, sf0001)
      .filter(col("l_returnflag") === "A").count()
    assert(nRowsA == direct)
  }

  test("lateral: per-customer rows are exactly that customer's top-2 orders") {
    import org.apache.spark.sql.expressions.Window
    val lat = operators.SqlReport.sqlLateral(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = Tables.orders(spark, sf0001)
      .filter(col("o_custkey") % 29 === 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lat == expected, "lateral top-2 diverged from ranked-window top-2")
  }

  test("recursive CTE: amortization steps replay exactly in local arithmetic") {
    val rows = operators.SqlReport.sqlRecursive(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.nonEmpty)
    val starts = Tables.orders(spark, sf0001)
      .filter(col("o_orderkey") % 500 === 0)
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == starts.keySet)
    for ((k, bal0) <- starts) {
      var bal = bal0; var n = 0
      while (bal > 0) { bal = bal - (bal * 3 / 10 + 50000); n += 1 }
      assert(rows(k) == ((n.toLong, bal)),
        s"order $k: recursion gave ${rows(k)}, local replay gave ($n, $bal)")
    }
  }

  test("variant: typed extraction agrees with string-path get_json_object") {
    val v = operators.Scalars.jsonVariant(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gj = Tables.events(spark, sf0001)
      .withColumn("k", expr("CAST(get_json_object(props, '$.k') AS BIGINT)"))
      .groupBy((col("k") % 2).as("p")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v == gj)
    assert(v.values.sum == Tables.events(spark, sf0001).count())
  }

  test("hll: merged estimate within 5% of exact; union of halves = whole") {
    val est = operators.Aggs.approxHll(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    for ((t, e) <- exact)
      assert(math.abs(est(t) - e) <= math.max(1L, e / 20),
        s"$t: hll=$est(t) exact=$e drifted beyond 5%")
    // mergeability: sketches of two disjoint halves union to the full
    // estimate — the property that makes partial sketches a safe rollup
    // currency at scale.
    val ev = Tables.events(spark, sf0001)
    val whole = ev.agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))"))
      .head().getLong(0)
    val merged = ev.withColumn("half", col("event_id") % 2)
      .groupBy(col("half")).agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .head().getLong(0)
    assert(merged == whole, "union of half-sketches != whole-data sketch")
  }

  test("gapfill: dense days x types grid, counts conserved, carry non-null") {
    val g = operators.Events.tsGapfill(spark, sf0001).collect()
    val ev = Tables.events(spark, sf0001).withColumn("day", to_date(col("ts")))
    val nDays = ev.select(countDistinct(col("day"))).head().getLong(0)
    val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .selectExpr("datediff(d1, d0) + 1").head().getInt(0)
    val nTypes = ev.select(countDistinct(col("event_type"))).head().getLong(0)
    assert(g.length == span * nTypes, "grid is not |calendar| x |types|")
    assert(nDays <= span)
    assert(g.map(_.getLong(2)).sum == ev.count(), "zero-fill changed totals")
    assert(g.forall(!_.isNullAt(3)), "carried_cents must never be NULL")
  }

  test("scd2: versions consecutive, intervals chain, one current per user") {
    val rows = operators.Events.evtScd2(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getInt(5)))
    assert(rows.nonEmpty)
    for ((user, hist) <- rows.groupBy(_._1)) {
      val sorted = hist.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to hist.length).toSeq,
        s"user $user: versions not consecutive")
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray))
        assert(a._5.contains(b._4),
          s"user $user: valid_to of v${a._2} != valid_from of v${b._2}")
      assert(sorted.count(_._6 == 1) == 1 && sorted.last._6 == 1,
        s"user $user: exactly the last version must be current")
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray))
        assert(a._3 != b._3, s"user $user: consecutive versions share a type")
    }
  }

  test("ngram-dup: matches an independent in-memory recomputation") {
    val got = operators.Text.textNgramDup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val grams = docs.map { case (id, t) =>
      id -> t.split(" ").sliding(5).filter(_.length == 5)
        .map(_.mkString(" ")).toSet
    }
    val df = scala.collection.mutable.Map.empty[String, Int]
    for ((_, gs) <- grams; g <- gs) df(g) = df.getOrElse(g, 0) + 1
    val want = grams.collect { case (id, gs) if gs.nonEmpty =>
      (id, gs.size.toLong, gs.count(g => df(g) >= 2).toLong)
    }.filter(_._3 > 0).sortBy(_._1).toList
    assert(got == want, "engine n-gram duplication != in-memory recomputation")
  }

  test("zorder: every 64-code z-block is an aligned 8x8 spatial tile") {
    val blocks = operators.Geo.geoZorder(spark, sf0001).collect()
    assert(blocks.nonEmpty)
    for (b <- blocks) {
      val (minX, maxX, minY, maxY) =
        (b.getLong(2), b.getLong(3), b.getLong(4), b.getLong(5))
      assert(maxX - minX <= 7 && maxY - minY <= 7,
        s"zblock ${b.getLong(0)} spans beyond an 8x8 tile — interleave broken")
      assert(minX / 8 == maxX / 8 && minY / 8 == maxY / 8,
        s"zblock ${b.getLong(0)} crosses a tile boundary — not aligned")
    }
  }
}
