package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-5 operators, each asserting the rule the
  * sf-oracle hash can't isolate: streak/island algebra vs a local replay,
  * the integer z²-test vs local moments, histogram tiling, bitmap-distinct
  * vs count(DISTINCT), and CDC chunking's edit-locality property (the
  * reason content-defined beats fixed-window chunking for dedup).
  */
class Round5OpsSpec extends SparkSpec {

  test("streaks: engine islands equal a local consecutive-run replay") {
    val got = operators.Events.evtStreaks(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val days = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.keySet == days.keySet)
    for ((u, ds) <- days) {
      // Local replay: split the sorted day list into consecutive runs.
      val runs = ds.foldLeft(List.empty[List[Long]]) {
        case (acc @ (h :: t), d) if h.head == d - 1 => (d :: h) :: t
        case (acc, d) => List(d) :: acc
      }.map(r => (r.length.toLong, r.min))
      val best = runs.minBy { case (len, start) => (-len, start) }
      assert(got(u) == ((ds.length.toLong, runs.length.toLong, best._1, best._2)),
        s"user $u: engine ${got(u)}, replay (${ds.length},${runs.length},$best)")
    }
  }

  test("anomaly: integer z^2 flag equals a local float z-score at k=2") {
    val rows = operators.Events.evtAnomaly(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1)
    for ((t, rs) <- byType) {
      val n = rs.length.toDouble
      val mu = rs.map(_._3).sum / n
      val varP = rs.map(c => (c._3 - mu) * (c._3 - mu)).sum / n
      for ((_, day, cnt, flag) <- rs) {
        val z2 = (cnt - mu) * (cnt - mu)
        // Strict inequality on both sides; integer rescaling is exact, so
        // the flags must agree everywhere (no boundary ulp to forgive).
        assert((z2 > 4 * varP) == (flag == 1),
          s"type $t day $day cnt $cnt: float z2=$z2 var=$varP flag=$flag")
      }
    }
  }

  test("histogram: bins tile the cents domain and account for every order") {
    val rows = operators.Aggs.aggHistogram(spark, sf0001).collect()
    val total = Tables.orders(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total)
    for (r <- rows) {
      val (bin, lo, hi, binLo) = (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(binLo == bin * 500000)
      assert(lo >= binLo && hi < binLo + 500000,
        s"bin $bin: min=$lo max=$hi outside [$binLo, ${binLo + 500000})")
    }
  }

  test("bitmap distinct-count equals count(DISTINCT) per customer") {
    val dist = operators.Analytics.aggBitmap(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val direct = Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderpriority")).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    assert(dist == direct, s"bitmap $dist vs countDistinct $direct")
  }

  test("cdc chunks tile each doc contiguously from position 0") {
    val perDoc = operators.Text.textCdc(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val nToks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for ((doc, chunks) <- perDoc) {
      val sorted = chunks.sortBy(_._2)
      assert(sorted.head._2 == 0 && sorted.head._4 == 0)
      // start_pos of chunk k+1 = start_pos + n_toks of chunk k: no gaps,
      // no overlaps, and the last chunk ends exactly at the token count.
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray) if sorted.length > 1)
        assert(b._4 == a._4 + a._3, s"doc $doc: chunk ${b._2} not contiguous")
      assert(sorted.last._4 + sorted.last._3 == nToks(doc))
    }
  }

  test("qfilter threshold is the exact interpolated p25 (x4) of each language") {
    val got = operators.Text.textQfilter(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val scores = Tables.documents(spark, sf0001)
      .select(col("lang"),
        (size(array_distinct(split(col("text"), " "))).cast("long") * 1000 +
          size(split(col("text"), " ")).cast("long")).as("score"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    assert(got.keySet == scores.keySet)
    for ((lang, ss) <- scores) {
      val n = ss.length
      val lo = (n - 1) / 4
      val r = (n - 1) % 4
      val tx4 = ss(lo) * (4 - r) + (if (r > 0) ss(lo + 1) * r else 0L)
      val kept = ss.count(_ * 4 >= tx4).toLong
      assert(got(lang) == ((n.toLong, tx4, kept)),
        s"$lang: engine ${got(lang)}, local ($n, $tx4, $kept)")
      // the prune actually prunes: somewhere between 50% and 99% kept
      assert(kept > n / 2 && kept < n)
    }
  }

  test("rolling median matches a local sorted-window replay") {
    val rows = operators.Windows.winMedian(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    for ((_, group) <- rows.groupBy(_._1)) {
      // verify output ordering per user is by event_id (deterministic
      // declared order), then replay the trailing-5 frame locally in
      // event-time order, which for the fixture equals event_id order
      // within a user only if (us, event_id) sorts that way — so re-sort
      // by the engine's own k/cents sequence instead of assuming.
      val seq = group.sortBy(_._2)
      seq.indices.foreach { i =>
        val frame = seq.slice(math.max(0, i - 4), i + 1).map(_._3).sorted
        val k = frame.length
        val expect = frame((k + 1) / 2 - 1) + frame(k / 2)
        assert(seq(i)._4 == k.toLong && seq(i)._5 == expect,
          s"row ${seq(i)}: local median x2 = $expect over $frame")
      }
    }
  }

  test("ohlc open/close are the earliest/latest event's value per bucket") {
    val got = operators.Events.evtOhlc(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val raw = Tables.events(spark, sf0001)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"),
        col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2 / 3600000000L))
    assert(got.keySet == raw.keySet)
    for ((key, evs) <- raw) {
      val ordered = evs.sortBy(e => (e._2, e._3))
      val (open, close) = (ordered.head._4, ordered.last._4)
      val cents = evs.map(_._4)
      assert(got(key) == ((open, cents.max, cents.min, close, evs.length.toLong)),
        s"$key: engine ${got(key)}")
    }
  }

  test("nation triangles match a local brute-force over the distinct edge set") {
    val got = operators.Graph.graphTriangles(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val edges = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sf0001), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long"), col("s_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toVector.sorted
    val deg = nodes.map(n => n -> edges.count(e => e._1 == n || e._2 == n).toLong).toMap
    val triCount = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (a <- nodes; b <- nodes if a < b && edges((a, b));
         c <- nodes if b < c && edges((b, c)) && edges((a, c))) {
      triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
    }
    assert(got == deg.map { case (n, dg) => n -> ((dg, triCount(n))) },
      "triangle membership diverged from brute force")
    assert(triCount.values.sum > 0, "fixture graph has no triangles — vacuous")
  }

  test("approx_top_k in its exact regime equals the true top-10") {
    val got = operators.Aggs.approxTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = Tables.events(spark, sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("user_id").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == exact, s"sketch top-10 $got != exact $exact")
  }

  test("cdc edit-locality: inserting one token re-chunks only its neighborhood") {
    import spark.implicits._
    val toks = (0 until 400).map(i => s"w${(i * 2654435761L) % 97}")
    val editPos = 200
    val edited = (toks.take(editPos) :+ "INSERTED") ++ toks.drop(editPos)
    val docs = Seq((0L, toks.mkString(" ")), (1L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val starts = operators.Text.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // Boundary at position p depends on tokens p-2..p only. So strictly
    // before the edit nothing moves, and ≥3 tokens past it the boundary
    // set re-synchronizes, shifted by the insertion. Fixed-window
    // chunking (q_text_chunk) shifts EVERY downstream boundary instead.
    val before = (s: Set[Long]) => s.filter(_ < editPos)
    assert(before(starts(0L)) == before(starts(1L)),
      "boundaries before the edit moved")
    val afterOld = starts(0L).filter(_ >= editPos + 2).map(_ + 1)
    val afterNew = starts(1L).filter(_ >= editPos + 3)
    assert(afterNew == afterOld,
      s"post-edit boundaries did not re-synchronize: $afterNew vs $afterOld")
  }
}
