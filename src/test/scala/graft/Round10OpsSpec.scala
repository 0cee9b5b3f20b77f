package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-10 operators — invariants the sf-oracle
  * hash can't isolate: containment against a local token-set replay
  * (including its asymmetry), and the integer-exactness contracts of
  * the statistical queries.
  */
class Round10OpsSpec extends SparkSpec {

  test("dedup contain: top pairs equal a local token-set replay; asymmetric") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3).split(" ").distinct.toSet))
    val pairs = for {
      (aId, aL, aS, ta) <- docs
      (bId, bL, bS, tb) <- docs
      if aL == bL && aS == bS && aId != bId
    } yield {
      val inter = ta.intersect(tb).size.toLong
      (aId, bId, inter, ta.size.toLong, inter * 1000L / ta.size)
    }
    val local = pairs.sortBy { case (a, b, _, _, pm) => (-pm, a, b) }.take(100)
    val rows = operators.Dedup.dedupContain(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSeq == local.toSeq)
    // asymmetry is real on this corpus: some directed pair scores high
    // while its reverse does not (the doc-inside-doc case Jaccard hides)
    val pm = pairs.map { case (a, b, _, _, p) => (a, b) -> p }.toMap
    assert(pairs.exists { case (a, b, _, _, p) =>
      p >= 800 && pm.getOrElse((b, a), 0L) < p })
  }

  test("text zipf: octave bands equal a local rank replay; mass covers corpus") {
    val occ = Tables.documents(spark, sf0001).select(col("text")).collect()
      .flatMap(_.getString(0).split(" "))
    val ranked = occ.groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
      .toSeq.sortBy { case (t, f) => (-f, t) }.zipWithIndex
      .map { case ((t, f), i) => (t, f, i + 1L) }
    def band(rank: Long): Long = {
      var k = 0L; while (rank >= (2L << k) && k < 21) k += 1; k
    }
    val local = ranked.groupBy { case (_, _, r) => band(r) }.map { case (b, g) =>
      b -> (g.size.toLong, g.map(_._2).sum, g.map(_._3).min, g.map(_._2).max) }
    val rows = operators.Text.textZipf(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toMap == local)
    // every occurrence is banded exactly once; band 0 is the top token
    assert(rows.map(_._2._2).sum == occ.length.toLong)
    assert(rows.head._1 == 0L && rows.head._2._3 == 1L)
  }

  test("evt gini: ppm equals a local rank-weighted replay; bounded in [0, 1e6)") {
    val per = Tables.events(spark, sf0001)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, u), g) => (t, u, g.length.toLong) }
    val local = per.groupBy(_._1).map { case (t, g) =>
      val sorted = g.toSeq.sortBy { case (_, u, c) => (c, u) }
      val n = sorted.length.toLong
      val tot = sorted.map(_._3).sum
      val wsum = sorted.zipWithIndex.map { case ((_, _, c), i) => (i + 1L) * c }.sum
      t -> (n, tot, (2 * wsum - (n + 1) * tot) * 1000000L / (n * tot))
    }
    val rows = operators.Events.evtGini(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toMap == local)
    rows.foreach { case (_, (_, _, g)) => assert(g >= 0L && g < 1000000L) }
    // the corpus is not perfectly equal: some type shows real concentration
    assert(rows.exists(_._2._3 > 0L))
  }

  test("evt lift: decile table equals a local ntile replay; heavy flag splits") {
    val per = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (u, g) =>
        (u, g.length.toLong, g.count(_._2 == "purchase").toLong) }.toSeq
    val mean = per.map(_._3).sum / per.length
    val heavySet = per.filter(_._3 > mean).map(_._1).toSet
    assert(heavySet.nonEmpty && heavySet.size < per.length) // non-constant flag
    // ntile semantics: first (n mod 10) deciles get the extra row
    val ordered = per.sortBy { case (u, n, _) => (-n, u) }
    val n = ordered.length
    val base = n / 10; val extra = n % 10
    val local = (1 to 10).map { dec =>
      val start = (dec - 1) * base + math.min(dec - 1, extra)
      val len = base + (if (dec <= extra) 1 else 0)
      val g = ordered.slice(start, start + len)
      val nh = g.count(t => heavySet(t._1)).toLong
      (dec.toLong, g.length.toLong, nh, nh * 1000L / g.length,
        nh * n.toLong * 1000L / (g.length.toLong * heavySet.size))
    }
    val rows = operators.Events.evtLift(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSeq == local)
  }

  test("orders backlog: levels equal a local sweep replay and close at zero") {
    val om = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"),
        expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val em = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_orderkey"))
      .agg(expr("CAST(max(year(l_shipdate) * 12 + month(l_shipdate) - 1) AS BIGINT)").as("em"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // inner-join semantics: an order with no lineitems (they exist at
    // sf0.001, e.g. orderkey 1237) has no ship-derived close → untracked
    val tracked = om.filter { case (k, _) => em.contains(k) }
    assert(tracked.size < om.size) // the no-lineitem orders are real
    val deltas = scala.collection.mutable.Map.empty[Long, Long]
    tracked.foreach { case (k, sm) =>
      deltas(sm) = deltas.getOrElse(sm, 0L) + 1
      // close clamped to the open month: this corpus ships some lines
      // BEFORE the order date (q_dq_audit counts those rows)
      val e = math.max(sm, em(k)) + 1
      deltas(e) = deltas.getOrElse(e, 0L) - 1
    }
    var run = 0L
    val local = deltas.toSeq.sortBy(_._1).map { case (mi, d) =>
      run += d; (mi / 12, mi % 12 + 1, d, run) }
    val rows = operators.Analytics.ordersBacklog(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == local)
    assert(rows.last._4 == 0L)           // every order eventually ships
    assert(rows.exists(_._4 > 0L))       // a real backlog existed
    // clamped intervals keep the level non-negative everywhere
    rows.foreach(r => assert(r._4 >= 0L))
    // the clamp is exercised: some order's lines all ship early
    assert(tracked.exists { case (k, sm) => em(k) < sm })
  }

  test("evt stickiness: permille equals a local replay; bounded by (0, 1000]") {
    val rowsIn = Tables.events(spark, sf0001)
      .select(expr("CAST(year(ts) * 12 + month(ts) - 1 AS BIGINT)"),
        expr("unix_micros(ts) div 86400000000"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).distinct
    val local = rowsIn.groupBy(_._1).map { case (mon, g) =>
      val nDays = g.map(_._2).distinct.length.toLong
      val mau = g.map(_._3).distinct.length.toLong
      val sumDau = g.length.toLong
      (mon / 12, mon % 12 + 1) -> (nDays, sumDau, mau,
        sumDau * 1000L / (nDays * mau))
    }
    val rows = operators.Events.evtStickiness(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.toMap == local)
    // avg DAU can never exceed MAU; a user active every day hits 1000
    rows.foreach { case (_, (_, _, _, pm)) => assert(pm > 0L && pm <= 1000L) }
  }
}
