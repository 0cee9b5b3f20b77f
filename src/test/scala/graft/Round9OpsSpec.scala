package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-9 operators — invariants the sf-oracle
  * hash can't isolate: the new/returning split against a local
  * first-seen-day replay, prefix blocking against a local slice-and-
  * group replay.
  */
class Round9OpsSpec extends SparkSpec {

  test("evt newret: split equals a local first-seen-day replay") {
    val act = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val first = act.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).min }
    val local = act.groupBy(_._2).map { case (day, g) =>
      val nNew = g.count { case (u, d) => first(u) == d }.toLong
      day -> (g.length.toLong, nNew, (g.length - nNew) * 1000L / g.length)
    }
    val rows = operators.Events.evtNewReturning(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    // ordered by day ascending, one row per active day
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    assert(rows.toMap == local)
    // day-1 sanity: every user active on the corpus' first day is new there
    val d0 = act.map(_._2).min
    val byDay = rows.toMap
    assert(byDay(d0)._1 == byDay(d0)._2)
  }

  test("text prefix block: blocks equal a local slice-and-group replay") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
      .filter(_._2.length >= 6)
    val local = docs.groupBy(_._2.take(6).mkString(" "))
      .collect { case (pfx, g) if g.length >= 2 =>
        pfx -> (g.length.toLong, g.map(_._1).min) }
    val rows = operators.Text.textPrefixBlock(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    assert(rows.toMap == local)
    // every block is a genuine candidate set: >= 2 members, survivor is a member
    rows.foreach { case (_, (n, _)) => assert(n >= 2L) }
  }

  test("dq audit: every rule equals a local replay; clean-data FKs audit to zero") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_shipdate").cast("string")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getString(4)))
    val ord = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate").cast("string")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val custKeys = Tables.customer(spark, sf0001).select(col("c_custkey"))
      .collect().map(_.getLong(0)).toSet
    val oKeys = ord.map(_._1).toSet
    val oDate = ord.map(o => o._1 -> o._4).toMap
    val joined = li.filter(l => oDate.contains(l._1))
    val local = Map(
      "rng_qty_gt45" -> (li.count(_._3 > 45.0).toLong, li.length.toLong),
      "rng_disc_gt8pct" -> (li.count(_._4 > 0.08).toLong, li.length.toLong),
      "dom_orderstatus" -> (ord.count(o => !Set("F", "O", "P")(o._3)).toLong, ord.length.toLong),
      "fk_lineitem_order" -> (li.count(l => !oKeys(l._1)).toLong, li.length.toLong),
      "fk_order_customer" -> (ord.count(o => !custKeys(o._2)).toLong, ord.length.toLong),
      "pk_lineitem_unique" -> {
        val g = li.groupBy(l => (l._1, l._2)).map(_._2.length.toLong)
        (g.map(_ - 1).sum, g.sum)
      },
      "seq_ship_after_order" -> (joined.count(l => l._5 < oDate(l._1)).toLong, joined.length.toLong))
    val rows = operators.Analytics.dqAudit(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == local.keys.toSeq.sorted)
    rows.foreach { case (rule, (bad, checked, pm)) =>
      assert((bad, checked) == local(rule), s"rule $rule")
      assert(pm == bad * 1000 / checked)
    }
    // this corpus' FKs hold (audit proves clean, not vacuous) while the
    // composite-PK and threshold rules genuinely fire — the suite
    // exercises both the zero and the nonzero outcome
    assert(rows.toMap.apply("fk_lineitem_order")._1 == 0L)
    assert(rows.toMap.apply("fk_order_customer")._1 == 0L)
    assert(rows.toMap.apply("pk_lineitem_unique")._1 > 0L)
    assert(rows.toMap.apply("rng_qty_gt45")._1 > 0L)
  }

  test("profile cols: stats equal a local replay, min/max typed not lexicographic") {
    val ord = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 100), r.getString(3), r.getString(4)))
    def prof[T](xs: Seq[T])(implicit o: Ordering[T]) =
      (xs.distinct.length.toLong, 0L, xs.min.toString, xs.max.toString)
    val local = Map(
      "o_orderkey" -> prof(ord.map(_._1).toSeq),
      "o_custkey" -> prof(ord.map(_._2).toSeq),
      "total_cents" -> prof(ord.map(_._3).toSeq),
      "o_orderstatus" -> prof(ord.map(_._4).toSeq),
      "o_orderpriority" -> prof(ord.map(_._5).toSeq))
    val rows = operators.Analytics.profileCols(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(rows.map(_._1).toSeq == local.keys.toSeq.sorted)
    rows.foreach { case (name, (n, nd, nn, mn, mx)) =>
      assert(n == ord.length.toLong)
      assert((nd, nn, mn, mx) == local(name), s"col $name")
    }
    // numeric min/max must be numeric: a lexicographic max of cents would
    // start with '9'; the true max cents need not
    val cents = ord.map(_._3)
    assert(rows.toMap.apply("total_cents")._5 == cents.max.toString)
  }

  test("tpch q22: groups equal a local above-average never-ordered replay") {
    val cust = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getInt(1), math.round(r.getDouble(2) * 100)))
    val ordered = Tables.orders(spark, sf0001)
      .filter(col("o_orderdate") >= "2001-01-01").select(col("o_custkey"))
      .collect().map(_.getLong(0)).toSet
    val pos = cust.filter(_._3 > 0L)
    val (tot, n) = (pos.map(_._3).sum, pos.length.toLong)
    val hits = pos.filter(c => c._3 * n > tot && !ordered(c._1))
    val local = hits.groupBy(_._2 % 10).map { case (cc, g) =>
      cc.toLong -> (g.length.toLong, g.map(_._3).sum) }
    val rows = operators.Analytics.tpchQ22(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    assert(rows.toMap == local)
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    assert(hits.nonEmpty)
  }

  test("part skyline: equals brute-force dominance; no survivor dominates another") {
    val parts = Tables.part(spark, sf0001)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100), r.getInt(2).toLong))
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)) =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
    val local = parts.filter(b => !parts.exists(a => dominates(a, b)))
      .map(p => (p._1, p._2, p._3)).sortBy(p => (p._2, p._1))
    val rows = operators.Analytics.partSkyline(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == local.toSeq)
    // the set is a genuine Pareto frontier: mutually non-dominating
    rows.foreach(a => rows.foreach(b => assert(a == b || !dominates(a, b))))
    assert(rows.length > 1 && rows.length < parts.length)
  }

  test("sample weighted: membership equals a local md5 PPS replay") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def u256(k: Long): Long = {
      val hex = md.digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      ("0123456789abcdef".indexOf(hex(30)).toLong * 16) +
        "0123456789abcdef".indexOf(hex(31)).toLong
    }
    val ord = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), math.round(r.getDouble(2) * 100)))
    val local = ord.groupBy(_._2).map { case (st, g) =>
      val kept = g.filter { case (k, _, cents) =>
        u256(k) * 50000000L < math.min(cents, 50000000L) * 256L }
      st -> (kept.length.toLong, g.length.toLong, kept.map(_._3).sum,
        kept.length.toLong * 1000 / g.length) }
    val rows = operators.Relational.sampleWeighted(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toMap == local)
    // sampler actually splits: some kept, some dropped
    val (k, t) = (rows.map(_._2._1).sum, rows.map(_._2._2).sum)
    assert(k > 0 && k < t)
  }

  test("evt debounce: kept counts equal a local lag replay; debounce genuinely drops") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val local = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((_, typ), g) =>
      val sorted = g.sortBy(e => (e._3, e._4))
      val kept = sorted.zipWithIndex.map { case (e, i) =>
        i == 0 || e._3 - sorted(i - 1)._3 >= 3600000000L }
      kept.map(k => typ -> k)
    }.groupBy(_._1).map { case (typ, ks) =>
      val n = ks.length.toLong; val k = ks.count(_._2).toLong
      typ -> (n, k, k * 1000 / n) }
    val rows = operators.Events.evtDebounce(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toMap == local)
    val (tot, kept) = (rows.map(_._2._1).sum, rows.map(_._2._2).sum)
    assert(kept > 0 && kept < tot)
  }

  test("evt abtest: arm stats equal a local md5-parity replay; both arms populated") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def arm(u: Long): String = {
      val hex = md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("0123456789abcdef".indexOf(hex(31)) % 2 == 0) "A" else "B"
    }
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val local = ev.groupBy(_._1).toSeq
      .map { case (u, g) => (arm(u), g.exists(_._2 == "purchase")) }
      .groupBy(_._1).map { case (a, g) =>
        val n = g.length.toLong; val c = g.count(_._2).toLong
        a -> (n, c, c * 1000 / n) }
    val rows = operators.Events.evtAbtest(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toMap == local)
    assert(rows.map(_._1).toSeq == Seq("A", "B"))
  }

  test("text hashtrick: buckets equal a local md5 replay; assignment is total") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(tok: String): Long = {
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ("0123456789abcdef".indexOf(hex(30)).toLong * 16 +
        "0123456789abcdef".indexOf(hex(31)).toLong) % 64
    }
    val occ = Tables.documents(spark, sf0001).select(col("text")).collect()
      .flatMap(_.getString(0).split(" "))
    val local = occ.groupBy(bucket).map { case (b, g) =>
      b -> (g.length.toLong, g.distinct.length.toLong) }
    val rows = operators.Text.textHashtrick(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    assert(rows.toMap == local)
    // total assignment: every occurrence lands in exactly one bucket
    assert(rows.map(_._2._1).sum == occ.length.toLong)
    rows.foreach { case (b, _) => assert(b >= 0 && b < 64) }
  }

  test("evt concurrency: peaks equal a local sweep-line replay and exceed 1 somewhere") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), expr("unix_micros(ts)")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val local = ev.groupBy { case (typ, us) => (typ, us / 86400000000L) }
      .map { case ((typ, day), g) =>
        val bounds = g.flatMap { case (_, us) =>
          val end = math.min(us + 300000000L, (day + 1) * 86400000000L)
          Seq((us, 1L), (end, -1L))
        }.sortBy { case (t, dlt) => (t, -dlt) }
        var live = 0L; var peak = Long.MinValue
        bounds.foreach { case (_, dlt) => live += dlt; peak = math.max(peak, live) }
        (typ, day) -> (peak, bounds.length.toLong)
      }
    val rows = operators.Events.evtConcurrency(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
    assert(rows.toMap == local)
    // intervals genuinely overlap somewhere (peak > 1), and live returns
    // to zero at each day end (equal starts and ends)
    assert(rows.map(_._2._1).max > 1L)
    rows.foreach { case (_, (_, nb)) => assert(nb % 2 == 0L) }
  }

  test("tpch q15: winners equal a local argmax replay and carry the exact max") {
    val li = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .map(r => (r.getLong(0),
        math.round(r.getDouble(1) * 100) * (100 - math.round(r.getDouble(2) * 100))))
    val rev = li.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val mx = rev.values.max
    val winners = rev.filter(_._2 == mx).keys.toSeq.sorted
    val rows = operators.Analytics.tpchQ15(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == winners)
    rows.foreach { case (k, name, v) =>
      assert(v == mx)
      assert(name == f"Supplier#$k%09d")
    }
  }

  test("tpch q17: totals equal a local per-part threshold replay") {
    val brandParts = Tables.part(spark, sf0001)
      .filter(col("p_brand") === "Brand#3").select(col("p_partkey"))
      .collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1)), math.round(r.getDouble(2) * 100)))
      .filter(l => brandParts(l._1))
    val perPart = li.groupBy(_._1).map { case (k, g) =>
      k -> (g.map(_._2).sum, g.length.toLong) }
    val hits = li.filter { case (pk, qty, _) =>
      val (sq, cnt) = perPart(pk); qty * 5L * cnt < sq }
    val r = operators.Analytics.tpchQ17(spark, sf0001).collect().head
    assert(r.getLong(0) == hits.length.toLong)
    assert(r.getLong(1) == hits.map(_._1).distinct.length.toLong)
    assert(r.getLong(2) == hits.map(_._3).sum)
  }
}
