package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-8 operators — invariants the sf-oracle
  * hash can't isolate: Q14's promo share against a local conditional-sum
  * replay, Q19's arm split against per-arm predicate re-evaluation over
  * the joined rows.
  */
class Round8OpsSpec extends SparkSpec {

  test("tpch q14: promo share equals a local conditional-sum replay") {
    val rows = operators.Analytics.tpchQ14(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val promo = r.getLong(1); val total = r.getLong(2)
      val pm = r.getLong(4)
      assert(promo >= 0 && promo <= total)
      assert(pm == promo * 1000 / total)
    }
    // months are within the filter's year and unique
    val months = rows.map(_.getString(0))
    assert(months.forall(_.startsWith("1996-")))
    assert(months.distinct.length == months.length)
  }

  test("dupspans: coverage equals a brute-force interval-union replay") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
      .filter(_._2.length >= 5)
    val gramDocs = scala.collection.mutable.Map[String, Set[Long]]()
    docs.foreach { case (id, toks) =>
      toks.sliding(5).foreach(g => {
        val k = g.mkString(" ")
        gramDocs(k) = gramDocs.getOrElse(k, Set.empty) + id
      })
    }
    val local = docs.flatMap { case (id, toks) =>
      val dupPos = (0 to toks.length - 5)
        .filter(p => gramDocs(toks.slice(p, p + 5).mkString(" ")).size >= 2)
      if (dupPos.isEmpty) None
      else {
        // brute-force union of [p, p+4] intervals over token positions
        val covered = dupPos.flatMap(p => p to p + 4).distinct.size.toLong
        Some(id -> (toks.length.toLong, dupPos.size.toLong, covered,
          covered * 1000 / toks.length))
      }
    }.toMap
    val rows = operators.Text.textDupspans(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows == local)
  }

  test("tpch q8: share is the target nation's fraction of the restricted market") {
    val rows = operators.Analytics.tpchQ8(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1996L, 1997L))
    rows.foreach { r =>
      val (nat, tot, pm) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(nat >= 0 && nat <= tot)
      assert(pm == nat * 1000 / tot)
    }
    // cross-check the total against an independent computation of the
    // market restriction (ASIA customers, date window)
    val asiaCustkeys = Tables.customer(spark, sf0001)
      .join(Tables.nation(spark, sf0001)
          .join(Tables.region(spark, sf0001).filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val expect = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001)
          .filter(col("o_orderdate") >= "1996-01-01" &&
            col("o_orderdate") < "1998-01-01"),
        col("l_orderkey") === col("o_orderkey"))
      .join(asiaCustkeys, col("o_custkey") === col("c_custkey"))
      .agg(sum(expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))")))
      .collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == expect)
  }

  test("win argmax: packed-key max equals a local trailing-frame replay") {
    // the packing precondition the scaladoc states
    val maxId = Tables.events(spark, sf0001).agg(max(col("event_id")))
      .collect()(0).getLong(0)
    assert(maxId < 999999999L)
    val ev = Tables.events(spark, sf0001)
      .filter(col("user_id") % 17 === 0)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val local = ev.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._3, e._2))
      sorted.indices.map { i =>
        val frame = sorted.slice(math.max(0, i - 4), i + 1)
        val best = frame.maxBy(e => (e._4, -e._2))
        (sorted(i)._2, sorted(i)._1, sorted(i)._4, best._4, best._2)
      }
    }.toSet
    val rows = operators.Windows.winArgmax(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(rows == local)
  }

  test("rank delta: per-week ranks are a permutation and deltas match lag") {
    val rows = operators.Events.evtRankDelta(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq == (1L to g.length).toSeq)
      // counts non-increasing down the rank order
      val byRank = g.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    rows.groupBy(_._2).foreach { case (_, g) =>
      val byWeek = g.sortBy(_._1)
      assert(byWeek.head._5.isEmpty && byWeek.head._6.isEmpty)
      byWeek.zip(byWeek.tail).foreach { case (prev, cur) =>
        assert(cur._5.contains(prev._4))
        assert(cur._6.contains(prev._4 - cur._4))
      }
    }
  }

  test("vocab prune: bands partition the vocabulary, masses account for all tokens") {
    val rows = operators.Text.textVocabPrune(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").map(r.getLong(0) -> _))
    val nDocs = Tables.documents(spark, sf0001).count()
    val df = toks.distinct.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cf = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def band(t: String): String =
      if (df(t) == 1) "hapax" else if (df(t) * 2 > nDocs) "stoplike" else "kept"
    // .toSeq before mapping: df.keys is a Set, and Set.map would collapse
    // tokens whose counts collide before the sum
    val local = df.keys.toSeq.groupBy(band).map { case (b, ts) =>
      b -> (ts.size.toLong, ts.map(cf).sum, ts.map(df).min, ts.map(df).max)
    }
    assert(rows == local)
    assert(rows.values.map(_._2).sum == toks.length.toLong)
  }

  test("cooc: top pairs equal a local sliding-window replay") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("text")).collect().map(_.getString(0).split(" ").toSeq)
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { toks =>
      for (k <- 1 to 2; i <- 0 until toks.length - k) {
        val (a, b) = (toks(i), toks(i + k))
        val key = if (a < b) (a, b) else (b, a)
        counts(key) = counts.getOrElse(key, 0L) + 1
      }
    }
    val top = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.take(20)
    val rows = operators.Text.textCooc(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toSeq
    assert(rows == top)
  }

  test("geo nearest: assignments partition all customers, locally replayed") {
    val rows = operators.Geo.geoNearest(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val custs = Tables.customer(spark, sf0001)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    assert(rows.values.sum == custs.length)
    val anchors = Seq((1L, 43.6532, -79.3832), (2L, 51.5074, -0.1278),
      (3L, -33.8688, 151.2093), (4L, 35.6762, 139.6503),
      (5L, -23.5505, -46.6333))
    def hav(la1: Double, lo1: Double, la2: Double, lo2: Double): Double = {
      val r = math.Pi / 180
      val h = math.pow(math.sin((la2 - la1) * r / 2), 2) +
        math.cos(la1 * r) * math.cos(la2 * r) *
          math.pow(math.sin((lo2 - lo1) * r / 2), 2)
      math.round(2 * 6371.0088 * math.asin(math.sqrt(h)) * 1000) / 1000.0
    }
    val local = custs.map { k =>
      val lat = (k % 180 - 90).toDouble + 0.5
      val lon = ((k * 7) % 360 - 180).toDouble + 0.5
      anchors.minBy { case (id, ala, alo) => (hav(lat, lon, ala, alo), id) }._1
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows == local)
  }

  test("win outlier: integer rule equals the z-score rule on a local replay") {
    val ev = Tables.events(spark, sf0001)
      .filter(col("user_id") % 17 === 0)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val local = ev.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._3, e._2))
      sorted.indices.drop(7).map { i =>
        val fr = sorted.slice(i - 7, i + 1).map(_._4)
        val (n, s, q) = (fr.length.toLong, fr.sum, fr.map(v => v * v).sum)
        val x = sorted(i)._4
        val intRule = (n * x - s) * (n * x - s) > 4 * (n * q - s * s)
        // float z-score with exactly-representable integer inputs
        val mu = s.toDouble / n
        val sigma2 = (q.toDouble - n * mu * mu) / n
        val floatRule = (x - mu) * (x - mu) > 4.0 * sigma2
        assert(intRule == floatRule, s"rules disagree at event ${sorted(i)._2}")
        (sorted(i)._2, if (intRule) 1L else 0L)
      }
    }.toMap
    val rows = operators.Windows.winOutlier(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(rows == local)
    assert(rows.values.sum > 0, "no outliers flagged at sf0.001")
  }

  test("basket lift: ppm values replay from pair and item supports") {
    val pairs = operators.Analytics.basketPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val itemSupp = li.groupBy(col("l_partkey")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nOrders = li.select(col("l_orderkey")).distinct().count()
    val rows = operators.Analytics.basketLift(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, supp, sa, sb, ppm) =>
      assert(supp >= 3)
      assert(sa == itemSupp(a) && sb == itemSupp(b))
      assert(ppm == supp * nOrders * 1000000 / (sa * sb))
      // support agrees with the pairs query where the pair ranked top-20
      pairs.get((a, b)).foreach(s => assert(s == supp))
    }
    // lift ordering is descending
    assert(rows.map(_._6).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("emb drift: zero against itself, exact against a local replay") {
    def quant(x: Float): Long =
      math.min(127L, math.max(-128L, math.floor(x.toDouble * 64.0 + 0.5).toLong))
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(quant).toArray))
    val rows = operators.Sim.embDrift(spark, sf0001).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    vecs.groupBy(_._2).foreach { case (label, g) =>
      val h0 = g.filter(_._1 % 2 == 0).map(_._3)
      val h1 = g.filter(_._1 % 2 == 1).map(_._3)
      val dim = g.head._3.length
      val numer = (0 until dim).map { i =>
        math.abs(h0.map(_(i)).sum * h1.length - h1.map(_(i)).sum * h0.length)
      }.sum
      val (n0, n1, gotNumer, gotDrift) = rows(label)
      assert(n0 == h0.length && n1 == h1.length)
      assert(gotNumer == numer)
      assert(gotDrift == numer * 1000 / (n0 * n1 * 64))
    }
  }

  test("topk aggregator: random fold orders all agree with sort-take") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val agg = new functions.TopK(3)
    val rows = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 1000L)))
    val prop = forAll(rows, Gen.chooseNum(1, 5)) { (xs, splits) =>
      val expect = xs.sortBy(t => (-t._1, t._2)).take(3)
      // fold in arbitrary partitionings: reduce within chunks, merge across
      val chunks = xs.grouped(math.max(1, xs.length / splits + 1)).toSeq
      val merged = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == expect
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("part margin: realized never exceeds list at full price, pm replays") {
    val rows = operators.Analytics.partMargin(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, real, list, pm) =>
      assert(n > 0 && list > 0)
      assert(pm == real * 1000 / list)
    }
    val totalLines = Tables.lineitem(spark, sf0001).count()
    assert(rows.map(_._2).sum == totalLines)
  }

  test("heatmap: cells partition all events; axes in range") {
    val rows = operators.Events.evtHeatmap(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (d, h, _) => d >= 0 && d <= 6 && h >= 0 && h <= 23 })
    assert(rows.map(_._3).sum == Tables.events(spark, sf0001).count())
    // Jan 2024 spans every weekday; a month of events covers every hour
    assert(rows.map(_._1).distinct.length == 7)
    assert(rows.map(_._2).distinct.length == 24)
  }

  test("seasonality: twelve months, counts partition all orders") {
    val rows = operators.Analytics.ordersSeasonality(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (1L to 12L))
    val n = Tables.orders(spark, sf0001).count()
    assert(rows.map(_._2).sum == n)
    rows.foreach { case (_, cnt, pm) => assert(pm == cnt * 1000 / n) }
  }

  test("supplier scorecard: rates replay from raw return counts") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_suppkey"), col("l_returnflag")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perSupp = li.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.count(_._2 == "R").toLong)
    }.toMap.filter(_._2._1 >= 20)
    val names = Tables.supplier(spark, sf0001)
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    val rows = operators.Analytics.supplierScorecard(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (name, nLines, nRet, pm) =>
      val (expLines, expRet) = perSupp(names(name))
      assert(nLines == expLines && nRet == expRet)
      assert(pm == nRet * 1000 / nLines)
    }
    // ranking is by rate desc
    assert(rows.map(_._4).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("ltv: cumulative curve is monotone and totals all purchase cents") {
    val rows = operators.Events.evtLtv(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totalCents = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")))
      .collect()(0).getLong(0)
    assert(rows.map(_._3).sum == totalCents)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byOff = g.sortBy(_._2)
      // cumulative equals the running sum of weekly cents
      assert(byOff.map(_._3).scanLeft(0L)(_ + _).tail.toSeq == byOff.map(_._5).toSeq)
      byOff.foreach(r => assert(r._4 > 0))
    }
  }

  test("pareto: deciles partition all users, shares monotone and complete") {
    val rows = operators.Events.evtPareto(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val ev = Tables.events(spark, sf0001)
    assert(rows.map(_._2).sum == ev.select(col("user_id")).distinct().count())
    assert(rows.map(_._3).sum == ev.count())
    // top decile has the largest share; cumulative share ends at ~1000
    assert(rows.head._4 == rows.map(_._4).max)
    assert(rows.last._5 >= 999 && rows.last._5 <= 1000)
    assert(rows.map(_._5).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("srcdrift: TV distance equals a local distribution replay, bounded [0,1]") {
    val toks = Tables.documents(spark, sf0001)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").map(r.getString(0) -> _))
    val bySrc = toks.groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toMap).toMap
    val corpus = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTotal = toks.length.toLong
    val rows = operators.Text.textSrcdrift(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == bySrc.keySet)
    bySrc.foreach { case (src, counts) =>
      val nS = counts.values.sum
      val numer = corpus.map { case (tok, cT) =>
        math.abs(counts.getOrElse(tok, 0L) * nTotal - cT * nS)
      }.sum
      val (gotN, gotNumer, gotPpm) = rows(src)
      assert(gotN == nS && gotNumer == numer)
      assert(gotPpm == numer * 1000000 / (2 * nS * nTotal))
      assert(gotPpm >= 0 && gotPpm <= 1000000)
    }
  }

  test("velocity: every flagged burst replays to >3 purchases in 600s") {
    val purchases = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) div 1000000").as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = purchases.groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    def burst(u: Long, es: Long): Long =
      byUser(u).count(t => t >= es - 600 && t <= es)
    val rows = operators.Events.evtVelocity(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (u, _, es, b) =>
      assert(b == burst(u, es) && b > 3)
    }
    // completeness: every qualifying purchase is flagged
    val expected = purchases.count { case (u, _, es) => burst(u, es) > 3 }
    assert(rows.length == expected)
  }

  test("basket pairs: support equals a local per-order pair count") {
    val orders = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val support = scala.collection.mutable.Map[(Long, Long), Long]()
    orders.values.foreach { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length)
        support((parts(i), parts(j))) = support.getOrElse((parts(i), parts(j)), 0L) + 1
    }
    val top = support.toSeq.sortBy { case ((a, b), s) => (-s, a, b) }.take(20)
    val rows = operators.Analytics.basketPairs(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toSeq
    assert(rows == top)
  }

  test("ivf probe-2 dominates probe-1 pointwise (superset candidates)") {
    def top5(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getDouble(2)).toMap
    val p1 = top5(operators.Sim.simIvfSearch(spark, sf0001))
    val p2 = top5(operators.Sim.simIvfProbe2(spark, sf0001))
    assert(p2.nonEmpty && p1.nonEmpty)
    // probe-2 searches a superset of probe-1's list, so at every rank its
    // similarity is at least probe-1's
    p1.foreach { case (key, cos1) =>
      assert(p2.contains(key))
      assert(p2(key) >= cos1 - 1e-9, s"rank ${key._2} of query ${key._1} regressed")
    }
  }

  test("gap dist: totals account for every non-first event; buckets capped") {
    val rows = operators.Events.evtGapDist(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.forall { case (b, _) => b >= 0 && b <= 12 })
    val ev = Tables.events(spark, sf0001)
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    assert(rows.map(_._2).sum == nEvents - nUsers)
  }

  test("ttr: types never exceed tokens; every source present") {
    val rows = operators.Text.textTtr(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    rows.foreach { case (_, nTok, nTyp, pm) =>
      assert(nTyp <= nTok)
      assert(pm == nTyp * 1000 / nTok)
    }
  }

  test("ts interp: gap fills equal a local linear replay, edges untouched") {
    val rows = operators.Events.tsInterp(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val hourly = Tables.events(spark, sf0001)
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(e => (e._1, e._2)).map { case (k, g) => k -> g.map(_._3).sum }
    val local = scala.collection.mutable.ArrayBuffer[(String, Long, String, Long)]()
    hourly.keys.map(_._1).toSeq.distinct.foreach { typ =>
      val hrs = hourly.keys.filter(_._1 == typ).map(_._2).toSeq.sorted
      hrs.foreach(h => local += ((typ, h, "obs", hourly((typ, h)) * 1000)))
      hrs.zip(hrs.tail).foreach { case (h, nh) =>
        if (nh - h > 1 && nh - h <= 7) {
          val (v, nv) = (hourly((typ, h)), hourly((typ, nh)))
          ((h + 1) until nh).foreach { m =>
            local += ((typ, m, "interp", (v * (nh - m) + nv * (m - h)) * 1000 / (nh - h)))
          }
        }
      }
    }
    assert(rows.toSet == local.toSet)
    assert(rows.count(_._3 == "interp") > 0, "no gaps filled at sf0.001")
    // interpolated values lie between (or at) their endpoints' line — never extrapolated
    val obsSet = rows.filter(_._3 == "obs").map(r => (r._1, r._2)).toSet
    rows.filter(_._3 == "interp").foreach(r => assert(!obsSet.contains((r._1, r._2))))
  }

  test("spancut: removed counts equal dupspans coverage; rewrite verified locally") {
    val cut = operators.Text.textSpancut(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val spans = operators.Text.textDupspans(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // audit/apply agreement: what dupspans says is covered, spancut removes
    cut.foreach { case (id, (nToks, nKept, nRemoved, _)) =>
      assert(nKept + nRemoved == nToks)
      assert(nRemoved == spans.getOrElse(id, 0L))
    }
    // rewrite correctness on a local replay
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
      .filter(_._2.length >= 5)
    val gramDocs = scala.collection.mutable.Map[String, Set[Long]]()
    docs.foreach { case (id, toks) =>
      toks.sliding(5).foreach(g => {
        val k = g.mkString(" ")
        gramDocs(k) = gramDocs.getOrElse(k, Set.empty) + id
      })
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.foreach { case (id, toks) =>
      val covered = (0 to toks.length - 5)
        .filter(p => gramDocs(toks.slice(p, p + 5).mkString(" ")).size >= 2)
        .flatMap(p => p to p + 4).toSet
      val cleaned = toks.indices.filterNot(covered).map(toks).mkString(" ")
      val hex = md.digest(cleaned.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(cut(id)._4 == hex, s"doc $id cleaned-text digest mismatch")
    }
  }

  test("lid eval: matrix marginals equal per-lang doc counts") {
    val rows = operators.Text.textLidEval(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val perLang = Tables.documents(spark, sf0001)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // row marginals: each lang's n_docs sum equals its corpus count, and
    // lang_total repeats that sum on every row of the lang
    rows.groupBy(_._1).foreach { case (lang, g) =>
      assert(g.map(_._3).sum == perLang(lang))
      assert(g.forall(_._4 == perLang(lang)))
    }
    assert(rows.map(_._3).sum == perLang.values.sum)
    // hit flags mark exactly the diagonal
    rows.foreach { case (lang, guess, _, _, _, hit) =>
      assert((hit == 1L) == (lang == guess))
    }
    // consistency with the per-doc query it wraps
    val perDoc = operators.Text.textLangid(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val cm = perDoc.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap == cm)
  }

  test("tpch q19: every emitted row satisfies exactly its arm's conjunct") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val parts = Tables.part(spark, sf0001)
      .select(col("p_partkey"), col("p_brand"), col("p_size")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    def arm(brand: String, size: Int, qty: Double): Int =
      if (brand == "Brand#3" && size >= 1 && size <= 15 && qty >= 1 && qty <= 16) 1
      else if (brand == "Brand#12" && size >= 16 && size <= 30 && qty >= 8 && qty <= 26) 2
      else if (brand == "Brand#24" && size >= 31 && size <= 50 && qty >= 18 && qty <= 36) 3
      else 0
    val local = li.flatMap { case (pk, qty, price, disc) =>
      parts.get(pk).map { case (brand, size) => (arm(brand, size, qty),
        math.round(price * 100) * (100 - math.round(disc * 100))) }
    }.filter(_._1 > 0).groupBy(_._1)
      .map { case (a, g) => a.toLong -> (g.map(_._2).sum, g.length.toLong) }
    val rows = operators.Analytics.tpchQ19(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows == local)
  }
}
