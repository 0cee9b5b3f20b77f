package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-15 operators (the Learn module plus the
  * clustering-coefficient / readability / functional-dependency audits):
  * each checked against a from-scratch local replay on sf0.001 — the
  * third-implementation discipline that catches test bugs as well as
  * product bugs (both engines agreeing with each other is not enough).
  */
class Round15OpsSpec extends SparkSpec {

  test("ml linreg: binned OLS equals a local normal-equations replay") {
    val rows = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"),
        expr("CAST(l_quantity AS BIGINT)"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val local = rows.groupBy(_._1).map { case (rf, g) =>
      val bins = g.groupBy(_._2).map { case (q, rs) =>
        (q, rs.map(_._3).sum / rs.size)   // sum_cents div n_rows, both >= 0
      }.toSeq
      val n = bins.size.toLong
      val sx = bins.map(_._1).sum
      val sy = bins.map(_._2).sum
      val sxx = bins.map(b => b._1 * b._1).sum
      val sxy = bins.map(b => b._1 * b._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val slope = (1000000L * num) / den          // Java / truncates like div
      val icept = (1000000L * sy - slope * sx) / n
      rf -> (n, slope, icept)
    }
    val got = operators.Learn.mlLinreg(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toMap == local)
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
  }

  test("ml naivebayes: confusion matrix equals a local NB replay and rows partition the test half") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = t.split(" ", -1).toSeq
    val train = docs.filter(_._1 % 2 == 0)
    val test_ = docs.filter(_._1 % 2 == 1)
    val ct = train.flatMap(d => toks(d._3).map(tk => (d._2, tk)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val vn = ct.keys.map(_._2).toSet.size.toLong
    val nl = ct.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val dl = train.groupBy(_._2).map { case (l, ds) => l -> ds.size.toLong }
    val langs = nl.keys.toSeq.sorted
    val conf = test_.map { case (_, trueLang, text) =>
      val c = toks(text).groupBy(identity).map { case (t, v) => t -> v.size.toLong }
      val nt = c.values.sum
      val pred = langs.map { l =>
        val s = IntLg.lg(dl(l)) +
          c.map { case (t, ci) => ci * ct.get((l, t)).map(x => IntLg.lg(x + 1)).getOrElse(0L) }.sum -
          nt * IntLg.lg(nl(l) + vn)
        (l, s)
      }.maxBy { case (l, s) => (s, langs.size - langs.indexOf(l)) } // score desc, lang asc
      (trueLang, pred._1)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = operators.Learn.mlNaiveBayes(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
    assert(got.toMap == conf)
    assert(got.map(_._2).sum == test_.size.toLong)
  }

  test("ts autocorr: per-lag Pearson equals a local replay on the daily series") {
    val daily = Tables.events(spark, sf0001)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = (1L to 7L).map { lag =>
      val pairs = daily.toSeq.flatMap { case (d, x) =>
        daily.get(d + lag).map(y => (x, y)) }
      val n = pairs.size.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val num = n * sxy - sx * sy
      val denx = n * sxx - sx * sx; val deny = n * syy - sy * sy
      val r = if (denx > 0 && deny > 0)
        BigDecimal(num.toDouble / math.sqrt(denx.toDouble * deny.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      lag -> (n, num, r)
    }.toMap
    val got = operators.Learn.tsAutocorr(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toMap == local)
    assert(got.map(_._1).toSeq == (1L to 7L))
  }

  test("ts changepoint: CUSUM argmax equals a local replay") {
    val daily = Tables.events(spark, sf0001)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val tot = daily.map(_._2).sum; val nd = daily.size.toLong
    val mean = (1000000L * tot) / nd
    var cum = 0L
    val devs = daily.zipWithIndex.map { case ((day, cnt), i) =>
      cum += cnt * 1000000L
      (day, i + 1L, cum, cum - (i + 1L) * mean)
    }
    val (day, t, cumAt, dev) = devs.maxBy { case (d, _, _, v) => (math.abs(v), -d) }
    val row = operators.Learn.tsChangepoint(spark, sf0001).collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getLong(0) == day && r.getLong(1) == t && r.getLong(2) == nd)
    assert(r.getLong(3) == dev && r.getLong(4) == mean)
    assert(r.getLong(5) == cumAt / t)
    val post = if (t < nd) (1000000L * tot - cumAt) / (nd - t) else 0L
    assert(r.getLong(6) == post)
  }

  test("graph clustco: coefficient agrees with q_graph_triangles' per-node counts") {
    val tri = operators.Graph.graphTriangles(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = operators.Graph.graphClustco(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(g => g._1 -> (g._2, g._3)).toMap == tri)
    got.foreach { case (_, deg, tris, ppm) =>
      val want = if (deg >= 2) (2000000L * tris) / (deg * (deg - 1)) else 0L
      assert(ppm == want)
      // C_i is a fraction of possible wedges: bounded by 10^6
      assert(ppm >= 0L && ppm <= 1000000L)
    }
    // ordered by coefficient desc then node
    val keys = got.map(g => (-g._4, g._1)).toSeq
    assert(keys == keys.sorted)
  }

  test("text readability: milli-unit Flesch equals a local replay, one-sentence clamp engaged") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val local = docs.map { case (id, t) =>
      val words = t.split(" ", -1).length.toLong
      val syl = "[aeiou]+".r.findAllIn(t).length.toLong
      val sent = math.max(1L, "[.!?]".r.findAllIn(t).length.toLong)
      val wps = 1000L * words / sent
      val spw = 1000L * syl / words
      id -> (words, syl, wps, spw, 206835L - 1015L * wps / 1000L - 84600L * spw / 1000L)
    }.toMap
    val got = operators.Text.textReadability(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toMap == local)
    // synthetic fixture has no terminal punctuation: every doc is one
    // "sentence", so words-per-sentence == 1000·n_words exactly
    assert(got.forall { case (_, (w, _, wps, _, _)) => wps == 1000L * w })
  }

  test("text rake: phrase scores equal a local RAKE replay") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val stops = Set("the", "a")
    // phrases = maximal stopword-free runs, per doc
    val phrases = docs.flatMap { case (_, t) =>
      val runs = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      t.split(" ", -1).foreach { tk =>
        if (stops(tk)) { if (cur.nonEmpty) { runs += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer() } }
        else cur += tk
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs
    }
    val freq = phrases.flatten.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val deg = phrases.flatMap(p => p.map(w => w -> p.size.toLong))
      .groupBy(_._1).map { case (w, o) => w -> o.map(_._2).sum }
    val ws = freq.map { case (w, f) => w -> (1000000L * deg(w)) / f }
    val scored = phrases.map(p => p.mkString(" ") -> p.map(ws).sum)
      .groupBy(_._1).map { case (txt, o) => (txt, o.size.toLong, o.head._2) }
    val top = scored.toSeq.sortBy { case (txt, _, sc) => (-sc, txt) }.take(20)
    val got = operators.Text.textRake(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == top)
  }

  test("stats mad: exact rank-median MAD and 3-sigma-equivalent fence replay locally") {
    val rows = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"), col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val local = rows.groupBy(_._1).map { case (pri, g) =>
      val n = g.size.toLong
      def rankMedian(xs: Seq[(Long, Long)]): Long = { // (value, tiekey)
        val sorted = xs.sortBy(x => (x._1, x._2))
        sorted(((n + 1) / 2 - 1).toInt)._1
      }
      val med = rankMedian(g.map(r => (r._3, r._2)).toSeq)
      val devs = g.map(r => (math.abs(r._3 - med), r._2)).toSeq
      val mad = rankMedian(devs)
      val out = devs.count(_._1 > 3 * mad).toLong
      pri -> (n, med, mad, out)
    }
    val got = operators.Analytics.statsMad(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toMap == local)
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
  }

  private def dailyCounts(): Seq[(Long, Long)] =
    Tables.events(spark, sf0001)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq

  test("ts theilsen: pairwise-slope rank median equals a local replay") {
    val daily = dailyCounts()
    val slopes = for {
      (da, ya) <- daily; (db, yb) <- daily if da < db
    } yield (da, db, 1000000L * (yb - ya) / (db - da))
    val np = slopes.size.toLong
    val sortedSl = slopes.sortBy(x => (x._3, x._1, x._2))
    val slope = sortedSl(((np + 1) / 2 - 1).toInt)._3
    val resids = daily.map { case (d, y) => (d, 1000000L * y - slope * d) }
    val nd = daily.size.toLong
    val sortedRes = resids.sortBy(x => (x._2, x._1))
    val icept = sortedRes(((nd + 1) / 2 - 1).toInt)._2
    val row = operators.Learn.tsTheilsen(spark, sf0001).collect()
    assert(row.length == 1)
    assert((row.head.getLong(0), row.head.getLong(1), row.head.getLong(2),
      row.head.getLong(3)) == ((nd, np, slope, icept)))
  }

  test("ts decompose: interior trend/seasonal/residual replay and the additive identity holds") {
    val daily = dailyCounts()
    val interior = daily.indices.drop(3).dropRight(3).map { k =>
      val (day, cnt) = daily(k)
      val w = (k - 3 to k + 3).map(daily(_)._2).sum
      val trend = 1000000L * w / 7
      (day, day % 7, cnt, trend, 1000000L * cnt - trend)
    }
    val seasonal = interior.groupBy(_._2).map { case (dow, g) =>
      dow -> g.map(_._5).sum / g.size
    }
    val local = interior.map { case (day, dow, cnt, trend, det) =>
      day -> (dow, cnt, trend, seasonal(dow), det - seasonal(dow))
    }.toMap
    val got = operators.Learn.tsDecompose(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toMap == local)
    // decomposition identity: 10^6*cnt == trend + seasonal + residual
    got.foreach { case (_, (_, cnt, tr, se, re)) =>
      assert(1000000L * cnt == tr + se + re)
    }
  }

  test("emb pca power: integer power iteration equals a local replay and normalization pins the peak") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val n = vecs.length.toLong
    val dim = vecs.head.length
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong))
    val a = Array.ofDim[Long](dim, dim)
    for (v <- q; i <- 0 until dim; j <- 0 until dim) a(i)(j) += v(i) * v(j)
    for (i <- 0 until dim; j <- 0 until dim) a(i)(j) /= n
    var vv = Array.fill(dim)(1000000L)
    for (_ <- 1 to 3) {
      val u = (0 until dim).map(i =>
        (0 until dim).map(j => a(i)(j) * vv(j)).sum).toArray
      val mx = u.map(math.abs).max
      vv = u.map(x => (x * 1000) / math.max(mx / 1000, 1L))
    }
    val got = operators.Sim.embPcaPower(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.map(_._1).toSeq == (0L until dim.toLong))
    assert(got.map(_._2).toSeq == vv.toSeq)
    // renormalization contract: peak |loading| sits at ~10^6
    val peak = got.map(g => math.abs(g._2)).max
    assert(peak >= 999000L && peak <= 1001000L)
  }

  test("sample bootstrap: Poisson replica means equal a local md5 replay and deviations center") {
    val rows = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cum = operators.Relational.poissonCumMicro
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def draw(key: Long, rep: Long): Long = {
      val hx = md5hex(s"$key:$rep")
      val u = hx.take(8).foldLeft(0L)((a, c) =>
        a * 16 + "0123456789abcdef".indexOf(c)) % 1000000L
      val k = cum.indexWhere(u < _)
      if (k < 0) 8L else k.toLong
    }
    val point = rows.map(_._2).sum / rows.length
    val local = (0L until 16L).map { rep =>
      val cs = rows.map { case (okey, cents) => (draw(okey, rep), cents) }
      val nEff = cs.map(_._1).sum
      val mean = cs.map(c => c._1 * c._2).sum / nEff
      rep -> (nEff, mean, mean - point)
    }.toMap
    val got = operators.Relational.sampleBootstrap(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toMap == local)
    // Poisson(1) mass: effective n within 25% of the corpus size at n=1500
    got.foreach { case (_, (nEff, _, _)) =>
      assert(math.abs(nEff - rows.length) < rows.length / 4) }
  }

  test("ts holt: exponential-smoothing fold equals a sequential local replay") {
    val daily = dailyCounts()
    var l = 1000000L * daily.head._2
    var b = 0L
    daily.drop(1).foreach { case (_, y) =>
      val lp = (1000000L * y + l + b) / 2
      b = (3 * (lp - l) + 7 * b) / 10
      l = lp
    }
    val got = operators.Learn.tsHolt(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == 7)
    got.zipWithIndex.foreach { case ((h, nd, lv, tr, fc), i) =>
      assert(h == i + 1L && nd == daily.size.toLong)
      assert(lv == l && tr == b && fc == l + h * b)
    }
  }

  test("graph assort: edge-degree Pearson equals a local replay") {
    val pairs = operators.Graph.graphClustco(spark, sf0001).collect()
    // rebuild the edge list from the triangles query's own pair source
    val tri = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sf0001), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .select(least(col("c_nationkey"), col("s_nationkey")).as("u"),
        greatest(col("c_nationkey"), col("s_nationkey")).as("v"))
      .filter(col("u") < col("v")).distinct().collect()
      // nationkey is INT in the fixture; widen instead of assuming LONG
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    val edges = tri.flatMap(p => Seq(p, p.swap))
    val deg = edges.groupBy(_._1).map { case (n, g) => n -> g.length.toLong }
    val xy = edges.map { case (a, b2) => (deg(a), deg(b2)) }
    val n = xy.length.toLong
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val num = n * sxy - sx * sy
    val denx = n * sxx - sx * sx; val deny = n * syy - sy * sy
    val r = if (denx > 0 && deny > 0)
      BigDecimal(num.toDouble / math.sqrt(denx.toDouble * deny.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    else 0.0
    val row = operators.Graph.graphAssort(spark, sf0001).collect()
    assert(row.length == 1)
    assert((row.head.getLong(0), row.head.getLong(1), row.head.getDouble(2))
      == ((n, num, r)))
    // degrees cross-check against clustco's per-node degree column
    val degQ = pairs.map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap
    assert(deg.forall { case (k, v) => degQ(k) == v })
  }

  test("dq funcdep: the key FD holds at zero violations and an attribute FD replays locally") {
    val got = operators.Analytics.dqFuncdep(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 3)
    // o_orderkey is the primary key: it must determine o_custkey exactly
    val (nk, vk, pk) = got(("o_orderkey", "o_custkey"))
    assert(vk == 0L && pk == 0L && nk > 0L)
    // local replay of the o_custkey -> o_orderpriority candidate
    val rows = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val grp = rows.groupBy(_._1).map { case (_, g) => g.map(_._2).toSet.size }
    val nl = grp.size.toLong
    val nv = grp.count(_ > 1).toLong
    assert(got(("o_custkey", "o_orderpriority")) == ((nl, nv, 1000L * nv / nl)))
  }
}
