package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-7 operators — each asserts the invariant
  * the sf-oracle hash can't isolate: attribution against a local replay
  * of the last-click-carry rule, DAU/WAU against brute-force set algebra
  * over day windows, banded hamming against an all-pairs scan of the
  * engine's own signatures (the pigeonhole recall-1 claim), and the OLS
  * slope against a direct least-squares fit on the frame values.
  */
class Round7OpsSpec extends SparkSpec {

  test("attribution: daily counts equal a local last-click replay") {
    val rows = operators.Events.evtAttribution(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val local = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    ev.groupBy(_._1).values.foreach { g =>
      var lastClick = Option.empty[Long]
      g.sortBy(e => (e._4, e._2)).foreach { case (_, _, typ, us, cents) =>
        if (typ == "purchase") {
          val day = us / 86400000000L
          val attr = lastClick.exists(c => us - c <= 86400000000L)
          val (p, a, m) = local.getOrElse(day, (0L, 0L, 0L))
          local(day) = (p + 1, a + (if (attr) 1L else 0L),
            m + (if (attr) cents else 0L))
        }
        if (typ == "click") lastClick = Some(us)
      }
    }
    assert(rows == local.toMap)
  }

  test("dau/wau: rolling distinct equals brute-force day-window set algebra") {
    val rows = operators.Events.evtDau(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val pairs = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val days = pairs.map(_._2)
    val local = days.map { d =>
      val dau = pairs.count(_._2 == d).toLong
      val wau = pairs.filter(p => p._2 >= d - 6 && p._2 <= d)
        .map(_._1).size.toLong
      d -> (dau, wau, dau * 1000 / wau)
    }.toMap
    assert(rows == local)
  }

  test("banded hamming: pairs equal an all-pairs scan of the engine's own sigs") {
    val sigs = operators.Dedup.hammingSigs(Tables.documents(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val banded = operators.Dedup.dedupHamming(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == exact) // pigeonhole: 4 bands, ham <= 3 => recall 1
    assert(exact.nonEmpty)
  }

  test("simhash_sig codegen expression equals the explode/vote formulation") {
    val sh = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', slice(toks, i, 2)))")).as("tok"))
      .withColumn("th", expr(
        "aggregate(transform(sequence(1, length(tok)), i -> CAST(ascii(substr(tok, i, 1)) AS BIGINT)), " +
          "CAST(7 AS BIGINT), (h, c) -> (h * 131 + c) % 2147483647)"))
    val votes = (0 until 32).map { b =>
      sum(when(expr(s"(th >> $b) & 1") === 1, 1L).otherwise(-1L)).as(s"v$b")
    }
    val sig = (0 until 32).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce[org.apache.spark.sql.Column](_ + _)
    val reference = sh.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .withColumn("sig", sig)
      .select(col("doc_id"), col("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val engine = operators.Dedup.hammingSigs(
        Tables.documents(spark, sf0001))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(engine == reference)
  }

  test("ols slope: window sums reproduce a direct least-squares fit") {
    val rows = operators.Windows.winSlope(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(4) == 336L)) // den = n²(n²−1)/12 at n=8
    val byUser = Tables.events(spark, sf0001)
      .filter(col("user_id") % 17 === 0)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._3, e._2)).map(_._4)).toMap
    rows.take(50).foreach { r =>
      val (uid, x) = (r.getLong(1), r.getLong(2).toInt)
      val ys = byUser(uid).slice(x - 8, x).map(_.toDouble)
      val xs = (x - 7 to x).map(_.toDouble)
      val (n, sx, sy) = (8.0, xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(slope - r.getDouble(5)) < 1e-9, s"uid=$uid x=$x")
    }
  }

  test("tpch q7: both nation-pair directions present and revenue positive") {
    val rows = operators.Analytics.tpchQ7(spark, sf0001).collect()
    val dirs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(dirs.subsetOf(Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3"))))
    assert(rows.forall(_.getLong(3) > 0))
  }
}
