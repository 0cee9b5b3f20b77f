package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-13 operators: PQ asymmetric-distance
  * search, kNN-graph mutuality, and the LSH banding sweep — each against
  * a from-scratch local replay.
  */
class Round13OpsSpec extends SparkSpec {

  private def md5Int(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8), 16)

  private def quant(v: Seq[Float]): Array[Long] =
    v.map(x => math.min(127L, math.max(-128L,
      math.floor(x.toDouble * 64.0 + 0.5).toLong))).toArray

  test("sim pq search: ADC top-5 equals a local lookup-table replay") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), quant(r.getSeq[Float](1))))
    def sub(v: Array[Long], m: Int): Array[Long] = v.slice(m * 8, m * 8 + 8)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val cents = vecs.filter(_._1 < 4)
    def code(v: Array[Long], m: Int): Long =
      cents.map { case (c, cv) => (c, l2(sub(v, m), sub(cv, m))) }
        .minBy { case (c, dd) => (dd, c) }._1
    val local = vecs.filter(_._1 < 10).flatMap { case (qid, qv) =>
      val lut = (0 until 8).map(m =>
        cents.map { case (c, cv) => c -> l2(sub(qv, m), sub(cv, m)) }.toMap)
      vecs.filter(_._1 != qid).map { case (cid, cv) =>
        (qid, cid, (0 until 8).map(m => lut(m)(code(cv, m))).sum)
      }.sortBy { case (_, cid, dd) => (dd, cid) }.take(5).zipWithIndex
        .map { case ((q, c, dd), i) => (q, c, dd, i + 1L) }
    }.sortBy { case (q, _, _, rn) => (q, rn) }
    val rows = operators.Sim.simPqSearch(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == local.toSeq)
  }

  test("sim knn graph: per-label mutuality equals a local replay") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val edges = vecs.flatMap { case (q, l, qv) =>
      val qn = math.sqrt(dot(qv, qv))
      vecs.filter(v => v._2 == l && v._1 != q).map { case (c, _, cv) =>
        (c, dot(qv, cv) / (qn * math.sqrt(dot(cv, cv))))
      }.sortBy { case (c, cos) => (-cos, c) }.take(3).map(e => (l, q, e._1))
    }
    val eSet = edges.map(e => (e._2, e._3)).toSet
    val local = edges.groupBy(_._1).map { case (l, g) =>
      val mutual = g.count(e => eSet.contains((e._3, e._2))).toLong
      l.toLong -> (g.map(_._2).distinct.length.toLong, g.length.toLong,
        mutual, mutual * 1000L / g.length)
    }
    val rows = operators.Sim.simKnnGraph(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toMap == local)
    // the audit is informative: reciprocity is neither 0 nor perfect
    assert(local.values.exists(v => v._4 > 0 && v._4 < 1000))
  }

  test("dedup lsh sweep: per-geometry bucket stats equal a local replay") {
    val P = 2147483647L
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val tk = r.getString(1).split(" ")
        (r.getLong(0),
          (0 until tk.length - 1).map(i => tk(i) + " " + tk(i + 1)).distinct)
      }.filter(_._2.nonEmpty)
    val sigs = docs.map { case (_, sh) =>
      val hp = sh.map(x => md5Int(x) % P)
      (0 until 8).map { i =>
        val a = functions.MinHashParams.a(i)
        val b = functions.MinHashParams.b(i)
        hp.map(v => (a * v + b) % P).min
      }
    }
    val local = Seq(1, 2, 4).map { r =>
      val buckets = sigs.flatMap { sg =>
        (0 until 8 / r).map(b =>
          (b.toString +: (b * r until (b + 1) * r).map(i => sg(i).toString))
            .mkString(":"))
      }.groupBy(identity).values.map(_.length.toLong)
      (r.toLong, (8 / r).toLong, buckets.size.toLong,
        buckets.map(n => n * (n - 1) / 2).sum, buckets.max)
    }
    val rows = operators.Dedup.dedupLshSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSeq == local)
    // finer bands must cost more candidate pairs — the curve the sweep exists to show
    assert(local.head._4 > local.last._4)
  }

  test("udaf wavg native: DeclarativeAggregate equals a local integer replay and partially aggregates") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_quantity")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100), r.getDouble(2).toLong))
    val brand = Tables.part(spark, sf0001)
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val local = li.groupBy(r => brand(r._1)).map { case (b, g) =>
      b -> (g.map(r => r._2 * r._3).sum / g.map(_._3).sum, g.length.toLong)
    }
    val df = operators.Aggs.udafWavgNative(spark, sf0001)
    val rows = df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(rows.toMap == local)
    // native tier contract: planned as partial + final hash aggregation
    // (one buffer crosses the shuffle), like a built-in sum
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("partial_weightedavgcents"), s"no partial agg:\n$plan")
    assert(plan.contains("HashAggregate"))
  }
}
