package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-14 operators: the TypedImperativeAggregate
  * weighted median (object-buffer native tier) and binary sign-bit
  * quantization ANN — each against a from-scratch local replay.
  */
class Round14OpsSpec extends SparkSpec {

  test("wmedian native: histogram aggregate equals the local crossing point and object-hash-aggregates") {
    val rows = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"), col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect()
      .map(r => (r.getString(0), 1L + r.getLong(1) % 5, r.getLong(2)))
    val local = rows.groupBy(_._1).map { case (p, g) =>
      val byVal = g.groupBy(_._3).map { case (v, rs) => v -> rs.map(_._2).sum }
        .toArray.sortBy(_._1)
      val total = byVal.map(_._2).sum
      var cum = 0L
      val med = byVal.find { case (_, w) => cum += w; 2 * cum >= total }.get._1
      p -> (med, total)
    }
    val df = operators.Aggs.aggWmedianNative(spark, sf0001)
    val got = df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(got.toMap == local)
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    // object-buffer tier contract: planned as ObjectHashAggregate with a
    // partial mode crossing the shuffle (map-side histogram combine)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("ObjectHashAggregate"), s"no object agg:\n$plan")
    assert(plan.contains("partial_weightedmediancents"), s"no partial agg:\n$plan")
  }

  test("wmedian native: buffer serde roundtrips and merge order cannot change the median") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = functions.WeightedMedianCents(Literal(0L), Literal(0L))
    val b1 = agg.createAggregationBuffer()
    b1.update(100L, 3L); b1.update(250L, 2L)
    val b2 = agg.deserialize(agg.serialize(b1))
    assert(b2.toMap == Map(100L -> 3L, 250L -> 2L))
    val b3 = agg.createAggregationBuffer()
    b3.update(250L, 4L); b3.update(50L, 1L)
    val ab = agg.merge(agg.deserialize(agg.serialize(b1)), b3)
    val ba = agg.merge(agg.deserialize(agg.serialize(b3)), b1)
    assert(ab.toMap == ba.toMap)
    // total=10, cum at 50→1, 100→4, 250→10: 2*4<10 so median=250
    assert(agg.eval(ab) == 250L)
    assert(agg.eval(agg.createAggregationBuffer()) == null)
  }

  test("emb binquant: sign-pack hamming top-5 and cosine audit equal a local replay") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def packed(v: Array[Float]): (Long, Long) = {
      var h0 = 0L; var h1 = 0L
      for (i <- 0 until 32) {
        if (v(i) > 0f) h0 |= 1L << i
        if (v(i + 32) > 0f) h1 |= 1L << i
      }
      (h0, h1)
    }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val hm = vecs.map { case (id, v) => id -> packed(v) }.toMap
    val expected = vecs.filter(_._1 < 10).flatMap { case (qid, qv) =>
      val others = vecs.filter(_._1 != qid)
      val ham = others.map { case (cid, _) =>
        val (q0, q1) = hm(qid); val (c0, c1) = hm(cid)
        cid -> (java.lang.Long.bitCount(q0 ^ c0) + java.lang.Long.bitCount(q1 ^ c1)).toLong
      }.sortBy { case (cid, h) => (h, cid) }
      val cos10 = others.map { case (cid, cv) =>
        cid -> dot(qv, cv) / (nrm(qid) * nrm(cid))
      }.sortBy { case (cid, c) => (-c, cid) }.take(10).map(_._1).toSet
      ham.take(5).zipWithIndex.map { case ((cid, h), i) =>
        (qid, i + 1L, cid, h, if (cos10(cid)) 1L else 0L)
      }
    }
    val got = operators.Sim.embBinquant(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected.toSeq)
    // the audit is non-degenerate: sign bits do recover some true
    // neighbors here, and hamming distances are non-trivial (not all 0)
    assert(got.map(_._5).sum > 0, "no hamming neighbor hit the cosine top-10")
    assert(got.map(_._4).max > 0)
  }

  test("dedup incr: delta-vs-corpus best matches equal an exhaustive local replay") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def bigrams(t: String): Set[String] = {
      val tk = t.split(" ", -1)
      (1 until tk.length).map(i => tk(i - 1) + " " + tk(i)).toSet
    }
    val sets = docs.map { case (id, t) => id -> bigrams(t) }.toMap
    val newIds = docs.map(_._1).filter(_ % 10 == 7)
    val oldIds = docs.map(_._1).filter(_ % 10 != 7)
    val expected = newIds.flatMap { n =>
      val best = oldIds.flatMap { o =>
        val inter = (sets(n) & sets(o)).size.toLong
        val uni = sets(n).size + sets(o).size - inter
        if (uni > 0 && inter.toDouble / uni >= 0.7)
          Some((o, inter, uni, inter.toDouble / uni))
        else None
      }.sortBy { case (o, _, _, j) => (-j, o) }.headOption
      best.map { case (o, i, u, j) => (n, o, i, u, j) }
    }.sortBy(_._1)
    val got = operators.Dedup.dedupIncr(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == expected.toSeq)
    // the delta split is non-degenerate on this data: dups exist
    assert(got.nonEmpty, "no duplicated new docs at sf0.001 — split degenerate")
  }
}
