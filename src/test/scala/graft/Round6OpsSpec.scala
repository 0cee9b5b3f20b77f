package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-6 operators, each asserting the invariant
  * the sf-oracle hash can't isolate: the md5 split against a local JVM
  * MD5 replay (engine-independence is the whole point of a hash split),
  * MERGE action algebra against set arithmetic on the inputs, Q18's
  * HAVING gate against a local group-sum, and the Lloyd iteration against
  * an in-memory k-means step on the same quantized integers.
  */
class Round6OpsSpec extends SparkSpec {

  test("sample split: engine buckets equal a local JVM MD5 replay and partition the corpus") {
    val rows = operators.Relational.sampleSplit(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def split(id: Long): String = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val bucket = Integer.parseInt(hex.substring(31), 16)
      if (bucket < 12) "train" else if (bucket < 14) "val" else "test"
    }
    val local = docs.groupBy(t => (split(t._1), t._2)).view
      .mapValues(ds => (ds.length.toLong, ds.map(_._3).sum)).toMap
    assert(rows == local)
    assert(rows.values.map(_._1).sum == docs.length)
  }

  test("merge: action counts follow from set arithmetic on the inputs") {
    val rows = operators.Analytics.sqlMerge(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("delete", "update", "insert", "keep"))
    val base = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nDel = base.keys.count(_ % 97 == 0).toLong
    val updKeys = Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "O" && col("o_orderdate") >= "2000-01-01")
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0))
      .filter(_ % 97 != 0).toSet
    val nSup = Tables.supplier(spark, sf0001).count()
    assert(rows("delete")._1 == nDel && rows("delete")._2 == 0L)
    assert(rows("insert")._1 == nSup)
    assert(rows("update")._1 == updKeys.size.toLong)
    assert(rows("keep")._1 == base.size - nDel - updKeys.size)
    // Updated group's balance = base balances of those keys + $10.00 each.
    assert(rows("update")._2 == updKeys.toSeq.map(base).sum + 1000L * updKeys.size)
  }

  test("tpch q18: the HAVING gate admits exactly the orders a local group-sum admits") {
    val got = operators.Analytics.tpchQ18(spark, sf0001).collect()
    val sums = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bigLocal = sums.filter(_._2 > 300).keySet
    assert(got.nonEmpty)
    assert(got.map(_.getLong(2)).toSet.subsetOf(bigLocal))
    for (r <- got) assert(r.getDouble(5) == sums(r.getLong(2)))
    // limit 100 means equality only when the gate admits <= 100 orders
    if (bigLocal.size <= 100) assert(got.map(_.getLong(2)).toSet == bigLocal)
    val cents = got.map(_.getLong(4))
    assert(cents.zip(cents.tail).forall { case (a, b) => a >= b })
  }

  test("markov: transition counts conserve events and from-totals are row-consistent") {
    val rows = operators.Events.evtMarkov(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // Every user with k events contributes exactly k-1 transitions.
    val perUser = Tables.events(spark, sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("k"))
      .collect().map(_.getLong(1))
    assert(rows.map(_._3).sum == perUser.map(_ - 1).sum)
    // from_total on each row equals the sum of n over that from-state.
    val byFrom = rows.groupBy(_._1)
    for ((f, rs) <- byFrom) {
      assert(rs.map(_._4).distinct.size == 1, s"inconsistent from_total for $f")
      assert(rs.head._4 == rs.map(_._3).sum, s"from_total mismatch for $f")
    }
  }

  test("rarity: engine scores equal a local df replay") {
    val got = operators.Text.textRarity(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val df = docs.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    for ((id, ts) <- docs) {
      val rarity = ts.map(t => 1000000L / df(t)).sum
      assert(got(id) == ((ts.size.toLong, rarity, rarity / ts.size)), s"doc $id")
    }
  }

  test("kmeans: the Lloyd round matches an in-memory replay on the same integers") {
    val got = operators.Sim.simKmeans(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.min(127L, math.max(-128L, math.floor(x.toDouble * 64.0 + 0.5).toLong))).toArray)
      .sortBy(_._1)
    val c0 = vecs.filter(_._1 < 4).map(_._2)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val a0 = vecs.map { case (id, v) =>
      (id, v, (0 until 4).minBy(j => (d2(v, c0(j)), j)).toLong) }
    val byC = a0.groupBy(_._3)
    val sums = byC.view.mapValues(g =>
      (g.map(_._2).transpose.map(_.sum).toArray, g.length.toLong)).toMap
    val a1 = a0.map { case (id, v, cid0) =>
      val (cid1, num) = (0L until 4L).map { j =>
        val (s, n) = sums(j)
        val num = v.zip(s).map { case (x, si) => (x * n - si) * (x * n - si) }.sum
        (j, num, num.toDouble / (n * n))
      }.minBy(t => (t._3, t._1)) match { case (j, num, _) => (j, num) }
      (id, cid0, cid1, num)
    }
    val local = a1.groupBy(_._3).view.mapValues(g =>
      (g.length.toLong, g.count(t => t._2 != t._3).toLong, g.map(_._4).sum)).toMap
    assert(got == local)
    assert(got.values.map(_._1).sum == vecs.length)
  }
}
