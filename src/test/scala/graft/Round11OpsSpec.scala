package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-11 operators — local replays of the
  * cross-engine md5 hash fold and the sketch confusion counts the
  * sf-oracle hash can't isolate.
  */
class Round11OpsSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def md5Int(s: String, digits: Int = 8): Long =
    java.lang.Long.parseLong(md5hex(s).take(digits), 16)

  test("join bloom: confusion counts equal a local bloom replay; no false negatives") {
    val m = 131072
    val build = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val probe = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey")).distinct().collect().map(_.getLong(0))
    def bits(k: Long): Seq[Long] =
      (0 until 3).map(j => md5Int(s"$j:$k") % m)
    val words = scala.collection.mutable.Map[Long, Long]()
    for (k <- build; b <- bits(k))
      words(b / 32) = words.getOrElse(b / 32, 0L) | (1L << (b % 32))
    def pass(k: Long): Boolean = bits(k).forall { b =>
      (words.getOrElse(b / 32, 0L) >> (b % 32) & 1L) == 1L
    }
    val nKeys = probe.length.toLong
    val nMember = probe.count(build.contains).toLong
    val nPass = probe.count(pass).toLong
    val nFp = probe.count(k => pass(k) && !build.contains(k)).toLong
    val nFn = probe.count(k => !pass(k) && build.contains(k)).toLong
    val r = operators.Joins.joinBloom(spark, sf0001).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((nKeys, nMember, nPass, nFp, nFn)))
    assert(r.getLong(5) == nFp * 1000L / (nKeys - nMember))
    // the audit is non-trivial: members exist, all of them pass (FN = 0)
    assert(nMember > 0 && nPass >= nMember && nFn == 0L)
  }

  private val MdP = 2147483647L

  private def localDocs: Array[(Long, String, String, Set[String])] =
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("source"), col("text")).collect()
      .map { r =>
        val tk = r.getString(3).split(" ")
        val sh = (0 until tk.length - 1).map(i => tk(i) + " " + tk(i + 1)).distinct.toSet
        (r.getLong(0), r.getString(1), r.getString(2), sh)
      }

  private def localSigs(sh: Set[String]): Seq[Long] = {
    // set order must not matter: each perm takes a min over ALL shingles
    val hp = sh.toSeq.map(x => md5Int(x) % MdP)
    (0 until 8).map { i =>
      val a = functions.MinHashParams.a(i)
      val b = functions.MinHashParams.b(i)
      hp.map(v => (a * v + b) % MdP).min
    }
  }

  test("dedup minhash md5: signatures equal a local md5 replay for every doc") {
    val local = localDocs.filter(_._4.nonEmpty)
      .map { case (id, _, _, sh) => id -> localSigs(sh) }.toMap
    val rows = operators.Dedup.dedupMinhashMd5(spark, sf0001).collect()
    assert(rows.length == local.size)
    rows.foreach { r =>
      assert((1 to 8).map(r.getLong(_)) == local(r.getLong(0)),
        s"sig mismatch for doc ${r.getLong(0)}")
    }
  }

  test("dedup est err: bands equal a local estimate-vs-exact replay") {
    val docs = localDocs.filter(_._4.nonEmpty)
    val sigs = docs.map { case (id, _, _, sh) => id -> localSigs(sh) }.toMap
    val diffs = for {
      (aId, aL, aS, ta) <- docs
      (bId, bL, bS, tb) <- docs
      if aL == bL && aS == bS && aId < bId
    } yield {
      val est = sigs(aId).zip(sigs(bId)).count { case (x, y) => x == y }.toLong * 1000L / 8
      val inter = ta.intersect(tb).size.toLong
      val uni = ta.size + tb.size - inter
      est - inter * 1000L / uni
    }
    val local = diffs.groupBy(d => (d + 1000) / 125)
      .map { case (b, g) => b -> (g.length.toLong, g.min, g.max) }
    val rows = operators.Dedup.dedupEstErr(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toMap == local)
    // the audit sees real spread: more than one error band is populated
    assert(rows.length > 1)
  }

  test("emb matryoshka: recall@10 equals a local two-ranking replay") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double], n: Int): Double = {
      var s = 0.0; var i = 0
      while (i < n) { s += a(i) * b(i); i += 1 }; s
    }
    def top10(qid: Long, qv: Array[Double], n: Int): Set[Long] = {
      val qn = math.sqrt(dot(qv, qv, n))
      vecs.filter(_._1 != qid).map { case (cid, cv) =>
        (cid, dot(qv, cv, n) / (qn * math.sqrt(dot(cv, cv, n))))
      }.sortBy { case (cid, cos) => (-cos, cid) }.take(10).map(_._1).toSet
    }
    val local = vecs.filter(_._1 < 10).map { case (qid, qv) =>
      val overlap = top10(qid, qv, 64).intersect(top10(qid, qv, 16)).size.toLong
      qid -> (overlap, overlap * 1000L / 10)
    }.toMap
    val rows = operators.Sim.embMatryoshka(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    assert(rows.toMap == local)
    // truncation to 16 of 64 dims must actually cost recall somewhere —
    // a perfect-1000 row set would mean the audit measures nothing
    assert(rows.exists(_._2._2 < 1000L))
  }

  test("evt typevec: top-20 behavioral cosines equal a local replay") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cnt = ev.groupBy(_._1).map { case (u, g) =>
      u -> types.map(t => g.count(_._2 == t).toLong)
    }
    val top = cnt.toSeq
      .sortBy { case (u, v) => (-v.sum, u) }.take(20)
    val local = (for {
      (a, va) <- top; (b, vb) <- top; if a < b
    } yield {
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      val na2 = va.map(x => x * x).sum
      val nb2 = vb.map(x => x * x).sum
      (a, b, dot, na2, nb2, dot / (math.sqrt(na2.toDouble) * math.sqrt(nb2.toDouble)))
    }).sortBy { case (a, b, _, _, _, c) => (-c, a, b) }.take(20)
    val rows = operators.Events.evtTypevec(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.toSeq == local)
  }

  test("graph degree: octave bands equal a local co-purchase replay") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val deg = pairs.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    def band(d: Long): Long = { var k = 0; while ((2L << k) <= d && k < 15) k += 1; k }
    val local = deg.values.groupBy(band).map { case (b, g) =>
      b -> (g.size.toLong, g.min, g.max) }
    val rows = operators.Graph.graphDegree(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toMap == local)
  }

  test("win cumedist: distribution position and share equal a local replay") {
    val cust = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getString(1), math.round(r.getDouble(2) * 100)))
    val bySeg = cust.groupBy(_._2)
    val rows = operators.Windows.winCumedist(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(rows.length == cust.length)
    rows.foreach { case (ck, seg, cents, cd, sharePm) =>
      val g = bySeg(seg)
      assert(cents == g.find(_._1 == ck).get._3)
      assert(cd == g.count(_._3 <= cents).toDouble / g.length)
      assert(sharePm == cents * 1000L / g.map(_._3).sum)
    }
  }

  test("dq fingerprint: checksums equal local md5 digests; all tables covered") {
    val rows = operators.Analytics.dqFingerprint(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("customer", "documents", "embeddings", "events",
      "lineitem", "nation", "orders", "part", "region", "supplier"))
    val nat = Tables.nation(spark, sf0001).select(col("n_nationkey")).collect()
      .map(_.getInt(0))
    assert(rows("nation") == ((nat.length.toLong, nat.map(k => md5Int(k.toString)).sum)))
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey")).collect()
      .map(r => s"${r.getLong(0)}:${r.getInt(1)}:${r.getLong(2)}:${r.getLong(3)}")
    assert(rows("lineitem") == ((li.length.toLong, li.map(md5Int(_)).sum)))
    // order-independence: the checksum of a shuffled copy is identical
    assert(li.reverse.map(md5Int(_)).sum == rows("lineitem")._2)
  }

  test("text novelty: decile curve equals a local first-seen replay") {
    val docs = localDocs.filter(_._4.nonEmpty).sortBy(_._1)
    val firstSeen = scala.collection.mutable.Map[String, Long]()
    for ((id, _, _, sh) <- docs; g <- sh)
      if (!firstSeen.contains(g) || firstSeen(g) > id) firstSeen(g) = id
    val mx = localDocs.map(_._1).max
    val local = docs.map { case (id, _, _, sh) =>
      (math.min(id * 10 / (mx + 1), 9L), sh.size.toLong,
        sh.count(g => firstSeen(g) == id).toLong)
    }.groupBy(_._1).map { case (dec, g) =>
      val nSh = g.map(_._2).sum; val nNov = g.map(_._3).sum
      dec -> (g.length.toLong, nSh, nNov, nNov * 1000L / nSh)
    }
    val rows = operators.Text.textNovelty(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toMap == local)
    // novelty decays: the first decile mints strictly more novel mass
    // per shingle than the last
    assert(local(0L)._4 > local(local.keys.max)._4)
  }

  test("evt overlap: audience jaccard matrix equals a local set replay") {
    val tu = Tables.events(spark, sf0001)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
    val sets = tu.groupBy(_._1).map { case (t, g) => t -> g.map(_._2).toSet }
    val types = sets.keys.toSeq.sorted
    val local = (for {
      i <- types.indices; j <- i + 1 until types.length
    } yield {
      val (ta, tb) = (types(i), types(j))
      val (sa, sb) = (sets(ta), sets(tb))
      val inter = sa.intersect(sb).size.toLong
      val uni = sa.size + sb.size - inter
      (ta, tb, sa.size.toLong, sb.size.toLong, inter, uni, inter * 1000L / uni)
    }).toSeq
    val rows = operators.Events.evtOverlap(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.toSeq == local)
    assert(rows.length == 10)
  }
}
