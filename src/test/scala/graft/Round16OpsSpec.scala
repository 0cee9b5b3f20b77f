package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-16 operators (connected-components census,
  * the two real-binary-layout multimodal parsers, and the two-sample KS
  * drift statistic): each checked against a from-scratch local replay on
  * sf0.001, plus direct adversarial probes of the byte parsers on
  * crafted buffers (corruption, truncation, trailing garbage) that the
  * fixture's deterministic corrupt slices cannot reach.
  */
class Round16OpsSpec extends SparkSpec {

  // ---- q_graph_cc ----------------------------------------------------

  test("graph cc: census equals a local union-find over the same edges") {
    // local edge replay: per-order distinct part pairs, support >= 2
    val rows = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }
    // .toSeq BEFORE collect: collecting (Long, Long) tuples straight out
    // of a Map rebuilds a Map and silently collapses edges by first key
    val edges = pairs.groupBy(identity).toSeq.collect {
      case (p, occ) if occ.size >= 2 => p
    }
    // union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val sizes = parent.keys.toSeq.groupBy(find).map(_._2.size.toLong)
    val expect = sizes.groupBy(identity)
      .map { case (cs, g) => (cs, g.size.toLong, cs * g.size) }
      .toSeq.sortBy(_._1)
    val got = operators.Graph.graphCc(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"census: got $got expect $expect")
    // node mass accounts for every edge endpoint
    val nNodes = edges.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong
    assert(got.map(_._3).sum == nNodes)
  }

  // ---- q_mm_wavhdr ---------------------------------------------------

  test("mm wavhdr: build->parse is the identity on the declared fields") {
    val m = multimodal.Multimodal
    val data = "hello world of bytes".getBytes("US-ASCII")
    val meta = m.parseWav(5L, m.buildWav(5L, data))
    assert(meta.valid == 1L)
    assert(meta.channels.contains(1 + 5L % 2))
    assert(meta.sample_rate.contains(8000L + (5L % 4) * 4000))
    assert(meta.byte_rate.contains(meta.sample_rate.get * meta.channels.get * 2))
    assert(meta.data_len.contains(data.length.toLong))
    assert(meta.dur_micro.contains(
      data.length * 1000000L / meta.byte_rate.get))
  }

  test("mm wavhdr: corruption anywhere in the header is rejected") {
    val m = multimodal.Multimodal
    val good = m.buildWav(3L, Array.fill(10)('x'.toByte))
    assert(m.parseWav(3L, good).valid == 1L)
    // corrupted magic slice from the builder itself
    assert(m.parseWav(97L, m.buildWav(97L, Array[Byte]('a'))).valid == 0L)
    // every magic byte position must be load-bearing
    for (pos <- Seq(0, 8, 12, 36)) {
      val bad = good.clone(); bad(pos) = 'Z'.toByte
      assert(m.parseWav(3L, bad).valid == 0L, s"magic at $pos not checked")
    }
    // inconsistent chunk sizes must be rejected
    val badLen = good.clone(); badLen(40) = (badLen(40) + 1).toByte
    assert(m.parseWav(3L, badLen).valid == 0L, "data-chunk size not checked")
    val badRiff = good.clone(); badRiff(4) = (badRiff(4) + 1).toByte
    assert(m.parseWav(3L, badRiff).valid == 0L, "riff size not checked")
    // truncation below the fixed header
    assert(m.parseWav(3L, good.take(43)).valid == 0L)
  }

  test("mm wavhdr: little-endian decode reads the exact byte lanes") {
    val m = multimodal.Multimodal
    val wav = m.buildWav(2L, Array.fill(4)('q'.toByte))
    // sample rate for doc 2: 8000 + 2*4000 = 16000 = 0x3E80 -> LE bytes
    // at offset 24: 80 3E 00 00
    assert((wav(24) & 0xff) == 0x80 && (wav(25) & 0xff) == 0x3e)
    assert(m.parseWav(2L, wav).sample_rate.contains(16000L))
  }

  // ---- q_mm_chunks ---------------------------------------------------

  test("mm chunks: build->walk matches the doc_id arithmetic") {
    val m = multimodal.Multimodal
    for (id <- 0L to 20L if id % 89 != 0) {
      val meta = m.parseChunks(id, m.buildChunks(id))
      val n = 1 + id % 3
      assert(meta.valid == 1L && meta.n_chunks.contains(n), s"id=$id")
      val pay = (0L until n).map(i => 8 + (id + i) % 8).sum
      assert(meta.total_payload.contains(pay), s"id=$id")
      val types = Array("IHDR", "IDAT", "IEND")
      assert(meta.last_type.contains(types(((id + n - 1) % 3).toInt)), s"id=$id")
    }
    assert(m.parseChunks(89L, m.buildChunks(89L)).valid == 0L)
  }

  test("mm chunks: truncation, trailing garbage, and length lies are rejected") {
    val m = multimodal.Multimodal
    val good = m.buildChunks(7L)
    assert(m.parseChunks(7L, good).valid == 1L)
    // truncated mid-chunk
    assert(m.parseChunks(7L, good.take(good.length - 3)).valid == 0L)
    // trailing garbage after the last chunk
    assert(m.parseChunks(7L, good ++ Array[Byte](1, 2, 3)).valid == 0L)
    // a length field claiming past the buffer end
    val lie = good.clone(); lie(8) = 0x7f.toByte // huge big-endian length
    assert(m.parseChunks(7L, lie).valid == 0L)
    // signature-only buffer walks zero chunks -> invalid
    assert(m.parseChunks(7L, good.take(8)).valid == 0L)
  }

  // ---- q_graph_nbr_jaccard --------------------------------------------

  test("graph nbr jaccard: top-20 equals a local set-overlap replay") {
    val rows = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val orderCust = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = rows.flatMap { case (ok, sk) =>
      orderCust.get(ok).filter(_ % 100 == 0).map(ck => (ck, sk))
    }.distinct
    val nbrs = e.groupBy(_._1).map { case (ck, g) => ck -> g.map(_._2).toSet }
    val cks = nbrs.keys.toSeq.sorted
    val expect = (for {
      i <- cks.indices; j <- (i + 1) until cks.size
      inter = (nbrs(cks(i)) & nbrs(cks(j))).size.toLong if inter > 0
    } yield {
      val uni = (nbrs(cks(i)) | nbrs(cks(j))).size.toLong
      (cks(i), cks(j), inter, uni, inter * 1000000L / uni)
    }).sortBy(t => (-t._5, t._1, t._2)).take(20)
    val got = operators.Graph.graphNbrJaccard(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect, s"jaccard: got ${got.take(5)} expect ${expect.take(5)}")
  }

  // ---- q_dq_psi --------------------------------------------------------

  test("dq psi: per-source drift equals a local integer replay") {
    val rows = Tables.documents(spark, sf0001)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def band(n: Long): Long = java.lang.Long.toBinaryString(n).length.toLong
    val banded = rows.map { case (src, n) => (src, band(n)) }
    val bands = banded.map(_._2).distinct.sorted
    val bc = bands.size.toLong
    val nC = banded.length.toLong
    val cb = banded.groupBy(_._2).map { case (b, g) => b -> g.size.toLong }
    val expect = banded.groupBy(_._1).map { case (src, g) =>
      val nS = g.size.toLong
      val csb = g.groupBy(_._2).map { case (b, h) => b -> h.size.toLong }
      val raw = bands.map { b =>
        val a = csb.getOrElse(b, 0L) + 1
        val e = cb(b) + 1
        val p = a * 1000000L / (nS + bc)
        val q = e * 1000000L / (nC + bc)
        val l = IntLg.lg(a) - IntLg.lg(nS + bc) - IntLg.lg(e) + IntLg.lg(nC + bc)
        val lm = (l + 30000000L) / 1000L - 30000L
        (p - q) * lm
      }.sum
      (src, nS, bc, math.max(raw, 0L) / 1000L)
    }.toSeq.sortBy(_._1)
    val got = operators.Analytics.dqPsi(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect, s"psi: got ${got.take(3)} expect ${expect.take(3)}")
    // PSI is non-negative by construction and the corpus-vs-itself
    // smoothed score is small for same-shaped sources
    assert(got.forall(_._4 >= 0))
  }

  // ---- q_emb_project ---------------------------------------------------

  test("emb project: projections equal the loadings-weighted dot product") {
    val loadings = operators.Sim.embPcaPower(spark, sf0001).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val expect = vecs.map { case (id, xs) =>
      id -> xs.zipWithIndex.map { case (x, j) =>
        math.floor(x.toDouble * 1000 + 0.5).toLong * loadings(j)
      }.sum
    }.sortBy(_._1).toSeq
    val got = operators.Sim.embProject(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == expect, s"proj: got ${got.take(3)} expect ${expect.take(3)}")
  }

  // ---- q_text_ppl_bucket ----------------------------------------------

  test("ppl bucket: terciles replay from the verified LM scores") {
    // lm_ppl itself is replayed from scratch in LmPplSpec; here the
    // bucketing layer is replayed on top of the operator's scores
    val scores = operators.Text.textLmPpl(spark, sf0001)
      .select(col("doc_id"), col("nll_per_bi")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val meta = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val rows: Seq[(String, Long, Long, Long)] = scores.toSeq.map {
      case (id, nll) => (meta(id)._1, id, nll, meta(id)._2)
    }
    val bucketed: Seq[(String, String, Long, Long)] =
      rows.groupBy(_._1).toSeq.flatMap { case (lang, g) =>
        val sorted = g.sortBy(t => (t._3, t._2))
        val n = sorted.length
        sorted.zipWithIndex.map { case ((_, _, nll, toks), i) =>
          (lang, Seq("head", "middle", "tail")(3 * i / n), nll, toks)
        }
      }
    val expect = bucketed.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((lang, b), g) =>
        (lang, b, g.size.toLong, g.map(_._4).sum,
          g.map(_._3).min, g.map(_._3).max)
      }.sortBy(t => (t._1, t._2))
    val got = operators.Text.textPplBucket(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect, s"buckets: got ${got.take(4)} expect ${expect.take(4)}")
    // bucket NLL ranges must be disjoint and ordered within each lang
    got.groupBy(_._1).foreach { case (lang, g) =>
      val m = g.map(t => t._2 -> (t._5, t._6)).toMap
      for (a <- m.get("head"); b <- m.get("middle")) assert(a._2 <= b._1 || a._2 <= b._2, lang)
    }
  }

  // ---- q_stats_powerlaw -------------------------------------------------

  test("stats powerlaw: MLE alpha equals a local IntLg replay") {
    val rows = Tables.events(spark, sf0001)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expect = rows.groupBy(identity).toSeq
      .map { case ((t, _), g) => (t, g.size.toLong) }
      .filter(_._2 >= 5)
      .groupBy(_._1).map { case (t, g) =>
        val n = g.size.toLong
        val sMicro = g.map { case (_, x) => IntLg.lg(2 * x) - 2197225L }.sum
        (t, 5L, n, sMicro, 1000000L + n * 1000000000000L / sMicro)
      }.toSeq.sortBy(_._1)
    val got = operators.Analytics.statsPowerlaw(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect, s"powerlaw: got ${got.take(3)} expect ${expect.take(3)}")
    // alpha for a heavy-tail-ish count distribution lands in a sane band
    assert(got.forall(t => t._5 > 1000000L && t._5 < 30000000L))
  }

  // ---- q_stats_ks ----------------------------------------------------

  test("stats ks: per-source statistic equals a local ECDF replay") {
    val rows = Tables.documents(spark, sf0001)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val xs = rows.map(_._2).distinct.sorted
    val nTot = rows.length.toLong
    val expect = rows.groupBy(_._1).map { case (src, g) =>
      val n1 = g.size.toLong
      val n2 = nTot - n1
      val mine = g.map(_._2)
      val rest = rows.filter(_._1 != src).map(_._2)
      val dNum = xs.map { x =>
        val c1 = mine.count(_ <= x).toLong
        val c2 = rest.count(_ <= x).toLong
        math.abs(c1 * n2 - c2 * n1)
      }.max
      (src, n1, n2, dNum, n1 * n2, dNum * 1000000L / (n1 * n2))
    }.toSeq.sortBy(_._1)
    val got = operators.Analytics.statsKs(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect, s"ks: got ${got.take(3)} expect ${expect.take(3)}")
  }

  test("stats ks: disjoint source maxes out, mirrored source scores half") {
    import spark.implicits._
    // crafted corpus: sources A and B share the exact length multiset;
    // C is disjointly shifted above both. Drive the OPERATOR through a
    // crafted documents.parquet fixture, not a local-only replay.
    val dir = java.nio.file.Files.createTempDirectory("ksfix").toString
    (Seq.tabulate(8)(i => ("A", 10L + i)) ++
      Seq.tabulate(8)(i => ("B", 10L + i)) ++
      Seq.tabulate(8)(i => ("C", 100L + i)))
      .zipWithIndex
      .map { case ((src, len), i) => (i.toLong, "t", "en", src, len) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.Analytics.statsKs(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    // C fully separated: the ECDF gap hits exactly 1 at x = 17
    assert(got("C") == 1000000L, s"got $got")
    // A vs (B ∪ C): B mirrors A, C is all-above — at x = 17 the gap is
    // |8/8 − 8/16| = 0.5
    assert(got("A") == 500000L && got("B") == 500000L, s"got $got")
  }
}
