package graft

import org.apache.spark.sql.functions._

/** Crafted near-duplicate corpora pin the MinHash/SimHash/ANN semantics
  * that have no SQL oracle. */
class DedupSimSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    val base = "the fast key order sort table scan merge part window"
    Seq(
      (0L, base),
      (1L, base + " extra"),                      // near-dup of 0
      (2L, base.split(" ").reverse.mkString(" ")), // same token set as 0
      (3L, "completely different words entirely unrelated content here"),
      (4L, "another disjoint document with other vocabulary terms")
    ).toDF("doc_id", "text")
  }

  test("minhash LSH (token sets, n=1): identical sets collide, unrelated don't") {
    val cands = operators.Dedup.minhashCandidates(corpus, nGram = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 2L))) // identical token sets always collide
    assert(!cands.contains((0L, 3L)) && !cands.contains((3L, 4L)))
  }

  test("minhash LSH (shingles, n=2): near-dup collides, token-reorder does not") {
    val cands = operators.Dedup.minhashCandidates(corpus, nGram = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L))) // 9/10 shared shingles → bands collide
    assert(!cands.contains((0L, 3L)) && !cands.contains((3L, 4L)))
  }

  test("simhash: near-dups land within small hamming distance, unrelated far") {
    val sh = operators.Dedup.simhash(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(2L)) == 0)      // same token set → same simhash
    assert(ham(sh(0L), sh(1L)) <= 4)      // near-dup → close
    assert(ham(sh(0L), sh(3L)) >= 4)      // unrelated → far
  }

  test("jaccard query ranks identical token sets at 1.0") {
    import spark.implicits._
    // jaccard of doc0 vs doc2 token sets == 1.0
    val t = corpus
      .withColumn("tset", array_distinct(split(col("text"), " ")))
    val a = t.filter(col("doc_id") === 0).select(col("tset").as("ta"))
    val b = t.filter(col("doc_id") === 2).select(col("tset").as("tb"))
    val jac = a.crossJoin(b)
      .select((size(array_intersect(col("ta"), col("tb"))).cast("double") /
        (size(col("ta")) + size(col("tb")) - size(array_intersect(col("ta"), col("tb")))))
        .as("jac")).as[Double].head()
    assert(jac == 1.0)
  }

  test("ann buckets: identical vectors share a bucket; recall vs brute force is sane") {
    val emb = Tables.embeddings(spark, sf0001)
    val n = Tables.rowCount(spark, sf0001, "embeddings")
    val bk = operators.Dedup.annBuckets(emb, n).select("vec_id", "bucket")
    // deterministic: rerunning yields identical assignments
    val b1 = bk.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = operators.Dedup.annBuckets(emb, n).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    // buckets partition the corpus
    assert(b1.size == emb.count())
  }

  test("nearDupPairs: LSH candidates verified by exact Jaccard") {
    val pairs = operators.Dedup.nearDupPairs(corpus, nGram = 1, threshold = 0.7)
      .select("a_id", "b_id", "jac")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) == 1.0)
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).contains(3L) })
  }

  test("minhash hot bucket: mass duplicates emit all pairs, streamed") {
    import spark.implicits._
    // 6 identical docs collide into one mass-duplicate bucket per band —
    // the hot-bucket scenario the streamed self-join handles without a
    // per-bucket collected row.
    val dup = "mass duplicate boilerplate page content shared by all copies"
    val hot = (0L to 5L).map(i => (i, dup)) ++ Seq(
      (6L, "completely different words entirely unrelated content here"),
      (7L, "another disjoint document with other vocabulary terms"))
    val docs = hot.toDF("doc_id", "text")
    val cands = operators.Dedup.minhashCandidates(docs, nGram = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all 15 duplicate pairs present, no cross-contamination
    val expect = (for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (a, b)).toSet
    assert(expect.subsetOf(cands))
    assert(!cands.exists { case (a, b) => Set(a, b).exists(_ >= 6L) })
  }

  test("clusterLabels: diameter-6 chain converges in O(log n) star rounds") {
    import spark.implicits._
    // 7-node path graph: min-label propagation would need 6 rounds; star
    // contraction folds it in ~3 — and must still reach the true minimum.
    val pairs = (1L to 6L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val lbl = operators.Dedup.clusterLabels(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 7L).forall(lbl(_) == 1L), s"chain: $lbl")
  }

  test("clusterLabels: fails fast when the round budget is too small") {
    import spark.implicits._
    // a 33-node path needs more than 2 contraction rounds
    val pairs = (1L to 32L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val e = intercept[IllegalStateException] {
      operators.Dedup.clusterLabels(pairs, maxRounds = 2).collect()
    }
    assert(e.getMessage.contains("maxRounds"))
  }

  test("clusterLabels: chains converge to the component minimum, islands stay apart") {
    import spark.implicits._
    // a 4-chain (1-2-3-4, no shortcut edges) plus a separate 2-clique
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a_id", "b_id")
    val lbl = operators.Dedup.clusterLabels(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(lbl(_) == 1L), s"chain: $lbl")
    assert(lbl(10L) == 10L && lbl(11L) == 10L, s"island: $lbl")
  }

  test("dedupRepr: one keeper per cluster, and it is the longest member") {
    val rows = operators.Dedup.dedupRepr(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (canon, members) =>
      val keepers = members.filter(_._5 == 1L)
      assert(keepers.length == 1, s"cluster $canon: ${keepers.length} keepers")
      val k = keepers.head
      // keeper is the member every row points at, and no member is longer
      assert(members.forall(_._3 == k._1), s"cluster $canon: repr mismatch")
      assert(members.forall(m => m._4 < k._4 ||
        (m._4 == k._4 && m._1 >= k._1)), s"cluster $canon: keeper not best")
    }
  }

  test("salted aggregation equals plain groupBy aggregation") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf0001)
    val plain = ev.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = operators.Skew.saltedCount(ev, col("event_type"), 8, col("event_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("hardneg: every mined negative is cross-label within the coarse block, plan broadcasts anchors") {
    import org.apache.spark.sql.functions._
    val df = operators.Sim.simHardneg(spark, sf0001)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, ql, cid, cl) =>
      assert(ql != cl, s"anchor $qid mined a POSITIVE ($cid, label $cl)")
      assert(ql % 5 == cl % 5,
        s"anchor $qid escaped its coarse block: $ql vs $cl")
    }
    assert(rows.groupBy(_._1).values.forall(_.length <= 3))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"anchor side must broadcast, candidate side must not shuffle:\n$p")
  }

  test("decode stub counts bytes exactly") {
    val f = multimodal.Multimodal.decodeStub(
      multimodal.MediaIn(1L, "beat a tree".getBytes("UTF-8")))
    assert(f.n_bytes == 11 && f.cnt_a == 2 && f.cnt_e == 3 && f.cnt_t == 2)
    assert(f.ratio_a == 2.0 / 11)
  }

  test("frame sampler emits evenly-spaced windows; resize hits the byte budget") {
    val in = multimodal.MediaIn(7L, ("abcdefghij" * 6).getBytes("UTF-8")) // 60 bytes
    val frames = multimodal.Multimodal.frameSampleStub(in, nFrames = 3, width = 16)
    assert(frames.map(_.frame_id) == Seq(0L, 1L, 2L))
    assert(frames.map(f => new String(f.frame)).toSeq ==
      Seq("abcdefghijabcdef", "abcdefghijabcdef", "abcdefghijabcdef"))
    val short = multimodal.MediaIn(8L, "abcde".getBytes("UTF-8"))
    assert(multimodal.Multimodal.frameSampleStub(short, 3, 16)
      .map(f => new String(f.frame)) == Seq("abcde", "bcde", "de"))
    val rz = multimodal.Multimodal.resizeStub(in, 10)
    assert(rz.resized.length == 10)
    assert(multimodal.Multimodal.resizeStub(short, 10).resized.sameElements(short.media))
  }
}
