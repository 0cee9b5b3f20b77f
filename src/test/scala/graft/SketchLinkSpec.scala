package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the KMV sketch family and the record-linkage
  * pipeline: each against a from-scratch local replay (independent md5 +
  * sort, not the query's own expressions), plus plan-shape guards.
  */
class SketchLinkSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def fold(hex: String, digits: Int): Long =
    hex.take(digits).foldLeft(0L)((a, c) =>
      a * 16 + "0123456789abcdef".indexOf(c))

  test("kmv: n_kept, kth and estimate equal a local bottom-k replay") {
    val statusCust = Tables.orders(spark, sf0001)
      .select(col("o_orderstatus"), col("o_custkey")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val local = statusCust.groupBy(_._1).map { case (st, g) =>
      val hashes = g.map(x => fold(md5hex(x._2.toString), 8)).distinct.sorted
      val kept = hashes.take(64)
      val est =
        if (kept.length < 64) kept.length.toLong
        else 63L * (1L << 32) / math.max(kept.last, 1L)
      st -> (g.map(_._2).distinct.length.toLong, kept.length.toLong,
        kept.last, est)
    }
    val got = operators.Sketch.approxKmv(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == local)
  }

  test("kmv jacc: union sketch and inclusion-exclusion equal a local replay") {
    val statusCust = Tables.orders(spark, sf0001)
      .select(col("o_orderstatus"), col("o_custkey")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sets = statusCust.groupBy(_._1)
      .map { case (st, g) => st -> g.map(_._2).toSet }
    def hset(ks: Set[Long]): Set[Long] =
      ks.map(k => fold(md5hex(k.toString), 8))
    def est(hs: Set[Long]): Long = {
      val kept = hs.toSeq.sorted.take(64)
      if (kept.length < 64) kept.length.toLong
      else 63L * (1L << 32) / math.max(kept.last, 1L)
    }
    val local = (for {
      a <- sets.keys; b <- sets.keys if a < b
    } yield {
      val (ea, eb) = (est(hset(sets(a))), est(hset(sets(b))))
      val eu = est(hset(sets(a)) ++ hset(sets(b)))
      (a, b) -> ((sets(a) & sets(b)).size.toLong, ea, eb, eu,
        math.max(0L, ea + eb - eu))
    }).toMap
    val got = operators.Sketch.approxKmvJacc(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got == local)
  }

  test("kmv: no cartesian product; the only BNL is the tiny pair generator") {
    val p = operators.Sketch.approxKmvJacc(spark, sf0001)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct"), s"degenerated:\n$p")
    assert(p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") <= 1, s"extra BNL:\n$p")
  }

  test("kmv rollup: merged nation sketches equal a direct local region sketch") {
    val rows = Tables.customer(spark, sf0001)
      .join(Tables.nation(spark, sf0001),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_regionkey"), col("c_custkey")).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1)))
    val local = rows.groupBy(_._1).map { case (rk, g) =>
      val hs = g.map(x => fold(md5hex(x._2.toString), 8)).distinct.sorted
      val kept = hs.take(64)
      rk -> (kept.length.toLong, kept.last)
    }
    val got = operators.Sketch.approxKmvRollup(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got == local)
  }

  test("kmv agg tier: equals the window tier row-for-row without a window in the plan") {
    val win = operators.Sketch.approxKmv(spark, sf0001).collect().toSeq
    val agg = operators.Sketch.approxKmvAgg(spark, sf0001)
    assert(agg.collect().toSeq == win)
    val p = agg.queryExecution.executedPlan.toString()
    assert(!p.contains("Window"), s"agg tier fell back to a window:\n$p")
    // the bounded buffer is an object aggregate with a partial mode
    // crossing the shuffle (map-side combine of 64-element buffers)
    assert(p.contains("ObjectHashAggregate"), s"no object agg:\n$p")
    assert(p.contains("partial_topk"), s"no map-side combine:\n$p")
  }

  test("agg ivm: signed-partial maintenance equals a snapshot recompute") {
    val rows = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // replay the mutated snapshot directly
    val snap = rows.filter(_._1 % 97 != 0)
      .map { case (k, p, c) => (p, if (k % 89 == 0) c + 1 else c) } ++
      rows.filter(_._1 % 101 == 0).map { case (_, p, c) => (p, c) }
    val local = snap.groupBy(_._1).map { case (p, g) =>
      val s = g.map(_._2).sum
      p -> (g.length.toLong, s, s / g.length)
    }
    val got = operators.Aggs.aggIvm(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == local)
  }

  test("agg incr: merged state+delta partials equal a full recompute") {
    import org.apache.spark.sql.functions.{expr => e}
    val full = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(e("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("sum_cents"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(2) / r.getLong(1))).toMap
    val got = operators.Aggs.aggIncr(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == full)
  }

  test("plan shapes: new family stays off cartesian products and data-sized windows") {
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString()
    val rollup = plan(operators.Sketch.approxKmvRollup(spark, sf0001))
    assert(!rollup.contains("CartesianProduct"))
    assert(!rollup.contains("Window"), "rollup must use buffers, not ranks")
    assert(rollup.contains("ObjectHashAggregate"), "TopK buffers missing")
    assert(rollup.contains("BroadcastHashJoin"), "nation dim not broadcast")
    val surprise = plan(operators.Text.textSurprise(spark, sf0001))
    assert(!surprise.contains("CartesianProduct"))
    assert(!surprise.contains("Window"), "surprisal needs no window at all")
    for (df <- Seq(operators.Sim.simMmr(spark, sf0001),
        operators.Sim.simCoreset(spark, sf0001))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"),
        "greedy chain degenerated to a cartesian")
    }
    val ldiv = plan(operators.Analytics.dqLdiv(spark, sf0001))
    assert(!ldiv.contains("CartesianProduct") &&
      !ldiv.contains("BroadcastNestedLoop"))
    // the layout advisor's windows are all bucket-partitioned except the
    // bucket-count-sized seam frame: no window may sort the fact rows
    // in one task — pin by requiring every Window's partition spec to
    // mention bkt OR operate post-aggregation (seam pass input is the
    // per-bucket aggregate, whose plan sits above the groupBy)
    val layout = plan(operators.Analytics.layoutRuns(spark, sf0001))
    assert(layout.contains("bkt"), "bucketed windows missing")
  }

  test("link er: every corrupted right resolves to its true customer") {
    val rows = operators.Link.linkEr(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // fixture custkeys are dense [0, n): class sizes are a local replay
    // of the same %7 rule over the distinct ordering customers
    val keys = Tables.orders(spark, sf0001)
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0))
    val nSub = keys.count(_ % 7 == 3).toLong
    val nDrop = keys.count(_ % 7 == 5).toLong
    val nClean = keys.length - nSub - nDrop
    assert(rows("clean") == ((nClean, nClean, nClean, 0L)))
    // one edit injected → matched at dist exactly 1, all correct
    assert(rows("sub") == ((nSub, nSub, nSub, nSub)))
    assert(rows("drop") == ((nDrop, nDrop, nDrop, nDrop)))
  }

  test("link blocks: candidate arithmetic equals a local count and never expands pairs") {
    val df = operators.Link.linkBlocks(spark, sf0001)
    val r = df.collect().head
    val keys = Tables.orders(spark, sf0001)
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0))
    val nCust = Tables.customer(spark, sf0001).count()
    val rb = keys.groupBy(_ % 100).map { case (b, g) => b -> g.length.toLong }
    val lb = Tables.customer(spark, sf0001)
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .groupBy(_ % 100).map { case (b, g) => b -> g.length.toLong }
    val blocks = (rb.keySet ++ lb.keySet)
    val cand = blocks.toSeq.map(b =>
      lb.getOrElse(b, 0L) * rb.getOrElse(b, 0L)).sum
    assert(r.getLong(0) == blocks.size.toLong)
    assert(r.getLong(3) == cand)
    assert(r.getLong(4) == nCust * keys.length)
    // the audit itself must not join row-level pairs: no join wider than
    // the block-count tables appears — pin via absence of levenshtein
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("levenshtein"), s"audit expanded pairs:\n$p")
  }

  test("bloom: one-sided guarantee — every member claimed, fp audit consistent") {
    val r = operators.Sketch.approxBloom(spark, sf0001).collect().head
    val (nBuild, nBits, nProbe, nClaimed, nMembers, nFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
    // no false negatives: claimed = members + false positives exactly
    assert(nClaimed == nMembers + nFp)
    assert(nBits <= math.min(4096L, 3L * nBuild))
    assert(nBits > 0 && nProbe >= nMembers)
    // truth column really is the exact membership
    val exact = Tables.customer(spark, sf0001)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
      .join(Tables.orders(spark, sf0001)
        .select(col("o_custkey").as("c_custkey")).distinct(), "c_custkey")
      .count()
    assert(nMembers == exact)
  }

  test("notin null: NOT IN with a nulled element is empty; NOT EXISTS returns the complement") {
    val r = operators.SqlReport.sqlNotinNull(spark, sf0001).collect().head
    assert(r.getLong(0) == 0L, "NOT IN over a NULL-bearing list must be empty")
    assert(r.getLong(1) > 0L, "NOT EXISTS twin should find real non-buyers")
  }

  test("split: cluster-hash split never straddles a near-dup cluster; doc-hash split does") {
    val r = operators.Dedup.dedupSplit(spark, sf0001).collect().head
    val nDocs = r.getLong(0)
    assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == nDocs)
    assert(r.getLong(5) + r.getLong(6) + r.getLong(7) == nDocs)
    assert(r.getLong(9) == 0L, "cluster-keyed split leaked a cluster")
    assert(r.getLong(8) >= r.getLong(9))
  }

  test("privacy audits: kanon partitions every customer; ldiv l is bounded by the priority domain") {
    val kanon = operators.Analytics.dqKanon(spark, sf0001).collect()
    assert(kanon.map(_.getLong(2)).sum ==
      Tables.customer(spark, sf0001).count())
    val bands = kanon.map(_.getString(0)).toSet
    assert(bands.subsetOf(Set("1", "2-4", "5-9", "10+")))
    val ldiv = operators.Analytics.dqLdiv(spark, sf0001).collect()
    val nPrio = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority")).distinct().count()
    assert(ldiv.map(_.getLong(0)).forall(l => l >= 1 && l <= nPrio))
    // every ordering customer lands in exactly one class
    val nOrdering = Tables.orders(spark, sf0001)
      .select(col("o_custkey")).distinct().count()
    assert(ldiv.map(_.getLong(2)).sum == nOrdering)
  }

  test("mmr: three greedy rounds equal a local integer replay") {
    val vecs = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.min(127L, math.max(-128L,
            math.floor(x.toDouble * 64.0 + 0.5).toLong))).toArray)
      .toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val qv = vecs(0L)
    val rel = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, dot(qv, v)) }
    var sel = Vector.empty[(Long, Long, Long, Long)] // id, rel, maxsim, mmr
    var cand = rel
    for (_ <- 1 to 3) {
      val scored = cand.map { case (id, v, r) =>
        val ms = if (sel.isEmpty) 0L
          else sel.map(s => dot(v, vecs(s._1))).max
        (id, r, ms, (7 * r - 3 * ms) / 10)
      }
      val best = scored.minBy(t => (-t._4, t._1))
      sel :+= best
      cand = cand.filter(_._1 != best._1)
    }
    val got = operators.Sim.simMmr(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toVector == sel)
  }

  test("coreset: farthest-point traversal equals a local replay; cover radius shrinks") {
    val vecs = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.min(127L, math.max(-128L,
            math.floor(x.toDouble * 64.0 + 0.5).toLong))).toArray)
      .toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var sel = Vector(0L)
    var expect = Vector((1L, 0L, 0L))
    for (r <- 2 to 4) {
      val best = vecs.keys.filter(!sel.contains(_)).toSeq
        .map(id => (id, sel.map(s => d2(vecs(id), vecs(s))).min))
        .minBy(t => (-t._2, t._1))
      sel :+= best._1
      expect :+= ((r.toLong, best._1, best._2))
    }
    val got = operators.Sim.simCoreset(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == expect)
    // farthest-point invariant: pick-time cover radius is non-increasing
    val radii = got.drop(1).map(_._3)
    assert(radii == radii.sortBy(-_))
  }

  test("budget: greedy density prefix equals a local knapsack replay") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perDoc = docs.map { case (id, src, text) =>
      val toks = text.split(" ", -1)
      val score = toks.map { tok =>
        val b = fold(md5hex(tok).substring(30, 32), 2) % 64
        (fold(md5hex("w" + b), 4) % 1001) - 500
      }.sum
      (id, src, toks.length.toLong, score)
    }.filter(_._4 > 0)
      .map(t => (t._1, t._2, t._3, t._4, t._4 * 1000 / t._3))
      .sortBy(t => (-t._5, t._1))
    var cum = 0L
    val kept = perDoc.takeWhile { t => cum += t._3; cum <= 5000 }
    val local = kept.groupBy(_._2).map { case (src, g) =>
      src -> (g.length.toLong, g.map(_._3).sum, g.map(_._4).sum)
    }
    val got = operators.Text.textBudget(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == local)
  }

  test("surprise: bigram surprisal bands equal a local replay") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bigrams = docs.flatMap { case (id, src, text) =>
      val t = text.split(" ", -1)
      if (t.length < 2) Nil
      else t.sliding(2).map(p => (id, src, p.mkString(" "))).toSeq
    }
    val freq = bigrams.groupBy(_._3).map { case (g, v) => g -> v.length }
    def band(f: Int): Long = (63 - java.lang.Long.numberOfLeadingZeros(f))
      .toLong.min(21L)
    val mxb = freq.values.map(band).max
    val local = bigrams.map { case (id, src, g) => (id, src, mxb - band(freq(g))) }
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((_, src), v) =>
        (src, v.map(_._3).sum * 1000 / v.length) }
      .groupBy(_._1)
      .map { case (src, g) =>
        src -> (g.size.toLong, g.map(_._2).sum, g.map(_._2).min, g.map(_._2).max) }
    val got = operators.Text.textSurprise(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == local)
  }

  test("balanced sample: every class capped at the min class size, selection replayed") {
    val rows = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val byLabel = rows.groupBy(_._2)
    val cap = byLabel.values.map(_.length).min
    val local = byLabel.map { case (l, g) =>
      val kept = g.map(_._1)
        .sortBy(id => (md5hex("b" + id), id)).take(cap)
      l -> (g.length.toLong, kept.length.toLong, kept.min, kept.sum)
    }
    val got = operators.Relational.sampleBalanced(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == local)
    assert(got.values.map(_._2).toSet.size == 1, "classes not equal-sized")
  }

  test("geo dbscan: clusters equal a local grid union-find replay") {
    val keys = Tables.customer(spark, sf0001)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val cellOf = keys.map { k =>
      val lat = (k % 180 - 90).toDouble + 0.5
      val lon = ((k * 7) % 360 - 180).toDouble + 0.5
      (math.floor(lat / 5.0).toLong, math.floor(lon / 5.0).toLong)
    }
    val counts = cellOf.groupBy(identity).map { case (c, g) => c -> g.length }
    val core = counts.filter(_._2 >= 3).keys.toSeq
    def id(c: (Long, Long)): Long = (c._1 + 18) * 72 + (c._2 + 36)
    // union-find over 8-neighborhood adjacency
    val parent = scala.collection.mutable.Map(core.map(c => id(c) -> id(c)): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- core; b <- core
         if id(a) < id(b) &&
           math.abs(a._1 - b._1) <= 1 && math.abs(a._2 - b._2) <= 1) {
      val (ra, rb) = (find(id(a)), find(id(b)))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val local = core.groupBy(c => find(id(c))).map { case (root, cells) =>
      // engine labels by MIN member id, which equals the UF min root
      root -> (cells.length.toLong, cells.map(counts(_).toLong).sum)
    }
    val got = operators.Geo.geoDbscan(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == local)
  }

  test("snapdiff: CDC classes equal the modular-arithmetic replay") {
    val keys = Tables.orders(spark, sf0001)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val nDel = keys.count(_ % 97 == 0).toLong
    val nIns = keys.count(_ % 101 == 0).toLong
    val nUpd = keys.count(k => k % 97 != 0 && k % 89 == 0).toLong
    val nSame = keys.length - nDel - nUpd
    val got = operators.Analytics.dqSnapdiff(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("delete" -> nDel, "insert" -> nIns,
      "update" -> nUpd, "unchanged" -> nSame))
  }

  test("layout runs: sorted-by-key runs equal the key's distinct count") {
    val r = operators.Analytics.layoutRuns(spark, sf0001).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    val li = Tables.lineitem(spark, sf0001)
    // contiguous sort on the measured column ⇒ runs = distinct values
    assert(r(("partkey", "l_partkey")) ==
      li.select(col("l_partkey")).distinct().count())
    // any order covers every row: runs are within [distinct, n]
    val n = li.count()
    r.foreach { case ((_, _), v) => assert(v >= 1 && v <= n) }
    // the advisor must show the collapse: partkey-sorted partkey runs
    // far below the unsorted-key orders
    assert(r(("partkey", "l_partkey")) * 5 < r(("orderkey", "l_partkey")))
  }

  test("text clf: scores equal a local hashed-linear replay") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val local = docs.map { case (_, src, text) =>
      val score = text.split(" ", -1).map { tok =>
        val b = fold(md5hex(tok).substring(30, 32), 2) % 64
        (fold(md5hex("w" + b), 4) % 1001) - 500
      }.sum
      (src, score)
    }.groupBy(_._1).map { case (src, g) =>
      src -> (g.length.toLong, g.count(_._2 > 0).toLong, g.map(_._2).sum)
    }
    val got = operators.Text.textClf(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == local)
  }
}
