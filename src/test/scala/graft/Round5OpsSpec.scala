package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-5 operators, each asserting the rule the
  * sf-oracle hash can't isolate: streak/island algebra vs a local replay,
  * the integer z²-test vs local moments, histogram tiling, bitmap-distinct
  * vs count(DISTINCT), and CDC chunking's edit-locality property (the
  * reason content-defined beats fixed-window chunking for dedup).
  */
class Round5OpsSpec extends SparkSpec {

  test("streaks: engine islands equal a local consecutive-run replay") {
    val got = operators.Events.evtStreaks(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val days = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.keySet == days.keySet)
    for ((u, ds) <- days) {
      // Local replay: split the sorted day list into consecutive runs.
      val runs = ds.foldLeft(List.empty[List[Long]]) {
        case (acc @ (h :: t), d) if h.head == d - 1 => (d :: h) :: t
        case (acc, d) => List(d) :: acc
      }.map(r => (r.length.toLong, r.min))
      val best = runs.minBy { case (len, start) => (-len, start) }
      assert(got(u) == ((ds.length.toLong, runs.length.toLong, best._1, best._2)),
        s"user $u: engine ${got(u)}, replay (${ds.length},${runs.length},$best)")
    }
  }

  test("anomaly: integer z^2 flag equals a local float z-score at k=2") {
    val rows = operators.Events.evtAnomaly(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1)
    for ((t, rs) <- byType) {
      val n = rs.length.toDouble
      val mu = rs.map(_._3).sum / n
      val varP = rs.map(c => (c._3 - mu) * (c._3 - mu)).sum / n
      for ((_, day, cnt, flag) <- rs) {
        val z2 = (cnt - mu) * (cnt - mu)
        // Strict inequality on both sides; integer rescaling is exact, so
        // the flags must agree everywhere (no boundary ulp to forgive).
        assert((z2 > 4 * varP) == (flag == 1),
          s"type $t day $day cnt $cnt: float z2=$z2 var=$varP flag=$flag")
      }
    }
  }

  test("histogram: bins tile the cents domain and account for every order") {
    val rows = operators.Aggs.aggHistogram(spark, sf0001).collect()
    val total = Tables.orders(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total)
    for (r <- rows) {
      val (bin, lo, hi, binLo) = (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(binLo == bin * 500000)
      assert(lo >= binLo && hi < binLo + 500000,
        s"bin $bin: min=$lo max=$hi outside [$binLo, ${binLo + 500000})")
    }
  }

  test("bitmap distinct-count equals count(DISTINCT) per customer") {
    val dist = operators.Analytics.aggBitmap(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val direct = Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderpriority")).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    assert(dist == direct, s"bitmap $dist vs countDistinct $direct")
  }

  test("cdc chunks tile each doc contiguously from position 0") {
    val perDoc = operators.Text.textCdc(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val nToks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for ((doc, chunks) <- perDoc) {
      val sorted = chunks.sortBy(_._2)
      assert(sorted.head._2 == 0 && sorted.head._4 == 0)
      // start_pos of chunk k+1 = start_pos + n_toks of chunk k: no gaps,
      // no overlaps, and the last chunk ends exactly at the token count.
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray) if sorted.length > 1)
        assert(b._4 == a._4 + a._3, s"doc $doc: chunk ${b._2} not contiguous")
      assert(sorted.last._4 + sorted.last._3 == nToks(doc))
    }
  }

  test("cdc edit-locality: inserting one token re-chunks only its neighborhood") {
    import spark.implicits._
    val toks = (0 until 400).map(i => s"w${(i * 2654435761L) % 97}")
    val editPos = 200
    val edited = (toks.take(editPos) :+ "INSERTED") ++ toks.drop(editPos)
    val docs = Seq((0L, toks.mkString(" ")), (1L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val starts = operators.Text.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // Boundary at position p depends on tokens p-2..p only. So strictly
    // before the edit nothing moves, and ≥3 tokens past it the boundary
    // set re-synchronizes, shifted by the insertion. Fixed-window
    // chunking (q_text_chunk) shifts EVERY downstream boundary instead.
    val before = (s: Set[Long]) => s.filter(_ < editPos)
    assert(before(starts(0L)) == before(starts(1L)),
      "boundaries before the edit moved")
    val afterOld = starts(0L).filter(_ >= editPos + 2).map(_ + 1)
    val afterNew = starts(1L).filter(_ >= editPos + 3)
    assert(afterNew == afterOld,
      s"post-edit boundaries did not re-synchronize: $afterNew vs $afterOld")
  }
}
