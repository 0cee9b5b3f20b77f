package graft

import org.apache.spark.sql.functions._
import IntLg.lg

/** Semantic pins for q_text_dsir (the DSIR importance-resampling
  * selector): a from-scratch local replay of the whole pipeline —
  * unigram+bigram hashed features, two corpus histograms, integer
  * micro-nat log-ratio scores, per-language quarter cut — plus the
  * accuracy bound the integer lg claims and a non-degeneracy pin on the
  * scores themselves (a replayed oracle alone can't catch a
  * statistically dead weight model).
  */
class DsirSpec extends SparkSpec {

  private val B = 64L

  private def bucket(f: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(f.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(4), 16) % B
  }

  private def replay(): Seq[(Long, String, Long, Long, Long)] = {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map { r =>
        val tk = r.getString(2).split(" ")
        val feats = (tk.toSeq ++ tk.toSeq.sliding(2).filter(_.length == 2)
          .map(_.mkString(" "))).map(bucket)
        (r.getLong(0), r.getString(1), feats)
      }
    val tgtCnt = docs.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pool = docs.filter(_._2 != "en")
    val rawCnt = pool.flatMap(_._3)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val base = lg(tgtCnt.values.sum + B) - lg(rawCnt.values.sum + B)
    val scored = pool.map { case (id, lang, feats) =>
      val s1 = feats.map(b =>
        lg(tgtCnt.getOrElse(b, 0L) + 1) - lg(rawCnt(b) + 1)).sum
      (id, lang, feats.length.toLong, s1 - feats.length * base)
    }
    scored.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val ranked = rows.sortBy { case (id, _, _, s) => (-s, id) }
      val nKeep = (rows.length + 3) / 4
      ranked.zipWithIndex.map { case ((id, lang, nf, s), i) =>
        (id, lang, nf, s, if (i < nKeep) 1L else 0L)
      }
    }.sortBy(_._1).toSeq
  }

  test("dsir: hashed-ngram importance scores equal a local replay") {
    val got = operators.Text.textDsir(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == replay())
  }

  test("dsir: the integer lg stays within its claimed 1.5% nat bound") {
    // Spot the decomposition across magnitudes, including the exact-table
    // range and both sides of each power-of-two seam.
    for (n <- Seq(1L, 2L, 127L, 128L, 129L, 255L, 256L, 1000L, 65535L,
        1000000L, (1L << 40) + 12345L)) {
      val exact = math.log(n.toDouble) * 1e6
      assert(math.abs(lg(n) - exact) <= 15200.0,
        s"lg($n) = ${lg(n)}, exact $exact")
    }
  }

  test("dsir: the weight model discriminates and the cut is a quarter per lang") {
    val rows = operators.Text.textDsir(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._2).distinct.length > 10,
      "scores degenerate: the bucket histograms carry no signal")
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(lang != "en", s"target stratum leaked into the pool: $lang")
      val nSel = rs.count(_._3 == 1L)
      assert(nSel == (rs.length + 3) / 4,
        s"$lang: $nSel of ${rs.length} selected")
    }
  }

  test("dsir: plan broadcasts the B-row histograms, no cartesian beyond the 1-row totals") {
    val p = SparkEntry.queries("q_text_dsir")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in dsir:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the stats/ln joins must all broadcast:\n$p")
  }
}
