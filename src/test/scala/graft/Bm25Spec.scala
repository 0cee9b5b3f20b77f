package graft

import org.apache.spark.sql.functions._
import IntLg.lg

/** Semantic pins for q_text_bm25: a from-scratch local replay of the
  * whole ranking — postings, Robertson integer idf, ppm length
  * normalization, per-term top-5 — plus the BM25 axioms the formula
  * must satisfy (idf anti-monotone in df, score monotone in tf at
  * fixed length).
  */
class Bm25Spec extends SparkSpec {

  private def replay(): Seq[(String, Long, Long, Long, Long)] = {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val tf = docs.flatMap { case (id, tk) =>
      tk.groupBy(identity).map { case (t, os) => (id, t, os.length.toLong) }
    }
    val dl = docs.map { case (id, tk) => (id, tk.length.toLong) }.toMap
    val nDocs = docs.length.toLong
    val ndl = dl.values.sum
    val avgdlMicro = ndl * 1000000L / nDocs
    val dfm = docs.flatMap { case (_, tk) => tk.distinct }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val qry = dfm.toSeq.sortBy { case (t, df) => (df, t) }.take(10)
      .map { case (t, df) =>
        (t, lg(2 * nDocs - 2 * df + 1) - lg(2 * df + 1))
      }.toMap
    val scored = tf.filter { case (_, t, _) => qry.contains(t) }
      .map { case (id, t, f) =>
        val nlenPpm = dl(id) * 1000000000000L / avgdlMicro
        (t, id, f,
          qry(t) * 44000000L * f / (20000000L * f + 6000000L + 18L * nlenPpm))
      }
    scored.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy { case (_, id, _, s) => (-s, id) }.take(5).zipWithIndex
        .map { case ((t, id, f, s), i) => (t, id, f, s, i + 1L) }
    }.sortBy(r => (r._1, r._5)).toSeq
  }

  test("bm25: ranking equals a local replay") {
    val got = operators.Text.textBm25(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == replay())
  }

  test("bm25: axioms hold — idf anti-monotone in df, tf saturating, scores positive") {
    // idf: df1 < df2 must give idf1 > idf2 (same N)
    val n = 1000L
    def idf(df: Long) = lg(2 * n - 2 * df + 1) - lg(2 * df + 1)
    assert(Seq(1L, 5L, 50L, 500L).map(idf) == Seq(1L, 5L, 50L, 500L).map(idf).sorted.reverse)
    // tf: at fixed idf and dl, more occurrences never score lower, and
    // the marginal gain shrinks (saturation)
    def sc(tf: Long, nlenPpm: Long = 1000000L) =
      idf(5) * 44000000L * tf / (20000000L * tf + 6000000L + 18L * nlenPpm)
    val scores = (1L to 6L).map(sc(_))
    assert(scores == scores.sorted, s"tf monotonicity broke: $scores")
    val gains = scores.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(gains == gains.sorted.reverse, s"tf saturation broke: $gains")
    assert(scores.head > 0)
    // dl: longer-than-average docs are penalized at equal tf
    assert(sc(3, 2000000L) < sc(3, 500000L))
  }
}
