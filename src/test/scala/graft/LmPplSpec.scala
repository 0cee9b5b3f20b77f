package graft

import org.apache.spark.sql.functions._
import IntLg.lg

/** Semantic pins for q_text_lm_ppl (stupid-backoff bigram LM scoring):
  * a from-scratch local replay — parity split, count tables, integer
  * micro-nat log-probs, backoff — plus a liveness pin proving the
  * backoff path actually fires (a same-corpus LM would never exercise
  * it, which is exactly the kind of dead path a replayed oracle cannot
  * see).
  */
class LmPplSpec extends SparkSpec {

  private def corpus(): Array[(Long, Array[String])] =
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))

  test("lm_ppl: stupid-backoff scores equal a local replay") {
    val docs = corpus()
    val train = docs.filter(_._1 % 2 == 0)
    val uni = train.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bi = train.flatMap { case (_, tk) => tk.toSeq.sliding(2).filter(_.length == 2) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val base = lg(uni.values.sum + uni.size) + 916291L
    val expected = docs.filter(_._1 % 2 == 1).filter(_._2.length >= 2)
      .map { case (id, tk) =>
        val scs = tk.toSeq.sliding(2).filter(_.length == 2).map { p =>
          bi.get(p) match {
            case Some(c12) => lg(c12) - lg(uni(p.head))
            case None => lg(uni.getOrElse(p.last, 0L) + 1) - base
          }
        }.toSeq
        (id, scs.length.toLong, -scs.sum, -scs.sum / scs.length)
      }.sortBy(_._1).toSeq
    val got = operators.Text.textLmPpl(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("lm_ppl: the backoff path is alive at fixture scale") {
    val docs = corpus()
    val train = docs.filter(_._1 % 2 == 0)
    val bi = train.flatMap { case (_, tk) =>
      tk.toSeq.sliding(2).filter(_.length == 2) }.toSet
    val scoredBigrams = docs.filter(_._1 % 2 == 1)
      .flatMap { case (_, tk) => tk.toSeq.sliding(2).filter(_.length == 2) }
    val nBackoff = scoredBigrams.count(p => !bi.contains(p))
    assert(nBackoff > 0, "no scored bigram was unseen in training — " +
      "the backoff branch is dead at fixture scale")
    assert(nBackoff < scoredBigrams.length,
      "every bigram backed off — the trained table never matched")
  }

  test("lm_ppl: plan has no cartesian beyond the 1-row totals fold") {
    val p = SparkEntry.queries("q_text_lm_ppl")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in lm_ppl:\n$p")
  }
}
