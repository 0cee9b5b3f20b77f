package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-9 operators — invariants the sf-oracle
  * hash can't isolate: the new/returning split against a local
  * first-seen-day replay, prefix blocking against a local slice-and-
  * group replay.
  */
class Round9OpsSpec extends SparkSpec {

  test("evt newret: split equals a local first-seen-day replay") {
    val act = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val first = act.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).min }
    val local = act.groupBy(_._2).map { case (day, g) =>
      val nNew = g.count { case (u, d) => first(u) == d }.toLong
      day -> (g.length.toLong, nNew, (g.length - nNew) * 1000L / g.length)
    }
    val rows = operators.Events.evtNewReturning(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    // ordered by day ascending, one row per active day
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    assert(rows.toMap == local)
    // day-1 sanity: every user active on the corpus' first day is new there
    val d0 = act.map(_._2).min
    val byDay = rows.toMap
    assert(byDay(d0)._1 == byDay(d0)._2)
  }

  test("text prefix block: blocks equal a local slice-and-group replay") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
      .filter(_._2.length >= 6)
    val local = docs.groupBy(_._2.take(6).mkString(" "))
      .collect { case (pfx, g) if g.length >= 2 =>
        pfx -> (g.length.toLong, g.map(_._1).min) }
    val rows = operators.Text.textPrefixBlock(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    assert(rows.toMap == local)
    // every block is a genuine candidate set: >= 2 members, survivor is a member
    rows.foreach { case (_, (n, _)) => assert(n >= 2L) }
  }
}
