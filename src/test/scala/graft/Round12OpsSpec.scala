package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-12 operators: local replays plus the
  * partition-pruning plan property q_src_partitioned exists to declare.
  */
class Round12OpsSpec extends SparkSpec {

  test("mm dedup: quantized-feature families equal a local replay; savings real") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val fams = docs.map { case (id, t) =>
      val key = s"${t.length / 32}:${t.count(_ == 'a') / 4}:" +
        s"${t.count(_ == 'e') / 4}:${t.count(_ == 't') / 4}"
      (key, id, t.length.toLong)
    }.groupBy(_._1).values.map { g =>
      val bytes = g.map(_._3).sum
      val keep = g.minBy(_._2)._3
      (g.length.toLong, bytes, bytes - keep)
    }
    val local = fams.groupBy(_._1).map { case (n, g) =>
      n -> (g.size.toLong, g.map(_._2).sum, g.map(_._3).sum) }
    val rows = multimodal.Multimodal.mmDedup(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toMap == local)
    // families beyond singletons exist and deduplication saves real bytes
    assert(local.keys.max > 1L && local.filter(_._1 > 1).values.map(_._3).sum > 0L)
  }

  test("src partitioned: pruned read equals a local replay; plan prunes partitions") {
    val local = Tables.orders(spark, sf0001)
      .select(col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .filter(_.getString(0) == "F")
      .groupBy(_.getString(1))
      .map { case (p, g) =>
        p -> (g.length.toLong, g.map(r => math.round(r.getDouble(2) * 100)).sum)
      }
    val df = operators.Relational.srcPartitioned(spark, sf0001)
    val rows = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(rows.toMap == local)
    // the status predicate must prune at planning time, not post-scan:
    // the scan's partition filters carry the predicate
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("\\s", "").contains("o_orderstatus"),
      s"expected partition pruning in plan:\n$scan")
  }

  test("evt hourhhi: concentration bands equal a local replay") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), hour(col("ts")).as("h")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val hhi = ev.groupBy(_._1).map { case (u, g) =>
      val cs = g.groupBy(_._2).values.map(_.length.toLong)
      val n = cs.sum
      u -> cs.map(c => c * c).sum * 1000000L / (n * n)
    }
    val local = hhi.values.groupBy(_ / 10000).map { case (b, g) =>
      b -> (g.size.toLong, g.min, g.max, g.sum / g.size) }
    val rows = operators.Events.evtHourHhi(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toMap == local)
    assert(rows.length > 1)
  }

  test("agg groupingid: rollup masks equal a local replay") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2).toLong))
    val detail = li.groupBy(r => (r._1, r._2)).map { case ((f, l), g) =>
      (Option(f), Option(l), 0L, g.length.toLong, g.map(_._3).sum) }.toSeq
    val byFlag = li.groupBy(_._1).map { case (f, g) =>
      (Option(f), None: Option[String], 1L, g.length.toLong, g.map(_._3).sum) }.toSeq
    val total = Seq((None: Option[String], None: Option[String], 3L,
      li.length.toLong, li.map(_._3).sum))
    val local = (detail ++ byFlag ++ total)
      .sortBy { case (f, l, gid, _, _) => (gid, f.getOrElse("~"), l.getOrElse("~")) }
    val rows = operators.Aggs.aggGroupingId(spark, sf0001).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == local)
  }
}
