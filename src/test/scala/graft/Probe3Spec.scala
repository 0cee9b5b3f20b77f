package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-12 multi-probe extension (q_sim_ivf_probe3):
  * probe-k searches a SUPERSET of probe-(k-1)'s candidate lists, so its
  * top-5 must dominate pointwise — same invariant Round8OpsSpec pins for
  * probe-2 over probe-1, pushed one notch up the lever.
  */
class Probe3Spec extends SparkSpec {

  private def top5(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(3)) -> r.getDouble(2)).toMap

  test("ivf probe-3 dominates probe-2 pointwise (superset candidates)") {
    val p2 = top5(operators.Sim.simIvfProbe2(spark, sf0001))
    val p3 = top5(operators.Sim.simIvfProbe3(spark, sf0001))
    assert(p2.nonEmpty && p3.nonEmpty)
    p2.foreach { case (key, cos2) =>
      assert(p3.contains(key))
      assert(p3(key) >= cos2 - 1e-9, s"rank ${key._2} of query ${key._1} regressed")
    }
  }

  test("km-refined index: audit equals a from-scratch local Lloyd replay") {
    // replay the whole refined index locally: quantize → cosine
    // seed-assign → integer component sums → cosine refined-assign
    val vecs = Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val qv = vecs.map { case (id, e) =>
      id -> e.map(x => math.max(-128L, math.min(127L,
        math.floor(x.toDouble * 64.0 + 0.5).toLong)))
    }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cosTo(v: Array[Long], c: Array[Long]): Double =
      dot(v, c).toDouble / (math.sqrt(dot(v, v).toDouble) * math.sqrt(dot(c, c).toDouble))
    val seeds = qv.filter(_._1 < 8)
    def assign(cents: Seq[(Long, Array[Long])]): Map[Long, Long] =
      qv.map { case (id, v) =>
        id -> cents.map { case (cid, c) => (cid, cosTo(v, c)) }
          .maxBy { case (cid, s) => (s, -cid) }._1
      }.toMap
    val a0 = assign(seeds.toSeq)
    val cents = a0.groupBy(_._2).map { case (cid, g) =>
      val members = g.keys.toSeq.map(id => qv.find(_._1 == id).get._2)
      cid -> members.transpose.map(_.sum).toArray
    }.toSeq.sortBy(_._1)
    val a1 = assign(cents)
    val expect = a1.groupBy(_._2).map { case (cid, g) =>
      cid -> (g.size.toLong, g.keys.count(id => a0(id) != cid).toLong)
    }
    val got = operators.Sim.simIvfKmeans(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect, s"got $got expect $expect")
  }

  test("probe fan-out multiplies only the query side: 3 distinct lists per query") {
    // the property itself (ADVICE r12): assert directly on the probe
    // assignment — each of the 10 query vectors is assigned exactly 3
    // DISTINCT probe lists with dense probe ranks 1..3, so the fan-out
    // multiplies only the broadcast query side, never the corpus
    val asg = operators.Sim.ivfAssignK(spark, sf0001, 3)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("list_id"), col("probe_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(asg.map(_._1).distinct.length == 10)
    asg.groupBy(_._1).foreach { case (q, g) =>
      assert(g.map(_._2).distinct.length == 3,
        s"query $q probes ${g.map(_._2).distinct.length} distinct lists, want 3")
      assert(g.map(_._3).sorted.sameElements(1 to 3),
        s"query $q probe ranks not dense: ${g.map(_._3).sorted.mkString(",")}")
    }
    // downstream: <= 5 results per query, ranks 1..n dense
    val rows = operators.Sim.simIvfProbe3(spark, sf0001).collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, g) =>
      val rns = g.map(_.getLong(3)).sorted
      assert(rns.length <= 5 && rns.sameElements(1L to rns.length),
        s"query $q ranks not dense: ${rns.mkString(",")}")
    }
  }
}
