package graft

import org.apache.spark.util.AccumulatorV2
import org.apache.spark.sql.functions._

/** Data-quality side-channel via a custom AccumulatorV2: per-category
  * counters merged across tasks — the observability surface a 100 TB
  * pipeline uses to count malformed/suspect rows WITHOUT a second pass or
  * a filter-and-count job per rule (the counters ride the pass that was
  * already running). Merge is commutative/associative map-union, so task
  * retries and partition order can't corrupt totals beyond at-least-once
  * semantics — which is why these gate alerts, not billing. */
class MapAccumulator extends AccumulatorV2[(String, Long), Map[String, Long]] {
  private val m = scala.collection.mutable.Map[String, Long]()
  def isZero: Boolean = m.isEmpty
  def copy(): MapAccumulator = {
    val c = new MapAccumulator
    m.foreach { case (k, v) => c.m(k) = v }
    c
  }
  def reset(): Unit = m.clear()
  def add(kv: (String, Long)): Unit = m(kv._1) = m.getOrElse(kv._1, 0L) + kv._2
  def merge(other: AccumulatorV2[(String, Long), Map[String, Long]]): Unit =
    other.value.foreach { case (k, v) => m(k) = m.getOrElse(k, 0L) + v }
  def value: Map[String, Long] = m.toMap
}

class AccumulatorSpec extends SparkSpec {

  test("custom map accumulator counts quality rules in one distributed pass") {
    val acc = new MapAccumulator
    spark.sparkContext.register(acc, "quality_counters")
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("n_chars"))
    // One pass; the counters accumulate as a side effect of the scan.
    val n = docs.rdd.map { r =>
      val text = r.getString(1)
      if (text.length != r.getLong(2)) acc.add("len_mismatch" -> 1L)
      if (text.split(" ", -1).length < 5) acc.add("too_short" -> 1L)
      if (text.contains("  ")) acc.add("double_space" -> 1L)
      1L
    }.reduce(_ + _)
    assert(n == 500)
    // Replay locally: the distributed counters must equal a driver-side count.
    val local = docs.collect()
    val lenMismatch = local.count(r => r.getString(1).length != r.getLong(2)).toLong
    val tooShort = local.count(_.getString(1).split(" ", -1).length < 5).toLong
    assert(acc.value.getOrElse("len_mismatch", 0L) == lenMismatch)
    assert(acc.value.getOrElse("too_short", 0L) == tooShort)
    // n_chars == length(text) holds on this corpus (FIXTURES.md), so the
    // rule must have fired zero times — the accumulator proves a clean
    // pass, not just a countable one.
    assert(lenMismatch == 0L)
  }
}
