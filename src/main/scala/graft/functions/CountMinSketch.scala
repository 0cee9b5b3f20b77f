package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Count-min sketch as a typed `Aggregator` (SURVEY.md §2.12): the
  * mergeable heavy-hitter/frequency summary that answers "how often did
  * key x occur" from a fixed-size matrix instead of a key-count table.
  *
  * DEPTH×WIDTH counters; row r hashes x with an odd multiplier (Java
  * long arithmetic wraps mod 2^64, which is part of the hash — this is
  * why the sketch is no-oracle: DuckDB BIGINT overflow throws instead of
  * wrapping). Point estimate = min over rows of the hit cell, which can
  * only OVER-estimate a true count (collisions add, never subtract) —
  * CountMinSpec pins that one-sided error plus exact merge associativity.
  *
  * Like every Aggregator it plans as partial+final: each partition folds
  * rows into its local matrix and only DEPTH·WIDTH longs cross the
  * shuffle, so a billion-row frequency profile ships as 8 KiB per task.
  */
object CountMinSketch extends Aggregator[Long, Array[Long], Array[Long]] {
  val Depth = 4
  val Width = 256

  /** Odd multiplicative constants (splitmix64/Knuth-style); the >>> 33
    * keeps the high bits, which is where multiply mixing concentrates. */
  private val MulA = Array(0x9e3779b97f4a7c15L, 0xbf58476d1ce4e5b9L,
    0x94d049bb133111ebL, 0xff51afd7ed558ccdL)

  def slot(r: Int, x: Long): Int = {
    val h = (x * MulA(r)) >>> 33
    (h % Width).toInt
  }

  override def zero: Array[Long] = new Array[Long](Depth * Width)

  override def reduce(b: Array[Long], x: Long): Array[Long] = {
    var r = 0
    while (r < Depth) { b(r * Width + slot(r, x)) += 1L; r += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  /** Point query against a finished sketch. */
  def estimate(sketch: Array[Long], x: Long): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val c = sketch(r * Width + slot(r, x))
      if (c < best) best = c
      r += 1
    }
    best
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
