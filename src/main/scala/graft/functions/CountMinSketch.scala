package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Count-min sketch as a typed `Aggregator` (SURVEY.md §2.12): the
  * mergeable heavy-hitter/frequency summary that answers "how often did
  * key x occur" from a fixed-size matrix instead of a key-count table.
  *
  * DEPTH×WIDTH counters; row r hashes x with the textbook Carter–Wegman
  * pairwise-independent family h_r(x) = ((a_r·x + b_r) mod p) mod WIDTH,
  * p = 2³¹−1. Operands stay under 2⁶² so the arithmetic never wraps —
  * deliberately: the identical expression evaluates bit-equal in engines
  * with CHECKED overflow (DuckDB), which is what lets q_approx_cms carry
  * a full value oracle (the oracle SQL replays bucket counts and the
  * row-min estimate; constants are mirrored there verbatim). Point
  * estimate = min over rows of the hit cell, which can only OVER-estimate
  * a true count (collisions add, never subtract) — CountMinSpec pins that
  * one-sided error plus exact merge associativity.
  *
  * Like every Aggregator it plans as partial+final: each partition folds
  * rows into its local matrix and only DEPTH·WIDTH longs cross the
  * shuffle, so a billion-row frequency profile ships as 8 KiB per task.
  */
object CountMinSketch extends Aggregator[Long, Array[Long], Array[Long]] {
  val Depth = 4
  val Width = 256
  /** Mersenne prime 2³¹−1; with a,b < p and x folded into [0,p), every
    * intermediate stays < 2⁶² — no wrap in Java, no overflow error in
    * checked-arithmetic engines. */
  val P = 2147483647L
  val HashA = Array(1103515245L, 1588635695L, 1999999973L, 1223106847L)
  val HashB = Array(12345L, 1013904223L, 370248451L, 998244353L)

  def slot(r: Int, x: Long): Int = {
    val xm = java.lang.Math.floorMod(x, P)
    (((HashA(r) * xm + HashB(r)) % P) % Width).toInt
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
