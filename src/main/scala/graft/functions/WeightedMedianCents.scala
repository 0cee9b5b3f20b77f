package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

import scala.collection.mutable.LongMap

/** The OBJECT-buffer native aggregate tier (TypedImperativeAggregate —
  * the fourth and last aggregate surface after UDF-adjacent `Aggregator`,
  * expression-tree `DeclarativeAggregate`, and built-ins): exact weighted
  * median over integer cents with a value→weight histogram as aggregation
  * state. Update/merge mutate a JVM `LongMap` directly (no encoder
  * boxing, no fixed-width buffer row); partial state crosses the shuffle
  * as the serialized histogram, so map-side combine collapses every
  * duplicate value before any exchange.
  *
  * State is bounded by DISTINCT values per group, not rows — the right
  * tradeoff for quantized domains (cents, basis points, day indices)
  * where dup-heavy groups compress by orders of magnitude. For unbounded
  * real-valued domains the window-rank form (q_agg_wmedian) or an
  * approx sketch is the scale path instead; this tier exists for the
  * histogram-compressible case, which pretraining metadata (lengths,
  * scores, counts) overwhelmingly is.
  *
  * Median rule: smallest value v with 2·cum_weight(≤v) ≥ total_weight —
  * identical to the oracle's window crossing point (row-level and
  * value-level crossings provably pick the same v). Empty/zero-weight
  * state evaluates to NULL. */
case class WeightedMedianCents(
    value: Expression, weight: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongMap[Long]] {

  override def children: Seq[Expression] = Seq(value, weight)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == LongType && weight.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "wmedian_cents expects (BIGINT, BIGINT), got " +
        s"(${value.dataType.simpleString}, ${weight.dataType.simpleString})")

  override def createAggregationBuffer(): LongMap[Long] = LongMap.empty[Long]

  override def update(b: LongMap[Long], input: InternalRow): LongMap[Long] = {
    val v = value.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val k = v.asInstanceOf[Long]
      b.update(k, b.getOrElse(k, 0L) + w.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: LongMap[Long], o: LongMap[Long]): LongMap[Long] = {
    o.foreach { case (k, w) => b.update(k, b.getOrElse(k, 0L) + w) }
    b
  }

  override def eval(b: LongMap[Long]): Any = {
    val total = b.values.sum
    if (total <= 0L) null
    else {
      val entries = b.toArray.sortBy(_._1)
      var cum = 0L
      var i = 0
      var res: Any = null
      while (i < entries.length && res == null) {
        cum += entries(i)._2
        // 2·cum ≥ total, written overflow-safe: doubling cum wraps negative
        // once cumulative weight passes Long.MaxValue/2 and would silently
        // skip the true median. cum ≥ ⌈total/2⌉ is the same predicate for
        // non-negative weights and never overflows.
        if (cum >= total / 2 + total % 2) res = entries(i)._1
        i += 1
      }
      res
    }
  }

  override def serialize(b: LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.size * 16)
    bb.putInt(b.size)
    b.foreach { case (k, w) => bb.putLong(k); bb.putLong(w) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = LongMap.empty[Long]
    var i = 0
    while (i < n) { b.update(bb.getLong, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedMedianCents =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WeightedMedianCents =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), weight = newChildren(1))
}
