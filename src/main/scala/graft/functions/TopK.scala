package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded-state top-k typed Aggregator — the distributed primitive
  * behind "top N per group" at scale: each partition folds its rows into
  * a k-element buffer, and only that bounded buffer crosses the shuffle
  * (map-side combine for top-k), vs the window-rank formulation that
  * shuffles EVERY row of every group before discarding all but k. The
  * window form stays the right default when k rows per group is what you
  * already have; this wins when groups are huge and k is small.
  *
  * Order is total and explicit — (value desc, id asc) — so merges are
  * associative/commutative and the result is deterministic under any
  * partitioning (the oracle gate proves it: a window-rank SQL must
  * hash-match this aggregation exactly).
  *
  * Buffer is a sorted Vector capped at k: insertion cost O(k) per row
  * with k constant — the same contract as the rolling-frame family.
  */
class TopK(k: Int) extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private def worse(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(b: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    if (b.length == k && worse(in, b.last)) b
    else ((b :+ in).sortBy(t => (-t._1, t._2))).take(k)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sortBy(t => (-t._1, t._2)).take(k)

  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder()
}
