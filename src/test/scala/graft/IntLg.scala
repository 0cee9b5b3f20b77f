package graft

/** Test-side replica of Text.withLgMicro's integer micro-nat log —
  * shared by the DSIR / LM-perplexity / BM25 replays. */
object IntLg {
  private val lnTbl: Map[Long, Long] =
    (1 to 128).map(k => (k.toLong, math.round(math.log(k.toDouble) * 1e6))).toMap

  def lg(n: Long): Long = {
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(n)
    val e = math.max(0, bitlen - 7)
    lnTbl(n >> e) + e.toLong * 693147L
  }
}
