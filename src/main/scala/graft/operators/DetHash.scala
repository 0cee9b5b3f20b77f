package graft.operators

/** Deterministic cross-engine hashing primitives.
  *
  * The md5 hex string of a value is bit-identical in Spark and DuckDB, so
  * an integer folded from its first k hex digits is a hash BOTH engines
  * compute exactly — the primitive that lets sketch-shaped operators
  * (Bloom membership, MinHash signatures) be fully ORACLED rather than
  * declared no-oracle. xxhash64 is better-mixed and ~10× cheaper but has
  * no DuckDB twin; where the correctness gate matters more than hash
  * quality, md5 buys the oracle. Callers must materialize `md5(e)` into a
  * named column once and fold THAT column — inlining the md5 call into
  * every digit term would lean on codegen CSE to dedup 8 digests per
  * value (Spark subexpression elimination usually saves it, but the
  * interpreted and DuckDB paths should not depend on it).
  */
object DetHash {

  private def fold(term: Int => String, digits: Int): String = {
    require(digits >= 1 && digits <= 15, s"digits must fit a long: $digits")
    (1 to digits).map { i =>
      val shift = 4 * (digits - i)
      if (shift == 0) s"CAST(${term(i)} AS BIGINT)"
      else s"(CAST(${term(i)} AS BIGINT) * ${1L << shift})"
    }.mkString("(", " + ", ")")
  }

  /** Spark SQL: integer in [0, 16^digits) folded from the first `digits`
    * hex chars of an ALREADY-COMPUTED md5-hex column/expression `hexCol`. */
  def sparkHexInt(hexCol: String, digits: Int = 8): String =
    fold(i => s"(instr('0123456789abcdef', substring($hexCol, $i, 1)) - 1)",
      digits)

  /** DuckDB twin of [[sparkHexInt]] — same fold, same result. */
  def duckHexInt(hexCol: String, digits: Int = 8): String =
    fold(i => s"(strpos('0123456789abcdef', substr($hexCol, $i, 1)) - 1)",
      digits)
}
