package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scale-path deduplication + LSH machinery (driver-ordered extensions):
  * n-gram/token Jaccard (blocked), MinHash+LSH band bucketing, SimHash,
  * and random-hyperplane LSH bucketing for ANN.
  *
  * Scale design: the all-pairs comparisons are always *blocked* — by
  * (lang, source) for Jaccard, by LSH band bucket for MinHash, by
  * hyperplane bucket for ANN — so candidate-pair counts stay near-linear
  * in corpus size. That blocking is exactly what makes these runnable at
  * 100 TB: the shuffle keys are the blocks, each task sees one bucket.
  *
  * MinHash/SimHash use Spark's xxhash64 (no DuckDB equivalent → declared
  * without oracle; unit tests pin their semantics on crafted near-dups).
  * Jaccard and the hyperplane buckets are pure deterministic arithmetic
  * and are fully oracled.
  */
object Dedup {

  private def toks = array_distinct(split(col("text"), " "))

  // ---------------------------------------------------------------- jaccard

  /** Token-set Jaccard similarity between documents in the same
    * (lang, source) block; |∪| derived arithmetically as |A|+|B|-|∩| so
    * both engines count identically. Top-100 pairs. */
  def dedupJaccard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).withColumn("tset", toks)
    val a = docs.select(col("lang"), col("source"), col("doc_id").as("a_id"),
      col("tset").as("ta"))
    val b = docs.select(col("lang").as("lang_b"), col("source").as("source_b"),
      col("doc_id").as("b_id"), col("tset").as("tb"))
    a.join(b, col("lang") === col("lang_b") && col("source") === col("source_b")
        && col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni", (size(col("ta")) + size(col("tb"))).cast("long") - col("inter"))
      .withColumn("jac", col("inter").cast("double") / col("uni"))
      .select(col("a_id"), col("b_id"), col("inter"), col("uni"), col("jac"))
      .orderBy(col("jac").desc, col("a_id").asc, col("b_id").asc)
      .limit(100)
  }

  // ---------------------------------------------------------------- minhash

  private val NumPerms = 16
  private val BandRows = 4
  private val NumBands = NumPerms / BandRows

  /** Shingle set: n-gram token windows (n=1 degenerates to the token
    * set). slice() is 1-based; docs shorter than n yield an empty set. */
  private def shingles(nGram: Int): String = {
    val base = "split(text, ' ')"
    if (nGram <= 1) s"array_distinct($base)"
    else s"array_distinct(CASE WHEN size($base) >= $nGram THEN " +
      s"transform(sequence(1, size($base) - ${nGram - 1}), " +
      s"i -> concat_ws(' ', slice($base, i, $nGram))) " +
      s"ELSE slice($base, 1, 0) END)"
  }

  /** Per-doc MinHash signatures over n-gram shingles: one row per doc
    * with m0..m15 columns. Shingle→long via xxhash64, folded into
    * [0, 2^31) so the i-th affine permutation (a_i·h + b_i) mod p stays
    * overflow-free under ANSI mode (a_i, b_i, h < 2^31 ⇒ product < 2^62). */
  def minhashSignatures(docs: DataFrame, nGram: Int = 2): DataFrame = {
    val p = 2147483647L // 2^31 - 1 (Mersenne prime)
    val tokenHashes = docs
      .select(col("doc_id"), explode(expr(shingles(nGram))).as("tok"))
      .withColumn("h", pmod(xxhash64(col("tok")), lit(p)))
    val permCols = (0 until NumPerms).map { i =>
      min((col("h") * lit(1103515245L * (i + 1) % p) + lit(12345L * (i + 1))) % p)
        .as(s"m$i")
    }
    tokenHashes.groupBy(col("doc_id")).agg(permCols.head, permCols.tail: _*)
  }

  /** (doc_id, band_id, bucket): LSH banding — docs sharing a bucket in any
    * band are candidate pairs. */
  def minhashBuckets(docs: DataFrame, nGram: Int = 2): DataFrame = {
    val sigs = minhashSignatures(docs, nGram)
    val bands = (0 until NumBands).map { b =>
      val cols = (b * BandRows until (b + 1) * BandRows).map(i => col(s"m$i"))
      struct(lit(b).cast("long").as("band_id"), xxhash64(cols: _*).as("bucket"))
    }
    sigs.select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band_id"), col("bb.bucket"))
  }

  /** Candidate near-dup pairs from LSH bucketing (same band+bucket). */
  def minhashCandidates(docs: DataFrame, nGram: Int = 2): DataFrame = {
    val bk = minhashBuckets(docs, nGram)
    val l = bk.select(col("band_id"), col("bucket"), col("doc_id").as("a_id"))
    val r = bk.select(col("band_id").as("band_r"), col("bucket").as("bucket_r"),
      col("doc_id").as("b_id"))
    l.join(r, col("band_id") === col("band_r") &&
        col("bucket") === col("bucket_r") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }

  /** The production near-dup pipeline at corpus scale: LSH candidate
    * generation (near-linear) followed by exact Jaccard verification on
    * the candidates only — never an all-pairs join. The (lang, source)
    * blocking in dedupJaccard is for bounded blocks; THIS is the 100 TB
    * path. */
  def nearDupPairs(docs: DataFrame, nGram: Int = 2,
      threshold: Double = 0.7): DataFrame = {
    val withSets = docs.withColumn("tset", expr(shingles(nGram)))
    val a = withSets.select(col("doc_id").as("a_id"), col("tset").as("ta"))
    val b = withSets.select(col("doc_id").as("b_id"), col("tset").as("tb"))
    minhashCandidates(docs, nGram)
      .join(a, "a_id").join(b, "b_id")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("jac", col("inter").cast("double") /
        ((size(col("ta")) + size(col("tb"))).cast("long") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), col("jac"))
  }

  /** Query surface: per-band bucket statistics (always NumBands rows).
    * Pair extraction itself is pinned by unit tests on crafted near-dups. */
  def dedupMinhash(s: SparkSession, d: String): DataFrame =
    minhashBuckets(Tables.documents(s, d))
      .groupBy(col("band_id"), col("bucket"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("sz")).as("n_docs"),
        max(col("sz")).as("max_bucket"))
      .orderBy(col("band_id").asc)

  // ---------------------------------------------------------------- simhash

  private val SimBits = 16

  /** 16-bit SimHash: per-bit weighted votes over token hashes, sign →
    * bit. Near-dups differ in few bits (hamming distance). */
  def simhash(docs: DataFrame): DataFrame = {
    val tokenHashes = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until SimBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        .as(s"v$b")
    }
    val sig = (0 until SimBits).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce[Column](_ + _)
    tokenHashes.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .withColumn("simhash", sig)
      .select(col("doc_id"), col("simhash"))
  }

  def dedupSimhash(s: SparkSession, d: String): DataFrame =
    simhash(Tables.documents(s, d)).orderBy(col("doc_id").asc)

  // ------------------------------------------------- hyperplane LSH (ANN)

  private val NumPlanes = 8
  private val Dim = 64

  /** Deterministic pseudo-random hyperplane weights (integer-derived, so
    * both engines build bit-identical planes). */
  def planeWeight(p: Int, j: Int): Double = ((p * 131 + j * 31) % 17 - 8).toDouble

  /** Sign-bit bucket id for every vector: bit p = (w_p · e > 0). At scale
    * this is the partition key that turns ANN into a per-bucket local
    * search. */
  def annBuckets(emb: DataFrame): DataFrame = {
    graft.functions.VectorExprs.register(emb.sparkSession)
    val bits = (0 until NumPlanes).map { p =>
      val w = (0 until Dim).map(j => s"${planeWeight(p, j)}D").mkString(", ")
      val dot = expr(s"vec_dot(embedding, array($w))")
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce[Column](_ + _)
    emb.withColumn("bucket", bits)
  }

  def simAnnBuckets(s: SparkSession, d: String): DataFrame =
    annBuckets(Tables.embeddings(s, d))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("bucket").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_jaccard" -> dedupJaccard,
    "q_dedup_minhash" -> dedupMinhash,
    "q_dedup_simhash" -> dedupSimhash,
    "q_sim_ann"       -> simAnnBuckets
  )

  /** DuckDB side of the hyperplane dot for plane p — generated from the
    * same planeWeight constants as the Spark plan. */
  private def planeSql(p: Int): String = {
    val lits = (0 until Dim).map(j => planeWeight(p, j).toString).mkString(", ")
    s"""CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(list_zip(embedding, [$lits]),
       |    z -> CAST(z[1] AS DOUBLE) * z[2])),
       |  (a, x) -> a + x) > 0 THEN ${1L << p} ELSE 0 END""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_dedup_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |         list_distinct(string_split(text, ' ')) AS tset
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |         len(list_intersect(a.tset, b.tset)) AS inter,
        |         len(a.tset) + len(b.tset)
        |           - len(list_intersect(a.tset, b.tset)) AS uni
        |  FROM t a JOIN t b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id, inter, uni,
        |       CAST(inter AS DOUBLE) / uni AS jac
        |FROM p
        |ORDER BY jac DESC, a_id ASC, b_id ASC
        |LIMIT 100""".stripMargin,
    "q_sim_ann" ->
      (s"""SELECT CAST(${(0 until NumPlanes).map(planeSql).mkString("\n + ")}
        | AS BIGINT) AS bucket, count(*) AS n_vecs
        |FROM embeddings
        |GROUP BY bucket
        |ORDER BY bucket ASC""").stripMargin
  )
}
