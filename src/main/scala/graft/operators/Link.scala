package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: re-attach dirty string keys to
  * their canonical dimension rows — the classic block → score →
  * best-match pipeline (Fellegi–Sunter shape) that every large-scale
  * data integration needs when upstream feeds arrive with typo'd or
  * truncated identifiers.
  *
  * The dirty side is DERIVED DETERMINISTICALLY inside the query: each
  * ordering customer's canonical name is reconstructed from its key and
  * a content-keyed corruption is applied (one class substitutes a
  * padding digit with 'X', one drops it, the rest stay clean). That
  * makes the whole pipeline — including the ground truth — a pure
  * function of the fixture, so linkage ACCURACY itself is an oracled
  * column, not a hand-waved claim: n_correct counts best-matches whose
  * resolved key equals the key the corruption started from.
  *
  * Scale shape: never all-pairs. Candidates come from an equi-join on a
  * corruption-resistant blocking key (the last-2-digit suffix — chosen
  * because the injected noise lives in the padding prefix, the same
  * reasoning that picks phonetic keys or name minhashes in real ER).
  * Block sizes are bounded by construction (~n/100 per side), the
  * per-pair scorer is a codegen levenshtein on ≤18-char strings, and
  * best-match-per-entity is a window over one block-bounded candidate
  * list. The audit twin q_link_blocks measures exactly the number that
  * governs 100 TB feasibility: candidate pairs vs the naive |L|×|R|.
  */
object Link {

  /** Dirty right side: one row per distinct ordering customer with its
    * reconstructed-and-corrupted display name plus the ground-truth key
    * (carried only to audit accuracy; the matcher never joins on it). */
  private def dirtyRights(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_custkey").as("r_key")).distinct()
      .withColumn("name0",
        concat(lit("Customer#"), lpad(col("r_key").cast("string"), 9, "0")))
      .withColumn("corruption",
        when(col("r_key") % 7 === 3, lit("sub"))
          .when(col("r_key") % 7 === 5, lit("drop"))
          .otherwise(lit("clean")))
      .withColumn("r_name",
        when(col("corruption") === "sub",
          expr("concat(substr(name0, 1, 9), 'X', substr(name0, 11, 8))"))
          .when(col("corruption") === "drop",
            expr("concat(substr(name0, 1, 9), substr(name0, 11, 8))"))
          .otherwise(col("name0")))
      .select(col("r_key"), col("corruption"), col("r_name"))

  /** Declared surface: blocked fuzzy linkage with per-corruption-class
    * accuracy audit. Best candidate per dirty row under levenshtein ≤ 2,
    * ties broken (dist, c_custkey) for a unique deterministic pick; a
    * left join keeps never-matched rows visible as n_right − n_matched. */
  def linkEr(s: SparkSession, d: String): DataFrame = {
    val r = dirtyRights(s, d).withColumn("blk", expr("right(r_name, 2)"))
    val l = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"))
      .withColumn("blk", expr("right(c_name, 2)"))
    val byBest = Window.partitionBy(col("r_key"))
      .orderBy(col("dist").asc, col("c_custkey").asc)
    val best = r.join(l, "blk")
      .withColumn("dist", levenshtein(col("r_name"), col("c_name")).cast("long"))
      .filter(col("dist") <= 2)
      .withColumn("rn", row_number().over(byBest))
      .filter(col("rn") === 1)
      .select(col("r_key"), col("c_custkey"), col("dist"))
    dirtyRights(s, d).join(best, Seq("r_key"), "left")
      .groupBy(col("corruption"))
      .agg(count(lit(1)).as("n_right"),
        count(col("c_custkey")).as("n_matched"),
        count(when(col("c_custkey") === col("r_key"), 1)).as("n_correct"),
        coalesce(sum(col("dist")), lit(0L)).as("sum_dist"))
      .orderBy(col("corruption").asc)
  }

  /** Declared surface: blocking-quality audit — the candidate-workload
    * arithmetic (Σ per-block |L_b|·|R_b| vs naive |L|·|R|) counted
    * WITHOUT materializing a single pair, the same never-expand
    * discipline as the LSH banding sweep. One output row. */
  def linkBlocks(s: SparkSession, d: String): DataFrame = {
    val r = dirtyRights(s, d).withColumn("blk", expr("right(r_name, 2)"))
      .groupBy(col("blk")).agg(count(lit(1)).as("nr"))
    val l = Tables.customer(s, d)
      .withColumn("blk", expr("right(c_name, 2)"))
      .groupBy(col("blk")).agg(count(lit(1)).as("nl"))
    val perBlock = l.join(r, Seq("blk"), "full_outer")
      .select(coalesce(col("nl"), lit(0L)).as("nl"),
        coalesce(col("nr"), lit(0L)).as("nr"))
      .agg(count(lit(1)).as("n_blocks"),
        max(col("nl")).as("max_left"), max(col("nr")).as("max_right"),
        sum(col("nl") * col("nr")).as("cand_pairs"),
        sum(col("nl")).as("n_left"), sum(col("nr")).as("n_right"))
    perBlock
      .withColumn("naive_pairs", col("n_left") * col("n_right"))
      .withColumn("reduction", expr("naive_pairs div greatest(cand_pairs, 1)"))
      .select(col("n_blocks"), col("max_left"), col("max_right"),
        col("cand_pairs"), col("naive_pairs"), col("reduction"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_link_er"     -> linkEr,
    "q_link_blocks" -> linkBlocks
  )

  private val rightsSql =
    """SELECT r_key, corruption,
      |       CASE corruption
      |         WHEN 'sub'  THEN substr(name0, 1, 9) || 'X' || substr(name0, 11, 8)
      |         WHEN 'drop' THEN substr(name0, 1, 9) || substr(name0, 11, 8)
      |         ELSE name0 END AS r_name
      |FROM (
      |  SELECT r_key,
      |         'Customer#' || lpad(CAST(r_key AS VARCHAR), 9, '0') AS name0,
      |         CASE WHEN r_key % 7 = 3 THEN 'sub'
      |              WHEN r_key % 7 = 5 THEN 'drop'
      |              ELSE 'clean' END AS corruption
      |  FROM (SELECT DISTINCT o_custkey AS r_key FROM orders))""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_link_er" ->
      s"""WITH rights AS ($rightsSql),
        |cand AS (
        |  SELECT r.r_key, c.c_custkey,
        |         CAST(levenshtein(r.r_name, c.c_name) AS BIGINT) AS dist
        |  FROM rights r JOIN customer c
        |    ON right(r.r_name, 2) = right(c.c_name, 2)
        |  WHERE levenshtein(r.r_name, c.c_name) <= 2),
        |best AS (
        |  SELECT r_key, c_custkey, dist FROM (
        |    SELECT r_key, c_custkey, dist,
        |           row_number() OVER (PARTITION BY r_key
        |             ORDER BY dist ASC, c_custkey ASC) AS rn
        |    FROM cand) WHERE rn = 1)
        |SELECT r.corruption, count(*) AS n_right,
        |       count(b.c_custkey) AS n_matched,
        |       count(CASE WHEN b.c_custkey = r.r_key THEN 1 END) AS n_correct,
        |       CAST(coalesce(sum(b.dist), 0) AS BIGINT) AS sum_dist
        |FROM rights r LEFT JOIN best b ON r.r_key = b.r_key
        |GROUP BY r.corruption
        |ORDER BY r.corruption ASC""".stripMargin,
    "q_link_blocks" ->
      s"""WITH rights AS ($rightsSql),
        |rb AS (SELECT right(r_name, 2) AS blk, count(*) AS nr
        |       FROM rights GROUP BY 1),
        |lb AS (SELECT right(c_name, 2) AS blk, count(*) AS nl
        |       FROM customer GROUP BY 1),
        |pb AS (SELECT coalesce(nl, 0) AS nl, coalesce(nr, 0) AS nr
        |       FROM lb FULL OUTER JOIN rb USING (blk)),
        |agg AS (SELECT count(*) AS n_blocks,
        |               max(nl) AS max_left, max(nr) AS max_right,
        |               sum(nl * nr) AS cand_pairs,
        |               sum(nl) AS n_left, sum(nr) AS n_right
        |        FROM pb)
        |SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
        |       CAST(max_left AS BIGINT) AS max_left,
        |       CAST(max_right AS BIGINT) AS max_right,
        |       CAST(cand_pairs AS BIGINT) AS cand_pairs,
        |       CAST(n_left * n_right AS BIGINT) AS naive_pairs,
        |       CAST((n_left * n_right) // greatest(cand_pairs, 1) AS BIGINT)
        |         AS reduction
        |FROM agg""".stripMargin
  )
}
