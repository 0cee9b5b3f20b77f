package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Aggregation operators (SURVEY.md §2.4).
  *
  * All group-bys are plain hash aggregations: Spark plans partial (map-side)
  * + final aggregation automatically, so at cluster scale only the already-
  * combined partials cross the shuffle. Outputs are totally ordered with a
  * unique tiebreak and doubles are rounded (§7.4 determinism ruleset).
  */
object Aggs {

  /** Top-10 users by event count — the reference's flagship
    * "top contributing users" shape. Shuffle: one hash-agg on user_id,
    * then TakeOrderedAndProject (no global sort materialization). */
  def topkGroups(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("user_id").asc)
      .limit(10)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_groups" -> topkGroups
  )

  val oracle: Map[String, String] = Map(
    "q_topk_groups" ->
      """SELECT user_id, count(*) AS cnt
        |FROM events
        |GROUP BY user_id
        |ORDER BY cnt DESC, user_id ASC
        |LIMIT 10""".stripMargin
  )
}
