package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (builder-prompt: "skewed keys → salting or
  * AQE skew-join").
  *
  * AQE's skew-join splitting handles join-side skew automatically; these
  * helpers cover *aggregation* hot keys, where one key's rows overwhelm a
  * single reducer. Salting splits each key into `salts` subkeys for the
  * first (partial) aggregation, then combines the partials — two small
  * shuffles instead of one skewed one. The salt is derived from stable row
  * content (not rand()), so results stay deterministic.
  */
object Skew {

  /** count(*) per key, skew-safe: partial count per (key, salt), then
    * final sum per key. Semantically identical to groupBy(key).count. */
  def saltedCount(df: DataFrame, key: Column, salts: Int,
      saltSource: Column): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial_cnt"))
      .groupBy(col("key"))
      .agg(sum(col("partial_cnt")).as("cnt"))

  /** sum(value) per key with the same two-phase shape. */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int,
      saltSource: Column): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("partial_sum"))
      .groupBy(col("key"))
      .agg(sum(col("partial_sum")).as("total"))
}
