package graft

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema/contract validation (the reference's cerberus step, SURVEY §1.2):
  * instead of a per-record Python validator, declare the expectation and
  * get back the violating rows as a DataFrame — distributed, and free to
  * run as part of any pipeline.
  */
object Validate {

  /** Rows violating non-null requirements on the given columns. */
  def nullViolations(df: DataFrame, required: Seq[String]): DataFrame =
    df.filter(required.map(c => col(c).isNull).reduce[Column](_ || _))

  /** Rows failing an arbitrary declared predicate (e.g. FK shape, regex). */
  def violations(df: DataFrame, rule: Column): DataFrame = df.filter(!rule)

  /** Assert a DataFrame conforms: correct column names/types (order-
    * insensitive) and zero null violations. Returns the df for chaining;
    * throws IllegalStateException with a diagnostic otherwise. */
  def conforms(df: DataFrame, expected: StructType,
      requiredNonNull: Seq[String]): DataFrame = {
    val got = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val want = expected.fields.map(f => f.name -> f.dataType).toMap
    if (got != want)
      throw new IllegalStateException(
        s"schema mismatch: got $got, want $want")
    val bad = nullViolations(df, requiredNonNull).count()
    if (bad > 0)
      throw new IllegalStateException(
        s"$bad rows violate non-null(${requiredNonNull.mkString(",")})")
    df
  }
}
