package graft

import org.apache.spark.sql.SparkSession

/** Driver-smoke replica: `SparkEntry.entry` must return >0 rows on a
  * FRESH DEFAULT session — no custom confs here on purpose, so anything a
  * query needs (e.g. nanosAsLong for events) must be set inside the query
  * path, exactly as the driver's t1 check exercises it. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"""{"smoke_rows":$n}""")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
