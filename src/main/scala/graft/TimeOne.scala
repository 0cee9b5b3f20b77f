package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: steady-state timing for ONE declared query at sf0.1
  * (`runMain graft.TimeOne q_name`) — the per-query drill-down Bench's
  * full-suite sweep is too coarse for. Warms at sf0.001 so codegen and
  * file-index caches are hot, then times 3 reps. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(args(0))
    fn(spark, "/root/testdata/sf0.001").count()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").count()
      println(f"rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
