package graft

import org.apache.spark.sql.SparkSession

/** Shared measurement-harness session settings (round 14, VERDICT r13
  * item 8).
  *
  * The round-13 100× sweep lost an executor to a G1 full-collection
  * stall that outlasted the 10 s default local-mode heartbeat (Spark
  * exit 56, HEARTBEAT_FAILURE, 63 min into the run); only Headroom got
  * the stretched tolerances that session. Solo TimeOne brackets and
  * Bench runs at 24g/100× are exposed to exactly the same stall, so the
  * tolerances live here and every harness applies them — the same
  * configuration an at-capacity production driver runs with. A
  * measurement harness must survive the stall it is trying to measure.
  */
object Harness {
  def withStallTolerances(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
}
