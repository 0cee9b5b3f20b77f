package graft

/** Fixed-work CPU calibration micro-task (round 13, VERDICT r12 item 3).
  *
  * Two rounds running, cross-round absolute bench comparisons were
  * contaminated by shared-VM host drift (r12 measured a uniform 1.40×
  * slowdown on byte-identical plans). This probe turns "the host was
  * slow" from an inference into a recorded number: a single-threaded
  * SplitMix64 loop over a FIXED iteration count — no allocation, no
  * Spark, no I/O — whose wall time is proportional to the host's
  * effective single-core speed at that moment. Bench/Headroom/TimeOne
  * run it alongside the query timings and emit `calibration_s`; judges
  * normalize cross-round per-query numbers by the calibration ratio
  * instead of guessing.
  *
  * The loop body is the standard SplitMix64 finalizer (public-domain
  * constant set, Steele et al., "Fast Splittable Pseudorandom Number
  * Generators", OOPSLA 2014) — chosen because it is pure 64-bit ALU
  * work with a serial dependency chain, so it measures cycles/op, not
  * memory bandwidth or allocator health. The checksum is returned so
  * the JIT cannot elide the loop.
  */
object Calibrate {
  /** ~1.2e9 serial finalizer rounds: ~2 s on a healthy core, long
    * enough that timer noise is <1%, short enough to run twice per
    * bench without moving the total. */
  final val Iters = 1200000000L

  final case class Result(seconds: Double, checksum: Long)

  def run(): Result = {
    val t0 = System.nanoTime()
    var z = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0L
    while (i < Iters) {
      z += 0x9E3779B97F4A7C15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      acc ^= x ^ (x >>> 31)
      i += 1
    }
    Result((System.nanoTime() - t0) / 1e9, acc)
  }

  /** min-of-2 with the checksum logged to stderr (keeps stdout clean
    * for the drivers' JSON-tail parsing). */
  def measure(tag: String): Double = {
    val a = run(); val b = run()
    System.err.println(
      f"[calibrate] $tag rep1=${a.seconds}%.3f s rep2=${b.seconds}%.3f s checksum=${a.checksum}%x")
    math.min(a.seconds, b.seconds)
  }

  /** ALL-CORE twin of [[run]] (round 14): the serial probe normalizes
    * single-core drift only — the round-13 re-baseline and the round-14
    * normalized cross-round table both show totals drifting while the
    * serial probe stays flat, i.e. the host loses AGGREGATE throughput
    * (neighbor VMs, SMT contention, memory bandwidth) that one thread
    * cannot see. 32 threads each run a fixed serial-chain workload; the
    * WALL time of the slowest is the all-core capacity number. ~1 s on
    * an unloaded 32-vCPU host; rises toward the serial ratio × thread
    * oversubscription under contention.
    *
    * Thread count (ADVICE r14): the harness's executor-thread budget —
    * SPARK_GRAFT_CPUS when set (what Bench/Headroom pass to local[n]),
    * else the host's available processors. The old hardcoded 32
    * measured oversubscription, not all-core capacity, on any
    * non-32-vCPU host; the count used is logged with the number so
    * cross-host values stay interpretable. */
  final val ParIters = 400000000L

  def defaultParThreads: Int =
    sys.env.get("SPARK_GRAFT_CPUS")
      .flatMap(c => scala.util.Try(c.trim.toInt).toOption)
      .filter(_ > 0)
      .getOrElse(Runtime.getRuntime.availableProcessors)

  def runParallel(threads: Int = defaultParThreads): Double = {
    val sink = new java.util.concurrent.atomic.AtomicLong(0L)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var z = 0x9E3779B97F4A7C15L * (t + 1)
        var acc = 0L
        var i = 0L
        while (i < ParIters) {
          z += 0x9E3779B97F4A7C15L
          var x = z
          x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
          x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
          acc ^= x ^ (x >>> 31)
          i += 1
        }
        sink.getAndAccumulate(acc, _ ^ _)
        ()
      })
      th.setDaemon(true); th.start(); th
    }
    ts.foreach(_.join())
    val s = (System.nanoTime() - t0) / 1e9
    System.err.println(
      f"[calibrate] all-core $s%.3f s threads=$threads checksum=${sink.get()}%x")
    s
  }
}
