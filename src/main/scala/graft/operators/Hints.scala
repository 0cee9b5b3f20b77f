package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Statistics-aware broadcast hinting for iterative-state joins.
  *
  * The iterative operators (clusterLabels' label table, pagerank's rank
  * state, BFS frontiers) join a state table whose lineage was truncated by
  * `localCheckpoint`, so the planner sees no size statistics and would
  * shuffle-join a few hundred rows every round. Rounds 1–3 hard-coded
  * `broadcast(state)` — locally right, but a scale-killer: at 100× the
  * corpus the label table is corpus-sized and the hint OOMs the build side
  * (VERDICT r3 flagged Dedup.scala's `broadcast(l)` as the one present
  * scale-unsafe plan).
  *
  * `hintIfSmall` makes the switch data-driven: the caller passes a MEASURED
  * row bound (cheap — the state is already checkpointed, so counting it is
  * a scan of cached blocks, not a recompute) and the hint applies only
  * under the threshold. Above it the join degrades to the standard shuffled
  * form — same algebra, no driver-memory cliff. The threshold is rows, not
  * bytes, because every caller's state row is a fixed narrow shape
  * (id + label / node + rank), so the row bound translates directly to a
  * build-side budget — see [[MaxBroadcastRows]] for the sizing rationale.
  */
object Hints {
  /** Max state rows that still get a broadcast hint. Was 2M through
    * round 6; the 100× replica showed why that overshoots: a 1.5M-node
    * PageRank state slipped under the bound and each power-iteration
    * round built a multi-hundred-MB broadcast hash relation (rows cost
    * ~100 B+ in the relation, not the ~50 B of their data), which
    * together with the cached edge leaf exhausted execution memory.
    * 500k rows ≈ 50 MB build side keeps the hint inside ordinary
    * executor broadcast budgets; bigger state degrades to the shuffled
    * join, which is the correct plan for it anyway. */
  val MaxBroadcastRows: Long = 500L * 1000

  /** Separate, higher budget for RAW DIMENSION SCANS (part / customer /
    * supplier and cheap projections/filters of them). Two-tier policy,
    * measured round 10 at 100×: a SHUFFLE-DERIVED state table (degree
    * counts, item supports, label state) pays a full shuffle + driver
    * collect before it can ship, and guarding it at [[MaxBroadcastRows]]
    * measured as pure win (q_basket_lift 66.8→33.1 s); a raw dim scan
    * broadcasts from a parallel file read of fixed-width (≲100 B) rows,
    * and force-degrading it at 500 k measured as pure LOSS (the 11
    * part/customer-joining queries: 29.0→38.6 s at 100×, q_tpch_q17
    * 1.3→4.4 s — the fact-side exchange costs far more than shipping a
    * 2 M-row dim). 4 M rows ≈ ≤400 MB serialized — inside every
    * production broadcast budget, while a 10⁹-row dimension (the true
    * OOM regime) is 250× over the line and degrades to a shuffled-hash
    * join with the dim as build side. */
  val DimMaxBroadcastRows: Long = 4L * 1000 * 1000

  /** Lineage-truncation point for the iterative family (PageRank/BFS
    * edge leaves, label-propagation state): `localCheckpoint` by
    * default — fastest, and correct at local[*] — but local checkpoint
    * blocks live on EXECUTORS, so on a real cluster an executor loss
    * makes the truncated lineage unrecoverable mid-job. Setting
    * `spark.graft.checkpointDir` (session conf) or `SPARK_GRAFT_CKPT_DIR`
    * (environment) switches every site to a RELIABLE `checkpoint()`
    * against that directory — the fault-tolerant mode a 100 TB run
    * wants — with identical results (CkptModeSpec pins equality in both
    * modes). The conf is consulted per call — changing it mid-session
    * re-points the context — so one session can compare modes.
    *
    * DISK-GROWTH CAVEAT: reliable checkpoint files are only garbage-
    * collected when `spark.cleaner.referenceTracking.cleanCheckpoints`
    * is true AND the checkpointed RDD is dropped; iterative operators
    * (BFS per-hop, label-prop rounds) otherwise accumulate one rdd-*
    * directory per round in the checkpoint dir for the session's
    * lifetime. A production deployment should set that cleaner conf (we
    * don't force it here — it is a session-wide behavioral conf the
    * caller owns) or point SPARK_GRAFT_CKPT_DIR at storage with a
    * lifecycle/TTL policy, the standard practice for checkpoint
    * locations on object stores. */
  def checkpoint(df: DataFrame, eager: Boolean): DataFrame = {
    val s = df.sparkSession
    val dir = Option(s.conf.get("spark.graft.checkpointDir", null))
      .filter(_.nonEmpty)
      .orElse(sys.env.get("SPARK_GRAFT_CKPT_DIR").filter(_.nonEmpty))
    dir match {
      case Some(p) =>
        // Consulted PER CALL, as documented: re-point the context when
        // the conf value changes mid-session (the previous guard only
        // set it when empty, silently ignoring a changed conf).
        // getCheckpointDir returns the resolved URI (scheme-qualified),
        // so compare the normalized Path URIs: only call setCheckpointDir
        // when the configured path isn't the one already in effect. (A
        // bare endsWith suffix match is wrong — 'ckpt' would spuriously
        // match 'file:/tmp/my-ckpt' and skip the re-point.)
        val cur = s.sparkContext.getCheckpointDir
        if (!cur.exists(c => c == p ||
            new org.apache.hadoop.fs.Path(c).toUri.getPath ==
              new org.apache.hadoop.fs.Path(p).toUri.getPath))
          s.sparkContext.setCheckpointDir(p)
        df.checkpoint(eager)
      case None =>
        // MEMORY_AND_DISK_SER, not the default deserialized
        // MEMORY_AND_DISK: the iterative leaves are corpus-sized (the
        // 100× replica's 60M-edge PageRank leaf), and deserialized row
        // caches of that size pin unified memory that concurrent
        // hash-aggregate tasks need — the measured failure mode was
        // UNABLE_TO_ACQUIRE_MEMORY in the round's grouped sum while the
        // leaf held gigabytes of unserialized rows. Serialized blocks
        // are several× smaller and evict to disk under pressure, so
        // execution can claim the pool; the extra deserialization on
        // the 2–4 reads per leaf is noise against a join+agg round.
        df.localCheckpoint(eager,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    }
  }

  /** `broadcast(df)` iff the measured `rows` bound is within `maxRows`;
    * otherwise `df` unchanged (planner picks the shuffle join). Pass a
    * cheap UPPER bound (e.g. 2·|pairs| for label-state members) — a bound
    * that overshoots only costs an unnecessary shuffle, never an OOM. */
  def hintIfSmall(df: DataFrame, rows: Long,
      maxRows: Long = MaxBroadcastRows): DataFrame =
    if (rows >= 0 && rows <= maxRows) broadcast(df) else df

  /** [[hintIfSmall]]'s dimension-join variant: above the budget the side
    * degrades to a SHUFFLE_HASH hint instead of falling bare — the
    * bounded dimension stays the hash BUILD side and the fact side
    * streams sort-free, the closest shuffle-plan analogue of the
    * broadcast it replaces (the q_graph_pagerank / q_basket_lift
    * finding: the SMJ fallback re-sorts the fact side for no reason).
    * Round-10 hygiene pass: every `broadcast()` of a table that GROWS
    * with the corpus — the part/customer/supplier dimensions and tables
    * derived from them — rides this with a job-free parquet-footer
    * bound (Tables.rowCount) against the [[DimMaxBroadcastRows]] budget
    * (see there for the measured two-tier rationale). Region/nation
    * (≤25 rows), seeded codebooks, k-bounded cut/threshold tables and
    * 1-row folds stay unconditional: bounded by construction. */
  def bcOrHash(df: DataFrame, rows: Long,
      maxRows: Long = DimMaxBroadcastRows): DataFrame =
    if (rows >= 0 && rows <= maxRows) broadcast(df) else df.hint("SHUFFLE_HASH")

  /** Shared-leaf memo maintenance for the session-scoped caches
    * (Text.tokenLeaf, Dedup.labelMemo). Keys are
    * `<scId>:<dir>@<fixture-fingerprint>`; a fixture REGENERATION
    * changes only the fingerprint, so without eviction the superseded
    * entry keeps its persisted/checkpointed DataFrame referenced for
    * the session lifetime — leaked cache blocks on a long-lived
    * session. On inserting a key, drop every entry with the same
    * `<scId>:<dir>` prefix but a different fingerprint and unpersist
    * its DataFrame (non-blocking; for checkpointed leaves the map
    * removal is what makes the RDD blocks collectable). */
  def memoInsert(memo: java.util.concurrent.ConcurrentHashMap[String, DataFrame],
      key: String, build: => DataFrame): DataFrame = {
    val df = memo.computeIfAbsent(key, _ => build)
    evictStale(memo, key)
    df
  }

  /** [[memoInsert]]'s overwrite twin for callers that always REBUILD
    * (Dedup.dedupClusters' honest-bench accounting): displaces the same
    * key too, unpersisting the displaced leaf. */
  def memoPut(memo: java.util.concurrent.ConcurrentHashMap[String, DataFrame],
      key: String, df: DataFrame): Unit = {
    val old = memo.put(key, df)
    if (old != null && (old ne df)) unpersistQuietly(old)
    evictStale(memo, key)
  }

  private def evictStale(
      memo: java.util.concurrent.ConcurrentHashMap[String, DataFrame],
      key: String): Unit = {
    val at = key.lastIndexOf('@')
    if (at > 0) {
      val prefix = key.substring(0, at + 1)
      val it = memo.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey != key && e.getKey.startsWith(prefix)) {
          unpersistQuietly(e.getValue)
          it.remove()
        }
      }
    }
  }

  private def unpersistQuietly(df: DataFrame): Unit =
    try df.unpersist(blocking = false)
    catch { case _: Exception => () }

  /** Registry of every session-scoped leaf memo (tokenLeaf, gramLeaf,
    * labelMemo, sweepSigMemo register at module init), so measurement
    * harnesses can drop ALL cached leaves between queries. Query paths
    * never call this — eviction there stays per-key via [[memoInsert]]/
    * [[memoPut]]. */
  private val allMemos =
    new java.util.concurrent.CopyOnWriteArrayList[
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def registerMemo(
      m: java.util.concurrent.ConcurrentHashMap[String, DataFrame])
      : java.util.concurrent.ConcurrentHashMap[String, DataFrame] = {
    allMemos.add(m); m
  }

  /** Unpersist and forget every memoized leaf. Used by graft.Headroom's
    * ALL/ONLY sweeps between queries so each measurement starts from the
    * cold-cache state a SOLO run would see: round 10 documented an
    * in-sweep-vs-solo gap of up to ~1.6× (basket_pairs 43.1 vs 26.4 s at
    * 100×, same day) caused by leaf-persisting neighbors holding
    * executor memory — with eviction the sweep numbers are primary
    * evidence, not conservative upper bounds. Memo removal is also what
    * makes checkpointed leaves' RDD blocks collectable. */
  def evictAllMemos(): Unit =
    allMemos.forEach { m =>
      m.values().forEach(df => unpersistQuietly(df))
      m.clear()
    }
}
