package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped persist tracking shared by the iterative/self-joining
  * operators ([[Dedup]], [[Graph]]). Their intermediates back lazily
  * returned results, so they cannot unpersist eagerly; every persist is
  * instead TRACKED per session, and callers running many passes in one
  * long-lived session call `releaseCaches` after consuming each result
  * (same contract as `VaultQueries.evictCaches`). Frames recompute if
  * re-used after release.
  */
private[operators] trait TrackedCaches {

  private val persisted = scala.collection.concurrent.TrieMap
    .empty[SparkSession,
      java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]

  // keyed by SparkContext, not SparkSession: gates may checkpoint under
  // a scoped child session (s.newSession() for a low-fan-out SQLConf),
  // but the pinned blocks live in the SHARED context — releaseCaches on
  // the parent session must still reach them
  private val checkpoints = scala.collection.concurrent.TrieMap
    .empty[org.apache.spark.SparkContext,
      java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.rdd.RDD[_]]]

  /** persist + remember, so `releaseCaches` can unpin later. */
  protected def tracked(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    persisted.getOrElseUpdate(df.sparkSession,
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(p)
    p
  }

  /** Eager localCheckpoint + remember the pinned checkpoint RDD, so
    * `releaseCaches` can unpin it later. localCheckpoint severs lineage
    * — unlike [[tracked]] frames the result CANNOT recompute after
    * release, so this is for snapshots that are consumed within the
    * pass and must not survive it (e.g. pre-vacuum search results over
    * an index dir the same gate then mutates). `Dataset.localCheckpoint`
    * pins its RDD outside the CacheManager, so `df.unpersist` never
    * reaches it; we reach through the LogicalRDD the checkpoint returns
    * and fail LOUDLY if the plan shape ever stops matching (a silent
    * fallback would reintroduce the exact per-gate leak class this seam
    * exists to close).
    *
    * Concurrency scope: checkpoint tracking is keyed by the SHARED
    * SparkContext (so a parent-session release reaches checkpoints taken
    * under a `newSession()` child — the scoped-SQLConf gate pattern),
    * which means `releaseCaches` for ONE root session unpins EVERY
    * session's tracked checkpoints on that context. That is the designed
    * contract for the sequential driver this repo serves (one pass in
    * flight at a time, release after consuming); two concurrent
    * INDEPENDENT root sessions on one context must coordinate their
    * releases externally, or one session's release destroys the other's
    * in-flight non-recomputable snapshot. */
  protected def trackedCheckpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    val rdd = cp.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      case other => throw new IllegalStateException(
        "localCheckpoint no longer yields a LogicalRDD plan — the " +
          s"tracked-checkpoint release seam cannot unpin it: $other")
    }
    checkpoints.getOrElseUpdate(cp.sparkSession.sparkContext,
      new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.rdd.RDD[_]]()).add(rdd)
    cp
  }

  /** Unpersist every intermediate this object pinned for `s`. Call after
    * the returned results are consumed (persisted frames recompute if
    * re-used; checkpointed snapshots do NOT — they are pass-scoped). */
  def releaseCaches(s: SparkSession): Unit = {
    Option(persisted.remove(s).orNull).foreach { q =>
      var df = q.poll()
      while (df != null) { df.unpersist(blocking = false); df = q.poll() }
    }
    Option(checkpoints.remove(s.sparkContext).orNull).foreach { q =>
      var rdd = q.poll()
      while (rdd != null) { rdd.unpersist(blocking = false); rdd = q.poll() }
    }
  }
}
