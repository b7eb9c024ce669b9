package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Root-session resolution for cache/checkpoint tracking: gates may run
  * under a `newSession()` CHILD session (the scoped-SQLConf pattern —
  * shared SparkContext, private conf), but their pinned blocks must
  * release with the PARENT the driver calls `releaseCaches` on.
  * [[adopt]] records that lineage; [[rootOf]] follows it to a fixpoint.
  * Links are weak-keyed by the child, so a discarded scoped session
  * never outlives its garbage collection here. */
private[operators] object SessionLineage {
  private val parents = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SparkSession]())

  def adopt(child: SparkSession, root: SparkSession): Unit =
    if (child ne root) parents.put(child, root)

  def rootOf(s: SparkSession): SparkSession = {
    var cur = s
    var hops = 0
    while (hops < 64) {
      val p = parents.get(cur)
      if (p == null || (p eq cur)) return cur
      cur = p
      hops += 1
    }
    cur
  }
}

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

  // keyed by ROOT SparkSession (SessionLineage): gates may checkpoint
  // under a scoped child session (s.newSession() for a low-fan-out
  // SQLConf, registered via OperatorCaches.adoptSession), and
  // releaseCaches on the parent must still reach those pins — but two
  // INDEPENDENT root sessions on one SparkContext must never release
  // each other's in-flight non-recomputable snapshots (the hazard the
  // previous context-wide keying documented instead of preventing).
  // Entries are WeakReferences: the queue must not be the thing keeping
  // a checkpoint RDD alive — a caller that never releases (an external
  // library user) drops their result frame, the RDD becomes
  // unreachable, and ContextCleaner reclaims its blocks on GC exactly
  // as if the tracking were absent. releaseCaches unpins whatever is
  // still alive, eagerly.
  private val checkpoints = scala.collection.concurrent.TrieMap
    .empty[SparkSession,
      java.util.concurrent.ConcurrentLinkedQueue[
        java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]]]]

  /** persist + remember, so `releaseCaches` can unpin later. Strong
    * references by design — a persisted plan lives in the shared
    * CacheManager until an explicit unpersist, so GC alone could never
    * release it; release-then-reuse recomputes. */
  protected def tracked(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    persisted.getOrElseUpdate(SessionLineage.rootOf(df.sparkSession),
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
    * Lifecycle: the queue holds the RDD WEAKLY — `releaseCaches` on the
    * root session unpins eagerly (the sequential-driver contract:
    * release after consuming each pass), while a caller that never
    * releases falls back to ContextCleaner reclamation once their
    * result frame is unreachable, instead of accumulating permanently
    * pinned blocks. */
  protected def trackedCheckpoint(df: DataFrame,
                                  eager: Boolean = true): DataFrame = {
    val cp = df.localCheckpoint(eager)
    val rdd = cp.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      case other => throw new IllegalStateException(
        "localCheckpoint no longer yields a LogicalRDD plan — the " +
          s"tracked-checkpoint release seam cannot unpin it: $other")
    }
    checkpoints.getOrElseUpdate(SessionLineage.rootOf(cp.sparkSession),
      new java.util.concurrent.ConcurrentLinkedQueue[
        java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]]]())
      .add(new java.lang.ref.WeakReference(rdd))
    cp
  }

  /** Unpersist every intermediate this object pinned for `s` (resolved
    * to its root session — a scoped child's pins release with the
    * parent; an independent sibling session's never do). Call after the
    * returned results are consumed (persisted frames recompute if
    * re-used; checkpointed snapshots do NOT — they are pass-scoped). */
  def releaseCaches(s: SparkSession): Unit = {
    val root = SessionLineage.rootOf(s)
    Option(persisted.remove(root).orNull).foreach { q =>
      var df = q.poll()
      while (df != null) { df.unpersist(blocking = false); df = q.poll() }
    }
    Option(checkpoints.remove(root).orNull).foreach { q =>
      var ref = q.poll()
      while (ref != null) {
        val rdd = ref.get()
        if (rdd != null) rdd.unpersist(blocking = false)
        ref = q.poll()
      }
    }
  }
}
