package graft.operators

import org.apache.spark.sql.SparkSession

/** One-call release of every per-call operator cache
  * ([[TrackedCaches]] adopters). For long-lived sessions running many
  * independent passes — the driver's Verify/Bench sessions run 200+
  * gates back to back — per-call persists otherwise accumulate for the
  * whole session and the CacheManager's pinned blocks crowd the
  * executors' storage memory (MEMORY_AND_DISK degrades to disk churn
  * under that pressure, read as random straggler queries). Safe at any
  * point AFTER a pass's results are materialized: released frames
  * recompute if re-referenced. Deliberately does NOT touch the
  * cross-gate memoized staging caches (TextQueries / VaultQueries /
  * VectorQueries fixtures) — those are shared across queries by design
  * and pay for themselves. */
object OperatorCaches {

  /** Register a `newSession()` CHILD as releasing with `root`: caches
    * and checkpoints the child's queries pin are unpinned by
    * `releaseAll(root)` — and ONLY by it; an independent sibling root
    * session on the same SparkContext can never release them. Call this
    * right after creating a scoped-SQLConf child session whose work
    * routes through the tracked seams. */
  def adoptSession(child: SparkSession, root: SparkSession): Unit =
    SessionLineage.adopt(child, root)

  def releaseAll(s: SparkSession): Unit = {
    Dedup.releaseCaches(s)
    Graph.releaseCaches(s)
    GlobalRank.releaseCaches(s)
    ConnectedComponents.releaseCaches(s)
    SuffixArray.releaseCaches(s)
    StagingCaches.releaseCaches(s)
  }
}
