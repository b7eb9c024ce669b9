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

  /** persist + remember, so `releaseCaches` can unpin later. */
  protected def tracked(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    persisted.getOrElseUpdate(df.sparkSession,
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(p)
    p
  }

  /** Unpersist every intermediate this object pinned for `s`. Call after
    * the returned results are consumed (they recompute if re-used). */
  def releaseCaches(s: SparkSession): Unit =
    Option(persisted.remove(s).orNull).foreach { q =>
      var df = q.poll()
      while (df != null) { df.unpersist(blocking = false); df = q.poll() }
    }
}
