package graft.operators

import org.apache.spark.sql.DataFrame

/** Tracked persists for pass-scoped staging frames — intermediates a
  * query pipeline or an operator pins for one pass, e.g. the export
  * pipeline's scored-documents stage that both the dedup canon and the
  * sampling budget re-read, or MaxSim's probe-scored candidate pairs. Unlike the cross-gate memoized fixtures
  * (TextQueries/VaultQueries staging, which pay for themselves across
  * many gates), these are per-call and must not outlive the pass:
  * [[OperatorCaches.releaseAll]] releases them with the operator caches,
  * so the driver's 200+-gate sessions never accumulate pinned blocks.
  */
object StagingCaches extends TrackedCaches {

  /** persist(MEMORY_AND_DISK) + register for session-wide release. */
  def cache(df: DataFrame): DataFrame = tracked(df)

  /** Eager localCheckpoint + register the pinned checkpoint RDD for
    * session-wide release. For pass-scoped snapshots a gate MUST sever
    * from their inputs (pre-mutation search results over an index dir
    * the gate then vacuums, streaming temp views dropped in `finally`).
    * Unlike [[cache]] frames the result cannot recompute after
    * [[OperatorCaches.releaseAll]] — consume it within the pass. */
  def checkpointed(df: DataFrame): DataFrame = trackedCheckpoint(df)
}
