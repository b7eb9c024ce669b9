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

  /** [[checkpointed]] with LAZY materialization: the snapshot pins on
    * the caller's FIRST action over it instead of paying a dedicated
    * materialization job. Same release tracking and same
    * cannot-recompute-after-release contract; the caller owns running
    * an action before any input mutation it needs severing from (the
    * MaxSim search fuses its candidate-id collect with the
    * materialization this way — one job instead of two, severed before
    * the search returns). */
  def checkpointedLazy(df: DataFrame): DataFrame =
    trackedCheckpoint(df, eager = false)
}
