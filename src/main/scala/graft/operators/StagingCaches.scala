package graft.operators

import org.apache.spark.sql.DataFrame

/** Tracked persists for QUERY-LAYER staging frames — intermediates a
  * query pipeline (not an operator) pins for one pass, e.g. the export
  * pipeline's scored-documents stage that both the dedup canon and the
  * sampling budget re-read. Unlike the cross-gate memoized fixtures
  * (TextQueries/VaultQueries staging, which pay for themselves across
  * many gates), these are per-call and must not outlive the pass:
  * [[OperatorCaches.releaseAll]] releases them with the operator caches,
  * so the driver's 200+-gate sessions never accumulate pinned blocks.
  */
object StagingCaches extends TrackedCaches {

  /** persist(MEMORY_AND_DISK) + register for session-wide release. */
  def cache(df: DataFrame): DataFrame = tracked(df)
}
