package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the batch twin of
  * `streaming.EventStreams.sessionize` (flatMapGroupsWithState): events of
  * one key are split into sessions wherever the gap to the previous event
  * exceeds `gapSeconds`.
  *
  * Algorithm: one window pass per key ordered by (ts, tiebreak) — `lag` to
  * find the gap, a running `sum` of the new-session indicator to number the
  * sessions. Both window functions share one `Window` spec, so the physical
  * plan carries a single hash-partition exchange on the key plus a per-
  * partition sort: the canonical islands-and-gaps shape, linear at any
  * scale because state never leaves the key's partition.
  *
  * The caller supplies a tiebreak column that makes the per-key order
  * total; without it, equal timestamps make `lag` (and therefore session
  * boundaries) nondeterministic across runs.
  */
object Sessionize {

  /** Append a `session_id` column (0-based per key, ordered by time). */
  def assign(df: DataFrame, keyCols: Seq[String], tsCol: String,
             gapSeconds: Long, tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol) +: tiebreak: _*)
    val prev = lag(col(tsCol), 1).over(w)
    // second-granularity gap via truncating casts: floor(ts)-floor(prev),
    // matching DuckDB date_diff('second', ...) boundary counting
    val newSession = when(
      prev.isNull ||
        (col(tsCol).cast("long") - prev.cast("long")) > gapSeconds,
      1L).otherwise(0L)
    // explicit ROWS frame: the default RANGE frame would pool peer rows
    // when timestamps tie, breaking the running numbering
    df.withColumn("session_id",
      sum(newSession)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - 1)
  }

  /** One row per (key, session): bounds, event count, value sum. */
  def aggregate(df: DataFrame, keyCols: Seq[String], tsCol: String,
                gapSeconds: Long, tiebreak: Seq[Column],
                valueCol: String): DataFrame =
    assign(df, keyCols, tsCol, gapSeconds, tiebreak)
      .groupBy((keyCols :+ "session_id").map(col): _*)
      .agg(min(tsCol).as("session_start"), max(tsCol).as("session_end"),
        count(lit(1)).as("n_events"), sum(valueCol).as("value_sum"))
}
