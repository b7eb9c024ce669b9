package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application: fold an ordered changelog (inserts /
  * updates / deletes, each stamped with a log sequence number) into a
  * base snapshot — the batch MERGE a lakehouse table format runs when a
  * CDC stream lands. Complements the SCD2 engine ([[graft.engine.Scd2]]):
  * SCD2 compares two full snapshots and historizes; CDC apply replays a
  * DELTA of row-level events and produces the current state, never
  * needing the source to re-ship unchanged rows — at 100 TB the
  * difference between scanning the world and scanning a day's changes.
  */
object Cdc {

  /** Apply `changes` to `snapshot`: per primary key the HIGHEST-`lsnCol`
    * change wins (last-writer-wins); a winning 'D' removes the key, a
    * winning 'I'/'U' replaces (or inserts) the row with the change's
    * payload columns; keys the log never mentions pass through untouched.
    * Change rows must carry the snapshot's columns plus (`lsnCol`,
    * `opCol`); `opCol` values outside I/U/D fail loudly rather than
    * silently dropping events.
    *
    * (pk, lsn) must be unique — two ops on one key at one LSN have no
    * defined order, so the operator REFUSES (loud `require`) instead of
    * picking one: a CDC feed that emits duplicate sequence numbers is
    * broken upstream and silently resolving it would make replays
    * non-deterministic.
    *
    * Scale shape: one shuffle of the (day-sized) changelog for the
    * per-key argmax, one shuffle of the snapshot for the anti join on pk
    * — both keyed identically, so AQE plans them as one exchange family;
    * nothing is ever collected, and the output is exactly
    * `unchanged ∪ upserted`. */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
                     pk: Seq[String], lsnCol: String = "lsn",
                     opCol: String = "op"): DataFrame = {
    require(pk.nonEmpty, "need at least one primary-key column")
    val payload = snapshot.columns.toSeq
    val badOps = changes.select(col(opCol))
      .where(!col(opCol).isin("I", "U", "D")).limit(1).collect()
    require(badOps.isEmpty,
      s"changelog has op '${badOps.headOption.map(_.get(0)).orNull}' " +
        "outside I/U/D")
    val dupLsn = changes.groupBy((pk :+ lsnCol).map(col): _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") > 1).limit(1).collect()
    require(dupLsn.isEmpty,
      s"changelog is ambiguous: duplicate (pk, $lsnCol) " +
        s"${dupLsn.headOption.map(_.toSeq.init).getOrElse(Nil)}")
    val w = Window.partitionBy(pk.map(col): _*).orderBy(desc(lsnCol))
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
    val unchanged = snapshot.join(latest.select(pk.map(col): _*),
      pk, "left_anti")
    val upserted = latest.where(col(opCol) =!= "D")
      .select(payload.map(col): _*)
    unchanged.unionByName(upserted)
  }

  /** The inverse direction: derive the MINIMAL changelog that turns
    * `before` into `after` — 'I' for new keys, 'D' for vanished keys,
    * 'U' for keys whose non-pk payload differs (null-safe comparison, so
    * null→value and value→null both register). Round-trip contract
    * (CdcSpec): `applyChangelog(before, diffToChangelog(before, after))`
    * equals `after`. One full-outer join on pk — the snapshot-diff shape
    * `q_snapshot_diff` gates, emitted as replayable events. */
  def diffToChangelog(before: DataFrame, after: DataFrame,
                      pk: Seq[String], lsn: Long = 1L): DataFrame = {
    require(pk.nonEmpty, "need at least one primary-key column")
    val payload = after.columns.toSeq
    val attrs = payload.filterNot(pk.contains)
    val b = before.select(payload.map(c => col(c).as(s"__b_$c")): _*)
    val joined = after.join(b,
      pk.map(c => col(c) <=> col(s"__b_$c")).reduce(_ && _), "full_outer")
    val isNew = pk.map(c => col(s"__b_$c").isNull).reduce(_ && _)
    val isGone = pk.map(c => col(c).isNull).reduce(_ && _)
    val changed = attrs.map(c => !(col(c) <=> col(s"__b_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("op", when(isNew, "I").when(isGone, "D")
        .when(changed, "U"))
      .where(col("op").isNotNull)
      .select(payload.map(c =>
        when(col("op") === "D", col(s"__b_$c")).otherwise(col(c)).as(c)) :+
        col("op") :+ lit(lsn).as("lsn"): _*)
  }
}
