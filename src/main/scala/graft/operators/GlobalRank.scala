package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable global row numbering.
  *
  * The reference ranks with `row_number() over (order by ... desc)`
  * (mart/rating_slide.sql:7,20) — an empty-PARTITION window. Spark executes
  * that as a single-partition window: every row funnels through one task,
  * which is the canonical 100 TB cliff (SURVEY.md E35, §4.4).
  *
  * This operator computes the identical result distributed:
  * range-repartition + sort on the rank ordering (the same single exchange a
  * global ORDER BY pays), then `zipWithIndex` — which assigns contiguous
  * indices via per-partition counts, never funneling rows through one task.
  *
  * The ordering must be total (add a unique tiebreaker) for a deterministic
  * result — the same requirement the window form has.
  */
object GlobalRank extends TrackedCaches {

  def withRowNumber(df: DataFrame, rankCol: String, order: Seq[Column],
                    numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    // zipWithIndex runs TWO jobs (per-partition counts, then materialize);
    // persist the sorted frame so the upstream aggregation/sort/shuffle
    // executes once, not twice. Session-tracked: long-lived sessions call
    // [[GlobalRank.releaseCaches]] after consuming results.
    val sorted = tracked(df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*))
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, idx) =>
      Row.fromSeq(r.toSeq :+ (idx + 1))
    }
    spark.createDataFrame(ranked, schema)
  }
}
