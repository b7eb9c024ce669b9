package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated joins
  * and aggregations on the bucket key are exchange-free.
  *
  * At 100 TB this is the difference between shuffling the fact table per
  * query and shuffling it once per load: two tables bucketed on the same
  * key with the same bucket count sort-merge-join with ZERO Exchange —
  * verified by BucketingSpec against the physical plan.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
