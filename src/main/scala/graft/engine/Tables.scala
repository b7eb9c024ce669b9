package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver's synthetic testdata (TESTDATA.md) and for
  * reference-schema raw tables (FIXTURES.md §1).
  *
  * Every table is one parquet directory/file under an sf dir; at cluster
  * scale these become partitioned parquet datasets — the reader is the
  * same call, Catalyst handles partition pruning.
  */
object Tables {
  val testdataNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one testdata table from an sf dir.
    *
    * `events.ts` has shipped in two physical encodings across testdata
    * generations, and this reader normalizes BOTH to a tz-aware
    * microsecond [[org.apache.spark.sql.types.TimestampType]]:
    *
    *  - int64 nanoseconds: Spark's parquet reader rejects nano precision
    *    unless `spark.sql.legacy.parquet.nanosAsLong` is set (it is, in
    *    Verify/Bench sessions); the long is converted via `ts div 1000`
    *    (integer division — nanos since epoch exceed 2^53 and must never
    *    pass through a double).
    *  - `timestamp[us]` without timezone: Spark reads it as
    *    TIMESTAMP_NTZ, which none of the epoch-cast operators accept
    *    (`CAST(ts AS BIGINT)` / `unix_micros(ts)` fail analysis on NTZ).
    *    Sessions pin `spark.sql.session.timeZone=UTC`, so casting
    *    NTZ → TIMESTAMP is lossless: the wall-clock field values ARE the
    *    UTC instant.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Normalize the `ts` column of an events-shaped frame to TimestampType.
    * Exposed for specs that exercise both physical encodings directly. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register every testdata table as a temp view (SQL entry path: the
    * DuckDB oracle text is valid Spark SQL for ANSI queries). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    testdataNames.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
}
