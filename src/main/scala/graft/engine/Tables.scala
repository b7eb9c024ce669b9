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
    * `events.ts` is written with nanosecond precision, which Spark's parquet
    * reader rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * (Verify.scala/Bench.scala) and this reader normalizes the long back to
    * a microsecond timestamp (`ts div 1000` — integer division, since nanos
    * since epoch exceed 2^53 and must never pass through a double).
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every testdata table as a temp view (SQL entry path: the
    * DuckDB oracle text is valid Spark SQL for ANSI queries). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    testdataNames.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
}
