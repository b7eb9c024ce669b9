package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2 family A): the reference lands scraped
  * rows via per-row INSERTs (A7), a CSV dump path (A8), and truncate-reload
  * (A9). The Spark-native shapes are batch columnar writes — one atomic
  * commit per table per run instead of 5,000 autocommits.
  *
  * Scale notes: every writer takes partition columns — at 100 TB the
  * load-date partitioning is what makes SCD2 history pruning and
  * incremental re-loads O(changed partition), not O(table).
  */
object Formats {

  /** Snapshot reader with declared schema (the landing contract): schema
    * mismatches surface at analysis, not mid-job. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** A7: the row-insert sink becomes a batch append. */
  def append(df: DataFrame, path: String,
             partitionBy: Seq[String] = Nil): Unit =
    write(df, path, SaveMode.Append, partitionBy)

  /** A9: truncate-and-reload becomes one atomic overwrite. */
  def overwrite(df: DataFrame, path: String,
                partitionBy: Seq[String] = Nil): Unit =
    write(df, path, SaveMode.Overwrite, partitionBy)

  private def write(df: DataFrame, path: String, mode: SaveMode,
                    partitionBy: Seq[String]): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** A8: the deprecated CSV dump path, kept for capability parity. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Small-files compaction: rewrite a parquet dataset into files of
    * roughly `targetBytes` each, atomically (write to `path + ".compact"`,
    * then swap). Incremental appends (A7) accumulate one file per commit
    * per partition; at 100 TB the resulting footer/open overhead dominates
    * scan time long before data volume does. File count is derived from
    * the dataset's actual on-disk size, and the rewrite is a coalesce —
    * no shuffle — unless `sortBy` asks for a clustering order (e.g. a
    * [[graft.expressions.ZOrder62]] key), which range-partitions instead.
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long,
              sortBy: Seq[org.apache.spark.sql.Column] = Nil): Long = {
    import org.apache.hadoop.fs.Path
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1, (onDisk + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(path)
    val arranged =
      if (sortBy.nonEmpty) df.repartitionByRange(nFiles, sortBy: _*)
      else df.coalesce(nFiles)
    val tmp = new Path(path + ".compact")
    arranged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(hPath, true)
    fs.rename(tmp, hPath)
    nFiles.toLong
  }
}
