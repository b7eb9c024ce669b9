package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.filter2.compat.{FilterCompat, RowGroupFilter}
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet bloom-filter layout: split-block bloom filters written into the
  * column chunks of selected columns, so point/IN predicates skip row
  * groups whose min/max zones are useless (high-cardinality unsorted keys
  * — exactly where zone maps fail: every group's [min,max] spans the whole
  * domain, but a bloom answers "definitely not here" per group).
  *
  * Complements the zone-map/Z-order family (`operators.Analyze`,
  * `expressions.ZOrder62`): clustering buys range pruning on the sort
  * key(s); blooms buy membership pruning on everything else without
  * rewriting the layout. At 100 TB the two compose — cluster on the scan
  * dimension, bloom the join/lookup keys.
  *
  * The write side is plain Spark options (parquet-mr owns the format);
  * the reader-side row-group skip is equally built in
  * (`parquet.filter.bloom.enabled`, default true — a pushed `=`/`IN`
  * predicate consults the bloom per group). The diagnostics here read
  * footers directly so specs can PROVE the filters exist and prune,
  * rather than trusting the option took.
  */
object ParquetBloom {

  /** Write `df` with split-block bloom filters on `bloomCols`.
    * `rowGroupBytes` bounds the row-group size (small groups here so
    * local fixtures get multiple groups per file; at scale the default
    * 128 MB stands). `ndv` sizes each filter for the expected distinct
    * count — oversizing wastes footer bytes, undersizing inflates the
    * false-positive rate toward useless. */
  def writeWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                     rowGroupBytes: Long = 1L << 20,
                     ndv: Long = 10000L): Unit =
    bloomCols.foldLeft(
      df.write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", rowGroupBytes.toString)) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }.parquet(path)

  private def parquetFiles(spark: SparkSession, dir: String): Seq[Path] = {
    val hPath = new Path(dir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(hPath).toSeq.map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
  }

  /** Per (file, rowGroup): does `column`'s chunk carry a bloom filter,
    * and does that filter say "maybe contains" for each probe key?
    * Diagnostic surface for specs — footer-only reads, driver-side,
    * bounded by file count. */
  def bloomMaybeContains(spark: SparkSession, dir: String, column: String,
                         probes: Seq[Long])
      : Seq[(String, Int, Long, Boolean, Boolean)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    parquetFiles(spark, dir).flatMap { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap {
          case (block, gi) =>
            val chunk = block.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .getOrElse(throw new IllegalArgumentException(
                s"no column $column in ${p.getName}"))
            val hasBloom = chunk.getBloomFilterOffset >= 0
            val bloom =
              if (hasBloom)
                Option(reader.getBloomFilterDataReader(block)
                  .readBloomFilter(chunk))
              else None
            probes.map { k =>
              val maybe = bloom.exists(b => b.findHash(b.hash(k)))
              (p.getName, gi, k, hasBloom, maybe)
            }
        }
      } finally reader.close()
    }
  }

  /** (kept, total) row groups across the dir once BLOOMFILTER-level
    * row-group filtering is applied for `column = key` — the pruning a
    * pushed point predicate gets at scan time, measured directly. */
  def filteredRowGroups(spark: SparkSession, dir: String, column: String,
                        key: Long): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val pred: FilterPredicate =
      FilterApi.eq(FilterApi.longColumn(column), java.lang.Long.valueOf(key))
    val levels = java.util.Arrays.asList(
      RowGroupFilter.FilterLevel.BLOOMFILTER)
    parquetFiles(spark, dir).foldLeft((0, 0)) { case ((kept, total), p) =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val blocks = reader.getFooter.getBlocks
        val surviving = RowGroupFilter.filterRowGroups(
          levels, FilterCompat.get(pred), blocks, reader)
        (kept + surviving.size, total + blocks.size)
      } finally reader.close()
    }
  }
}
