package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only deletion ledger for persisted index layouts — the
  * right-to-be-forgotten primitive shared by index kinds: a delete is
  * one tiny parquet append naming the ids, the data files are never
  * rewritten on the delete path, reads anti-join the ledger, and a
  * vacuum pass physically rewrites and clears EXACTLY the ledger files
  * it consumed (single-enumeration discipline: one file listing feeds
  * both the anti-join and the end-of-pass cleanup, so a tombstone
  * landing mid-pass is neither applied nor deleted — it survives to the
  * next pass while reads keep masking its id).
  *
  * Layout: flat `*.parquet` appends under the ledger root for batch
  * deletes; streaming deletes may write batch-scoped SUBDIRECTORIES
  * (overwrite-by-placement idempotency) — one recursive enumeration
  * serves both. [[Similarity]] predates this helper and carries the
  * same contract inline (interleaved with its compaction markers);
  * [[PhraseSearch]] builds on this one.
  */
object TombstoneLedger {

  /** Append `ids` (single column, any name) to the ledger at `root` as
    * one distinct-deduped parquet file, stored under the column name
    * `id`. */
  def append(ids: DataFrame, root: String): Unit =
    ids.toDF("id").distinct()
      .coalesce(1).write.mode("append").parquet(root)

  /** EXACTLY-ONCE streaming append: the micro-batch's ids land in the
    * batch-scoped ledger dataset `<root>/<md5(tag)>-<batchId>` with
    * OVERWRITE, so a replayed batch (foreachBatch is at-least-once)
    * rewrites its own location instead of accreting ledger rows —
    * idempotency by placement, the same contract as
    * [[Similarity.deleteBatchDir]]. */
  def appendBatch(ids: DataFrame, root: String, tag: String,
                  batchId: Long): Unit =
    ids.toDF("id").distinct().coalesce(1).write.mode("overwrite")
      .parquet(s"$root/${tagHash(tag)}-$batchId")

  private def tagHash(tag: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes("UTF-8")).take(8)
      .map("%02x".format(_)).mkString

  /** Every parquet leaf file under the ledger — ONE enumeration, to be
    * reused for both the read and the consumed-set cleanup. */
  def files(fs: org.apache.hadoop.fs.FileSystem, root: String)
      : Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) return Nil
    val out = Seq.newBuilder[org.apache.hadoop.fs.Path]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) out += f.getPath
    }
    out.result()
  }

  /** The ledger read over an EXPLICIT file list (from [[files]]),
    * distinct ids under the caller's column name; None when empty. */
  def dfFrom(spark: SparkSession, fs: Seq[org.apache.hadoop.fs.Path],
             asCol: String): Option[DataFrame] =
    if (fs.isEmpty) None
    else Some(spark.read.parquet(fs.map(_.toString): _*)
      .select(col("id").as(asCol)).distinct())

  /** Convenience: enumerate-and-read in one step (for READ paths that
    * never clean up; vacuum passes must use [[files]] + [[dfFrom]]). */
  def df(spark: SparkSession, root: String, asCol: String)
      : Option[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    dfFrom(spark, files(fs, root), asCol)
  }

  /** Driver-side answer to "do pending tombstones exceed `threshold`?"
    * from the ledger files' parquet-footer row counts alone. Each file
    * is distinct-deduped at append time, so a SINGLE file's row count
    * bounds the distinct total from BELOW — one file over the threshold
    * proves DUE and short-circuits the scan (the deep-in-debt index the
    * janitor targets resolves on its first large footer, not after
    * reading every file); the files' SUM bounds it from above — sum ≤
    * threshold proves NOT due. Either way no Spark job runs (the
    * janitor's pass over a many-index serving tier must be
    * metadata-only). Returns None only for a threshold strictly inside
    * the [max-file, sum] sandwich — possible when re-deleted ids recur
    * across files — where the caller must pay the exact distinct
    * count. Driver IO is at most one footer read per ledger file,
    * bounded by the delete calls since the last vacuum. */
  def pendingExceeds(conf: org.apache.hadoop.conf.Configuration,
                     ledgerFiles: Seq[org.apache.hadoop.fs.Path],
                     threshold: Long): Option[Boolean] = {
    var sum = 0L
    val it = ledgerFiles.iterator
    while (it.hasNext) {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(it.next(), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val n = try r.getRecordCount finally r.close()
      if (n > threshold) return Some(true) // single-file lower bound
      sum += n
    }
    if (sum <= threshold) Some(false) else None
  }

  /** Delete exactly the consumed files, then drop batch-scoped subdirs
    * the pass emptied (a concurrent delete into a fresh dir survives; a
    * non-empty dir stays). */
  def clear(fs: org.apache.hadoop.fs.FileSystem, root: String,
            consumed: Seq[org.apache.hadoop.fs.Path]): Unit = {
    consumed.foreach(p => fs.delete(p, false))
    val p = new org.apache.hadoop.fs.Path(root)
    if (fs.exists(p))
      fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
        .filter(d => !fs.listStatus(d).exists(
          _.getPath.getName.endsWith(".parquet")))
        .foreach(d => fs.delete(d, true))
  }

  /** Reset the ledger entirely — a full index rebuild invalidates
    * standing tombstones (they refer to the pre-rebuild corpus). */
  def reset(fs: org.apache.hadoop.fs.FileSystem, root: String): Unit =
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
}
