package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once streaming batch directories for persisted indexes — the
  * machinery Similarity's ANN index introduced, factored out (the same
  * move as [[TombstoneLedger]]) so every index kind shares ONE
  * implementation of the contract:
  *
  *   - a micro-batch lands in `<dir>/batches/<md5(tag)>/<batchId>` with
  *     OVERWRITE — foreachBatch is at-least-once, and a replayed batch
  *     REWRITES its own location instead of double-appending
  *     (idempotency by placement, no hot-path marker);
  *   - readers union the LIVE batch dirs — those above the compaction
  *     high-water marker — into the base dataset;
  *   - compaction folds live dirs into the base layout behind the
  *     caller's crash-safe staged rewrite, carrying the marker
  *     (`_compacted_batches`: tag-hash → highest folded batchId) INSIDE
  *     the staged directory so it commits atomically with the data it
  *     describes; batch-dir deletion afterwards is best-effort — a
  *     crash between swap and delete leaves dirs the marker already
  *     suppresses, never a double count.
  */
object IndexBatches {

  def tagHash(tag: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes("UTF-8")).take(8)
      .map("%02x".format(_)).mkString

  /** (tagHash, batchId) of a batch dir path, None for foreign files. */
  def batchDirKey(p: String): Option[(String, Long)] = {
    val parts = p.split('/')
    if (parts.length < 2) return None
    try Some((parts(parts.length - 2), parts(parts.length - 1).toLong))
    catch { case _: NumberFormatException => None }
  }

  /** Write one micro-batch dataset into its batch-scoped directory
    * (OVERWRITE — replays rewrite, never accrete), partitioned like the
    * base layout so partition pruning prunes batch dirs too. */
  def writeBatch(df: DataFrame, dir: String, tag: String, batchId: Long,
                 partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol)
      .parquet(s"$dir/batches/${tagHash(tag)}/$batchId")

  /** The compaction high-water marker stored inside `base`. The marker
    * is the ONLY thing suppressing already-folded batch dirs whose
    * best-effort delete failed: silently discarding it (or any valid
    * line) would resurrect those batches and double-count rows in every
    * subsequent read. Blank lines are tolerated; any other unparseable
    * line means real corruption — fail loudly rather than serve
    * duplicated data. */
  def readMarker(fs: org.apache.hadoop.fs.FileSystem,
                 base: org.apache.hadoop.fs.Path): Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(base, "_compacted_batches")
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8").split("\n")
      .filter(_.trim.nonEmpty)
      .map { ln =>
        ln.split("\t", 2) match {
          case Array(t, id) if scala.util.Try(id.trim.toLong).isSuccess =>
            t -> id.trim.toLong
          case _ => throw new IllegalStateException(
            s"corrupt compaction marker $p: unparseable line " +
              s"'${ln.take(80)}' — refusing to treat folded batches as " +
              "live (would double-count); repair or remove the marker")
        }
      }.toMap
    finally in.close()
  }

  /** Write the marker file into `into` (a staged directory about to be
    * swapped in, so the marker commits atomically with the data). */
  def writeMarker(fs: org.apache.hadoop.fs.FileSystem,
                  into: org.apache.hadoop.fs.Path,
                  hw: Map[String, Long]): Unit = {
    if (hw.isEmpty) return
    val out = fs.create(
      new org.apache.hadoop.fs.Path(into, "_compacted_batches"), true)
    try out.write(hw.map { case (t, id) => s"$t\t$id" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Merge standing high-waters with the batch dirs folded this pass. */
  def mergedMarker(fs: org.apache.hadoop.fs.FileSystem,
                   base: org.apache.hadoop.fs.Path,
                   folded: Seq[String]): Map[String, Long] = {
    val f = folded.flatMap(batchDirKey)
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).max }
    (readMarker(fs, base) ++ f)
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).max }
  }

  /** Batch directories not yet folded into `<dir>/<baseDataset>`. */
  def live(spark: SparkSession, dir: String,
           baseDataset: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/batches")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val hw = readMarker(fs,
      new org.apache.hadoop.fs.Path(s"$dir/$baseDataset"))
    fs.listStatus(root).filter(_.isDirectory).toSeq.flatMap { tagDir =>
      fs.listStatus(tagDir.getPath).filter(_.isDirectory).toSeq
        .map(_.getPath.toString)
        .filter(p => batchDirKey(p) match {
          case Some((t, id)) => hw.get(t).forall(id > _)
          case None => false
        })
    }.sorted
  }
}
