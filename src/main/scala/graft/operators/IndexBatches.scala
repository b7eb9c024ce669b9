package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    * base layout so partition pruning prunes batch dirs too.
    *
    * The rows are CLUSTERED to their partition value first (r19,
    * guide §6 small files): the upstream frame usually arrives hash-
    * partitioned by id (the assignment window / groupBy), so an
    * unclustered dynamic-partition write emits up to
    * tasks × |values| files — hundreds of KB-sized files for one
    * micro-batch, each charging a footer read + open cost to EVERY
    * subsequent search that unions the live dirs. One tiny extra
    * shuffle of the micro-batch bounds it to one file per leaf. */
  def writeBatch(df: DataFrame, dir: String, tag: String, batchId: Long,
                 partitionCol: String): Unit =
    df.repartition(col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol)
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

  /** One dataset of a [[foldAndPurge]] pass — the per-kind parameters
    * that used to vary across the hand-copied fused vacuums:
    *
    *   - `name`: the dataset subdirectory under the index dir (and, when
    *     `batchNested`, under each batch dir);
    *   - `columns`: the stored projection, including the partition
    *     column when the layout is partitioned;
    *   - `dedupKeys`: the natural key the fold deduplicates on across
    *     base ∪ batches (empty = the kind's contract has no read-side
    *     dedup — e.g. IVF-flat and phrase postings, where id discipline
    *     is the caller's);
    *   - `partitionCol`/`fanout`/`sliceKey`: the clustered-write
    *     discipline — dynamic-partitioned layouts repartition to
    *     fanout·slices on (partition, hash(sliceKey) % slices) so every
    *     core writes while the layout stays at `slices` files per leaf;
    *     flat layouts repartition to `fanout` files (`fanout <= 0` =
    *     leave the plan's partitioning as-is, for tiny datasets like
    *     BM25 doclens);
    *   - `batchNested`: whether a batch dir carries this dataset as a
    *     SUBDIRECTORY (multi-dataset kinds) or IS the dataset
    *     (single-dataset kinds, whose [[writeBatch]] wrote rows at the
    *     batch root). */
  final case class FusedDataset(name: String, columns: Seq[String],
                                dedupKeys: Seq[String],
                                partitionCol: Option[String], fanout: Int,
                                sliceKey: String,
                                batchNested: Boolean = true)

  /** Run independent Spark job chains concurrently — the staging
    * harness every fused vacuum shares (first written inline in MaxSim;
    * collapsed here when the third copy appeared). Discipline, not the
    * global pool + Await(Inf) shortcut: a DEDICATED pool sized to the
    * task count (blocking Spark actions on ExecutionContext.global
    * starve unrelated callers of the shared pool), a BOUNDED await (a
    * hung Spark job must not hang the maintenance pass forever —
    * `graft.vacuum.timeoutSec`, default 6 h, covers any plausible
    * rewrite), and fail-fast sibling CANCELLATION via per-pass job
    * groups (a failure in one task cancels the others' running jobs
    * instead of letting them burn the cluster). A single task runs
    * inline — no pool, no job-group ceremony. */
  private[operators] def concurrently[A](spark: SparkSession, kind: String,
      tasks: Seq[(String, () => A)]): Map[String, A] = {
    if (tasks.size == 1) return Map(tasks.head._1 -> tasks.head._2())
    val timeoutSec = spark.conf.getOption("graft.vacuum.timeoutSec")
      .map(_.toLong).getOrElse(21600L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      tasks.size,
      (r: Runnable) => {
        val t = new Thread(r, s"graft-$kind-vacuum")
        t.setDaemon(true); t
      })
    implicit val ec: scala.concurrent.ExecutionContextExecutorService =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val grp = s"graft-$kind-${java.util.UUID.randomUUID()}"
    try {
      val futures = tasks.map { case (name, f) =>
        scala.concurrent.Future {
          spark.sparkContext.setJobGroup(s"$grp-$name", s"$kind: $name",
            interruptOnCancel = true)
          try name -> f()
          finally spark.sparkContext.clearJobGroup()
        }
      }
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(timeoutSec,
          java.util.concurrent.TimeUnit.SECONDS)).toMap
      catch { case e: Throwable =>
        tasks.foreach { case (name, _) =>
          spark.sparkContext.cancelJobGroup(s"$grp-$name") }
        throw e
      }
    } finally pool.shutdown()
  }

  /** The fused fold∖ledger maintenance rewrite every persisted index
    * kind shares — ONE implementation of the shape SketchIndex, IvfPq
    * and MaxSim each hand-copied before round 19, now also serving the
    * IVF-flat, BM25 and phrase kinds' debt paths:
    *
    *   - with `ts = None` this is batch COMPACTION: fold live batch
    *     dirs into each base dataset ((base ∪ batches), deduped on the
    *     kind's natural key) behind crash-safe staged swaps;
    *   - with `ts = Some(ledger)` it is the vacuum-with-debt path: the
    *     purge FUSES into the same fold — (base ∪ batches) dedup ∖
    *     ledger, ONE staged rewrite per dataset, each byte written once
    *     (the old compact-then-vacuum shape rewrote both datasets twice
    *     back to back — ~45% of a maintenance gate's cost when
    *     profiled).
    *
    * Removed-row counting never adds wall-clock. (The tempting
    * alternative — `Dataset.observe` metrics riding the keep write
    * itself — does NOT work on this Spark: a V1 `DataFrameWriter`
    * action completes an Observation with an EMPTY row, because the
    * write's child plan executes under a nested execution whose
    * collected metrics the command-level listener event never sees;
    * verified empirically against 4.1.2 and in
    * `ObservationManager.tryComplete`'s bytecode, which completes any
    * registered observation found in `qe.logical` with `Row.empty` when
    * `qe.observedMetrics` lacks it.) Instead:
    *
    *   - kinds WITHOUT read-side dedup get a genuinely job-free count:
    *     removed = physical merged rows − staged keep rows, both from
    *     parquet FOOTER sums — base ∪ batch footers driver-side (the
    *     same metadata-only discipline as
    *     [[TombstoneLedger.pendingExceeds]]), staged footers bounded by
    *     the write fanout this pass itself chose;
    *   - kinds WITH dedup need the post-dedup distinct count, which no
    *     footer can give — that one id-column-pruned count job runs
    *     CONCURRENTLY with the staging rewrites, so its wall-clock
    *     hides entirely under max(rewrites) (the rewrites read strictly
    *     more bytes). The returned count is POST-DEDUP logical rows
    *     removed from the last dataset — when a re-ingested id left
    *     duplicate rows across base and batch dirs, physical rows can
    *     exceed it (the duplicates were collapsing in the fold
    *     regardless of the purge).
    *
    * Staging runs CONCURRENTLY across datasets ([[concurrently]] —
    * wall-clock max(datasets), not the sum, when single rewrites
    * underutilize the cluster); swaps are SEQUENTIAL in `datasets`
    * order with the marker dataset LAST: the merged high-water marker
    * commits INSIDE the last dataset's staged dir (atomic with the data
    * it describes), so a crash between swaps leaves the marker unset
    * and the batch dirs still live, where read-side dedup absorbs the
    * already-folded rows. Batch dirs are deleted only after every swap
    * (best-effort — the marker already suppresses survivors), and the
    * LEDGER IS NOT TOUCHED here: the caller clears exactly the files it
    * enumerated, after this returns (single-enumeration discipline — a
    * tombstone landing mid-pass survives and keeps masking).
    *
    * A full purge (no surviving rows) leaves each dataset in its
    * readable-AND-appendable empty layout: the staged dir is checked
    * for data leaves after the write (a dynamic-partition write of zero
    * rows emits none) and re-staged via the schema-carrying zero-row
    * forms the kinds already use. */
  def foldAndPurge(spark: SparkSession, dir: String, kind: String,
                   live: Seq[String], ts: Option[DataFrame],
                   tsKeys: Seq[String],
                   datasets: Seq[FusedDataset]): Long = {
    require(datasets.nonEmpty && live.nonEmpty,
      "foldAndPurge needs at least one dataset and one live batch dir")
    val hConf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hConf)
    def rawMergedOf(d: FusedDataset): DataFrame = {
      val sel = d.columns.map(col)
      live.foldLeft(
          spark.read.parquet(s"$dir/${d.name}").select(sel: _*)) {
        (acc, p) =>
          val bp = if (d.batchNested) s"$p/${d.name}" else p
          acc.union(spark.read.parquet(bp).select(sel: _*))
      }
    }
    def stage(d: FusedDataset): org.apache.hadoop.fs.Path = {
      // purge BEFORE dedup: tsKeys ⊆ dedupKeys for every dedup kind
      // (doc_id ⊆ (term,doc_id)/(doc_id,tok); vec_id/cand_id equal
      // their kinds' keys), so a dedup group is wholly tombstoned or
      // wholly live and the anti-join commutes with dropDuplicates —
      // identical keep set, but the dedup exchange never carries the
      // tombstoned rows (guide §2.3: shuffle fewer bytes; the anti-join
      // is a broadcast against the small ledger, applied at scan side)
      val merged0 = rawMergedOf(d)
      val purged = ts match {
        case None => merged0
        case Some(t) => merged0.join(t, tsKeys, "left_anti")
      }
      val keep =
        if (d.dedupKeys.nonEmpty) purged.dropDuplicates(d.dedupKeys)
        else purged
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/.${d.name}.compact")
      d.partitionCol match {
        case Some(part) =>
          val fanout = math.max(1, d.fanout)
          val slices = math.max(1,
            spark.sparkContext.defaultParallelism / fanout)
          keep.repartition(fanout * slices, col(part),
              pmod(hash(col(d.sliceKey)), lit(slices)))
            .write.mode("overwrite").partitionBy(part)
            .parquet(tmp.toString)
        case None =>
          (if (d.fanout > 0) keep.repartition(d.fanout) else keep)
            .write.mode("overwrite").parquet(tmp.toString)
      }
      // full-purge edge, detected from the staged dir itself (the
      // empty-keep decision no longer needs a pre-write count job): a
      // zero-row write emits no data leaves, which would brick later
      // reads on schema inference — re-stage the schema-carrying empty
      // layout (Filter(false) folds to an empty local relation, so the
      // fixup never re-runs the fold)
      val hasData = fs.exists(tmp) && fs.listStatus(tmp).exists { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      if (!hasData) d.partitionCol match {
        case Some(part) =>
          graft.sources.Formats.writeEmptyPartitioned(keep, part, fs, tmp)
        case None =>
          fs.delete(tmp, true)
          keep.where(lit(false)).coalesce(1)
            .write.mode("overwrite").parquet(tmp.toString)
      }
      tmp
    }
    val last = datasets.last
    // the count dataset is the LAST one (the marker carrier — the kinds'
    // documented "returns rows removed" dataset). With dedup the count
    // is a distinct-id job and joins the concurrent harness (hidden
    // under max(rewrites)); without dedup it resolves from footers
    // after staging, zero jobs.
    val countTask: Seq[(String, () => Any)] =
      if (ts.isDefined && last.dedupKeys.nonEmpty)
        // semi-join BEFORE the dedup (same commuting argument as the
        // keep path: tsKeys ⊆ dedupKeys, groups are wholly tombstoned
        // or wholly live) — the post-dedup removed count is identical,
        // but the distinct exchange carries only the TOMBSTONED rows'
        // keys instead of re-shuffling the whole merged corpus (the
        // old shape paid a second full-corpus dedup shuffle for a
        // count whose answer only involves the dead rows)
        Seq("__removed" -> (() => rawMergedOf(last)
          .select(last.dedupKeys.map(col): _*)
          .join(ts.get, tsKeys, "left_semi")
          .dropDuplicates(last.dedupKeys)
          .count()))
      else Nil
    val results = concurrently[Any](spark, kind,
      datasets.map(d => d.name -> (() => stage(d): Any)) ++ countTask)
    def tmpOf(d: FusedDataset) =
      results(d.name).asInstanceOf[org.apache.hadoop.fs.Path]
    val removed: Long = ts match {
      case None => 0L
      case Some(_) if last.dedupKeys.nonEmpty =>
        results("__removed").asInstanceOf[Long]
      case Some(_) =>
        // no read-side dedup: physical merged rows minus staged keep
        // rows, both from parquet footers (metadata-only — base and
        // batch footer IO is the same class as the janitor's
        // TombstoneLedger bounds; the staged side is bounded by this
        // pass's own write fanout)
        val mergedRows = parquetRowCount(fs, hConf,
          new org.apache.hadoop.fs.Path(s"$dir/${last.name}")) +
          live.map { p =>
            val bp = if (last.batchNested) s"$p/${last.name}" else p
            parquetRowCount(fs, hConf, new org.apache.hadoop.fs.Path(bp))
          }.sum
        mergedRows - parquetRowCount(fs, hConf, tmpOf(last))
    }
    writeMarker(fs, tmpOf(last), mergedMarker(fs,
      new org.apache.hadoop.fs.Path(s"$dir/${last.name}"), live))
    for (d <- datasets) {
      graft.sources.Formats.swapInto(fs, tmpOf(d),
        new org.apache.hadoop.fs.Path(s"$dir/${d.name}"))
      spark.catalog.refreshByPath(s"$dir/${d.name}")
    }
    live.foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    removed
  }

  /** Driver-side row count of a tiny metadata dataset (centroid /
    * codebook class — one or a few files by construction) from parquet
    * footers: the r19 replacement for the `read.parquet(...).count()`
    * Spark jobs the vacuum/fold paths used to launch just to derive a
    * write fanout — same value, zero jobs (guide §1.2: don't pay a
    * distributed action for driver-side metadata). */
  private[operators] def footerRows(spark: SparkSession,
                                    path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    // every caller derives a write fanout from a by-construction-present
    // metadata dataset — a missing dir means a corrupt index, and
    // proceeding with fanout clamped to 1 would hide it (ADVICE r19;
    // the old read.parquet(...).count() threw AnalysisException here)
    require(fs.exists(p),
      s"footerRows: metadata dataset missing at $path — corrupt index")
    parquetRowCount(fs, conf, p)
  }

  /** Driver-side row count of a parquet dataset from its file FOOTERS —
    * no Spark job; IO is one footer read per leaf file. The walk skips
    * hidden (`.`/`_`-prefixed) path components, matching Spark's reader
    * visibility — a crashed leaf swap's dot-prefixed rename-aside must
    * not count rows a scan would never see. */
  private def parquetRowCount(fs: org.apache.hadoop.fs.FileSystem,
                              conf: org.apache.hadoop.conf.Configuration,
                              root: org.apache.hadoop.fs.Path): Long = {
    if (!fs.exists(root)) return 0L
    def hidden(n: String) = n.startsWith(".") || n.startsWith("_")
    var sum = 0L
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (!hidden(n)) {
          if (st.isDirectory) walk(st.getPath)
          else if (n.endsWith(".parquet")) {
            val in = org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(st.getPath, conf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try sum += r.getRecordCount finally r.close()
          }
        }
      }
    walk(root)
    sum
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
