package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.asDouble

/** Persisted binary-sketch index — the materialized form of
  * [[Similarity.hammingTopK]] (reference behavior surveyed from the
  * binary-quantization serving pattern: FAISS's flat binary indexes and
  * the sign-random-projection LSH literature, Charikar STOC 2002): the
  * 64-bit hyperplane sign sketch is computed ONCE at write time and
  * stored as its own 8-bytes-per-vector dataset, so the search-time
  * first stage scans sketches only — at 100 TB of float64 embeddings
  * the sketch dataset is ~1.6 TB, a 64× scan reduction that no longer
  * pays the sketch computation per query batch. Full vectors live in a
  * second dataset bucketed by id hash, read only to exact-re-rank each
  * query's `shortlist` candidates (the fetch prunes to the candidates'
  * buckets at the scan).
  *
  * Layout: `sketches/` (vec_id, sig, bucket — flat, no partitioning:
  * the first stage is a deliberate full scan of the smallest possible
  * dataset) and `vectors/` (vec_id, vec) PARTITIONED by bucket =
  * pmod(hash(vec_id), [[Buckets]]).
  *
  * Lifecycle: the SIXTH index kind on the shared contracts —
  * streaming ingestion via [[appendBatchDir]]/[[compactIndexBatches]]
  * ([[IndexBatches]]: overwrite by (tag, batchId), read-side dedup on
  * vec_id while live dirs exist, marker inside the staged sketches
  * dir), deletion via the [[TombstoneLedger]] (masked before the
  * shortlist, physical at [[vacuumIndex]]), in-place growth via
  * [[appendToIndex]]. No quantizer to recenter — the plane table is
  * fixed, so append never drifts (the trade: no data-adaptive cells
  * either; that is what the IVF kinds are for).
  *
  * Ingest-id contract (shared by every index kind): a vec_id appears
  * in at most ONE logical version across base + batches. The read-side
  * dropDuplicates exists ONLY for the compaction crash window, where
  * the surviving copies are byte-identical (a folded-but-undeleted
  * batch dir), so any winner is the same row. RE-ingesting an existing
  * id with DIFFERENT data is unsupported until a compaction folds the
  * layouts: the sketches dedup and the vectors dedup pick winners
  * independently, so sig and vector could come from different versions
  * (inconsistent hamming vs score, nondeterministic results). Replace
  * a vector by [[deleteFromIndex]] + append under the same id, or
  * rebuild.
  *
  * Determinism: search is row-identical to [[Similarity.hammingTopK]]
  * over the same live corpus (same sketch expression, same integer
  * Hamming, same id tiebreaks, same rounded re-rank — SketchIndexSpec
  * pins it), so the driver gate shares the brute pipeline's hash-exact
  * DuckDB oracle rather than a recall flag.
  */
object SketchIndex {

  /** Bucket fanout of the vectors dataset (the re-rank fetch prune). */
  val Buckets = 64

  private def withSketch(vectors: DataFrame): DataFrame = {
    graft.expressions.HyperplaneSig64.register(vectors.sparkSession)
    vectors.select(col("vec_id").cast("long").as("vec_id"),
        asDouble(col("embedding")).as("vec"))
      .withColumn("sig", expr("hyperplane_sig64(vec)"))
      .withColumn("bucket", pmod(hash(col("vec_id")), lit(Buckets)))
  }

  /** Sketch-dataset file fanout: a handful of files, written through a
    * repartition EXCHANGE (never coalesce(1), which would propagate up
    * and serialize the whole read+sketch pipeline into one task — at
    * the scale the object doc claims, a single-threaded build). */
  private def sketchFanout(spark: SparkSession): Int =
    math.max(1, spark.sparkContext.defaultParallelism / 8)

  /** Build both datasets. A rebuild resets the deletion ledger and any
    * streaming batch dirs (they refer to the pre-rebuild corpus, and
    * the fresh sketches/ overwrite carries no high-water marker). */
  def writeIndex(vectors: DataFrame, dir: String): Unit = {
    val spark = vectors.sparkSession
    // cached: both dataset writes consume the sketch computation
    val vs = StagingCaches.cache(withSketch(vectors))
    try {
      vs.select("vec_id", "sig", "bucket")
        .repartition(sketchFanout(spark))
        .write.mode("overwrite").parquet(s"$dir/sketches")
      val slices = math.max(1,
        spark.sparkContext.defaultParallelism / Buckets)
      vs.select(col("vec_id"), col("vec"), col("bucket"))
        .repartition(Buckets * slices, col("bucket"),
          pmod(hash(col("vec_id")), lit(slices)))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$dir/vectors")
    } finally vs.unpersist()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/batches"), true)
    TombstoneLedger.reset(fs, s"$dir/tombstones")
  }

  /** In-place growth: new rows land as extra files (sketches flat,
    * vectors inside the standing bucket dirs). O(batch); the fixed
    * plane table means appends never degrade the sketch (nothing to
    * recenter). Batch id discipline is the caller's. */
  def appendToIndex(newVectors: DataFrame, dir: String): Unit = {
    // cached: both appended datasets consume the sketch computation;
    // coalesce(1) is right HERE — appends are micro-batch-sized by
    // contract, and the cache boundary stops the coalesce propagating
    // into the batch's own lineage
    val vs = StagingCaches.cache(withSketch(newVectors))
    try {
      vs.select("vec_id", "sig", "bucket")
        .coalesce(1).write.mode("append").parquet(s"$dir/sketches")
      vs.select(col("vec_id"), col("vec"), col("bucket"))
        .write.mode("append").partitionBy("bucket")
        .parquet(s"$dir/vectors")
    } finally vs.unpersist()
  }

  /** EXACTLY-ONCE streaming ingestion: one micro-batch lands BOTH
    * datasets under `batches/<tagHash>/<batchId>` with OVERWRITE —
    * idempotency by placement, the shared [[IndexBatches]] contract. */
  def appendBatchDir(newVectors: DataFrame, dir: String, tag: String,
                     batchId: Long): Unit = {
    val vs = StagingCaches.cache(withSketch(newVectors))
    try {
      val root = s"$dir/batches/${IndexBatches.tagHash(tag)}/$batchId"
      vs.select("vec_id", "sig", "bucket")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/sketches")
      // clustered to the leaf (r19): the cached frame is scan/shuffle-
      // partitioned, not bucket-partitioned — an unclustered dynamic
      // write emits up to tasks × buckets tiny files per micro-batch,
      // each taxing every later union-read (guide §6)
      vs.select(col("vec_id"), col("vec"), col("bucket"))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$root/vectors")
    } finally vs.unpersist()
  }

  /** The kind's [[IndexBatches.foldAndPurge]] parameters: vec_id-deduped
    * fold, vectors staged first, the high-water marker committing inside
    * the staged SKETCHES dir last (the deliberately-smallest dataset —
    * 8 B/vector — so its full rewrite is the cheap one). */
  private def fusedDatasets(spark: SparkSession) = Seq(
    IndexBatches.FusedDataset("vectors", Seq("vec_id", "vec", "bucket"),
      Seq("vec_id"), Some("bucket"), Buckets, "vec_id"),
    IndexBatches.FusedDataset("sketches", Seq("vec_id", "sig", "bucket"),
      Seq("vec_id"), None, sketchFanout(spark), "vec_id"))

  /** Fold live streaming batch dirs into both standing datasets with
    * vec_id dedup behind staged swaps; vectors first, the high-water
    * marker committing inside the staged SKETCHES dir last. */
  def compactIndexBatches(spark: SparkSession, dir: String): Unit = {
    val live = IndexBatches.live(spark, dir, "sketches")
    if (live.isEmpty) return
    IndexBatches.foldAndPurge(spark, dir, "sketch", live, None, Nil,
      fusedDatasets(spark))
  }

  /** Append-only deletion on the shared ledger: one tiny parquet
    * append; [[searchIndex]] masks immediately, [[vacuumIndex]] makes
    * it physical. */
  def deleteFromIndex(ids: DataFrame, dir: String): Unit =
    TombstoneLedger.append(ids.select(col("vec_id")), s"$dir/tombstones")

  /** Search the persisted index — row-identical to
    * [[Similarity.hammingTopK]] over the live corpus. The first stage
    * scans the 8-bytes-per-vector sketches dataset (live batch dirs
    * union in with vec_id dedup; the ledger anti-joins BEFORE the
    * shortlist window so a tombstoned vector never occupies a slot);
    * the exact re-rank fetches only the candidates' buckets,
    * row-filtered to the candidate ids — both prunes land at the
    * vectors scan. Bounded driver: the shortlist collect is
    * ≤ |Q|·shortlist rows, with a loud maxQ guard before it can grow
    * with the query side.
    *
    * maxQ CONTRACT (weakened deliberately at r19, ADVICE-acknowledged):
    * the bound rides the shortlist collect — a `limit(maxQ·shortlist+1)`
    * cap plus a distinct-query recheck — so the guarded quantity is the
    * DRIVER FOOTPRINT (shortlist rows collected), not raw query-table
    * rows. A query table whose surplus rows match no bucket passes, and
    * the broadcast of the (query_id, qsig) projection is then the
    * binding limit: an unbounded query table fails with Spark's loud
    * broadcast-size error rather than this require. The alternative
    * (a separate distinct-count probe on the query side) costs one extra
    * driver action per search on the hot path — rejected; batch callers
    * go through the documented search budget anyway. */
  def searchIndex(spark: SparkSession, dir: String, queries: DataFrame,
                  k: Int, shortlist: Int = 100,
                  maxQ: Int = 4096): DataFrame = {
    require(k > 0 && shortlist >= k,
      s"need shortlist ($shortlist) >= k ($k) > 0")
    require(shortlist <= 1000,
      s"shortlist ($shortlist) must stay within the WindowGroupLimit " +
        "threshold (1000)")
    graft.expressions.HyperplaneSig64.register(spark)
    val q = queries.select(col("vec_id").cast("long").as("query_id"),
        asDouble(col("embedding")).as("query_vec"))
      .withColumn("qsig", expr("hyperplane_sig64(query_vec)"))
    val liveDirs = IndexBatches.live(spark, dir, "sketches")
    val sCols = Seq("vec_id", "sig", "bucket").map(col)
    val sketches0 = liveDirs.foldLeft(
        spark.read.parquet(s"$dir/sketches").select(sCols: _*)) {
      (acc, p) =>
        acc.union(spark.read.parquet(s"$p/sketches").select(sCols: _*))
    }
    val sketches =
      if (liveDirs.isEmpty) sketches0
      else sketches0.dropDuplicates("vec_id")
    val ledger = TombstoneLedger.df(spark, s"$dir/tombstones", "vec_id")
    val liveSk = ledger
      .map(ts => sketches.join(ts, Seq("vec_id"), "left_anti"))
      .getOrElse(sketches)
    val wH = Window.partitionBy("query_id")
      .orderBy(asc("hamming"), asc("cand_id"))
    // one bounded collect (≤ |Q|·shortlist rows) serves the bucket
    // partition filter, the candidate row filter, and the re-rank's
    // (query, cand, hamming) pairs — the distributed derivation would
    // recompute the shortlist inside the fetch job. The maxQ bound
    // rides THIS collect (r19, the planTokenProbes pattern — a loud
    // `limit` cap at maxQ·shortlist rows plus a distinct-query recheck
    // from the collected rows) instead of paying a separate
    // limit+count guard job on the query side first; the worst-case
    // driver footprint is the same |Q ≤ maxQ|·shortlist bound as
    // before.
    val cap = maxQ * shortlist + 1
    val shortRows = liveSk
      .select(col("vec_id").as("cand_id"), col("sig"), col("bucket"))
      .join(broadcast(q.select("query_id", "qsig")),
        col("query_id") =!= col("cand_id"))
      .withColumn("hamming",
        bit_count(col("sig").bitwiseXOR(col("qsig"))).cast("int"))
      .withColumn("__h", row_number().over(wH))
      .where(col("__h") <= shortlist)
      .select("query_id", "cand_id", "hamming", "bucket")
      .limit(cap)
      .collect()
    require(shortRows.length < cap &&
        shortRows.iterator.map(_.getLong(0)).toSet.size <= maxQ,
      s"searchIndex query side exceeds maxQ=$maxQ rows — batch the queries")
    val buckets = shortRows.map(r => r.getInt(r.fieldIndex("bucket")))
      .distinct.toSeq
    val candIds = shortRows.map(r => r.getLong(r.fieldIndex("cand_id")))
      .distinct.toSeq
    val pairs = spark.createDataFrame(
      java.util.Arrays.asList(shortRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cand_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("hamming",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.IntegerType))))
      .drop("bucket")
    // candidate prune: the bucket list stays a literal partition filter
    // (≤ Buckets values), but the per-row id prune is a broadcast
    // SEMI-join against a local relation of the candidate ids — an isin
    // over candIds would embed up to |Q|·shortlist literals in the plan
    // (driver-side plan-size hazard at the documented bounds)
    val candDocs = spark.createDataFrame(
      java.util.Arrays.asList(candIds.map(
        org.apache.spark.sql.Row(_)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType))))
    val vCols = Seq("vec_id", "vec", "bucket").map(col)
    def bucketed(p: String) = spark.read.parquet(p).select(vCols: _*)
      .where(col("bucket").isin(buckets.map(Integer.valueOf): _*))
      .join(broadcast(candDocs), Seq("vec_id"), "left_semi")
    val fetched0 = liveDirs.foldLeft(bucketed(s"$dir/vectors")) {
      (acc, p) => acc.union(bucketed(s"$p/vectors"))
    }
    val fetched =
      (if (liveDirs.isEmpty) fetched0
       else fetched0.dropDuplicates("vec_id"))
        .select(col("vec_id").as("cand_id"), col("vec").as("cand_vec"))
    val wS = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("cand_id"))
    fetched.join(broadcast(pairs), "cand_id")
      .join(broadcast(q.select("query_id", "query_vec")), "query_id")
      .withColumn("score", graft.functions.Rounding.round4(
        graft.functions.VectorFunctions.cosine(
          col("query_vec"), col("cand_vec"))))
      .withColumn("rank", row_number().over(wS))
      .where(col("rank") <= k)
      .select("query_id", "cand_id", "hamming", "score", "rank")
  }

  /** Test seam: runs after [[vacuumIndex]] snapshots the ledger file
    * list — the race window a concurrent [[deleteFromIndex]] lands in.
    * Production no-op. */
  private[graft] var vacuumAfterSnapshotHook: () => Unit = () => ()

  /** Physically remove tombstoned vectors from BOTH datasets: the
    * bucket-partitioned vectors/ goes through [[SelectiveVacuum]]
    * (only buckets CONTAINING tombstoned ids are rewritten and
    * leaf-swapped — O(affected buckets), not O(index)); the flat
    * sketches/ is a full staged-swap rewrite BY DESIGN — it is the
    * deliberately-smallest dataset (8 B/vector) and carries the
    * compaction marker, so its rewrite is the cheap one. Live batch
    * dirs fold in first (vacuum clears the consumed ledger, so an
    * unfolded batch dir would resurface a tombstoned vector once
    * cleared), then exactly the consumed ledger files clear. Returns
    * rows removed. */
  def vacuumIndex(spark: SparkSession, dir: String): Long = {
    val root = s"$dir/tombstones"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val consumed = TombstoneLedger.files(fs, root)
    val tsOpt = TombstoneLedger.dfFrom(spark, consumed, "vec_id")
    if (tsOpt.isEmpty) { compactIndexBatches(spark, dir); return 0L }
    val ts = tsOpt.get
    vacuumAfterSnapshotHook()
    val live = IndexBatches.live(spark, dir, "sketches")
    val removed = if (live.isEmpty) {
      // no compaction debt: vectors rewrite stays partition-SELECTIVE
      // (only buckets containing tombstoned rows are touched), and the
      // two datasets' independent job chains run concurrently through
      // the shared harness (wall-clock max, not sum). The sketches
      // task STAGES only; marker carry and swap stay on the caller
      // thread after both chains finish.
      val path = new org.apache.hadoop.fs.Path(s"$dir/sketches")
      val res = IndexBatches.concurrently[Any](spark, "sketch-vacuum",
        Seq(
          "vectors" -> { () =>
            SelectiveVacuum(spark,
              new org.apache.hadoop.fs.Path(s"$dir/vectors"), "bucket",
              "vec_id", ts, slices = math.max(1,
                spark.sparkContext.defaultParallelism / Buckets)): Any
          },
          "sketches" -> { () =>
            val base = spark.read.parquet(path.toString)
            val keep = base.join(ts, Seq("vec_id"), "left_anti")
            val keepCount = keep.count()
            val n = base.count() - keepCount
            val tmp =
              new org.apache.hadoop.fs.Path(s"$dir/.sketches.vacuum")
            if (keepCount == 0L)
              keep.coalesce(1).write.mode("overwrite")
                .parquet(tmp.toString)
            else
              keep.repartition(sketchFanout(spark))
                .write.mode("overwrite").parquet(tmp.toString)
            (tmp, n): Any
          }))
      val (tmp, n) = res("sketches")
        .asInstanceOf[(org.apache.hadoop.fs.Path, Long)]
      // carry the compaction marker through the sketches rewrite
      IndexBatches.writeMarker(fs, tmp, IndexBatches.readMarker(fs, path))
      graft.sources.Formats.swapInto(fs, tmp, path)
      spark.catalog.refreshByPath(path.toString)
      n
    } else {
      // compaction debt AND vacuum debt: the fold already forces a full
      // staged rewrite of both datasets, so the purge FUSES into it —
      // (base ∪ batches) deduped ∖ ledger, ONE rewrite per dataset with
      // the removed count riding the sketches write job (the shared
      // [[IndexBatches.foldAndPurge]] machinery; running
      // compactIndexBatches first and purging after rewrote every byte
      // twice back to back — ~45% of the maintenance gate when
      // profiled). Crash contract unchanged: vectors swaps first, the
      // merged high-water marker commits inside the staged SKETCHES dir
      // last, batch dirs are deleted only after both swaps, and the
      // ledger clears last of all (an interruption anywhere leaves
      // reads correct — unfolded batch dirs still union in, the
      // standing ledger still masks). Returns post-dedup logical rows
      // removed (a re-ingested duplicate collapses in the fold
      // regardless of the purge).
      IndexBatches.foldAndPurge(spark, dir, "sketch", live, Some(ts),
        Seq("vec_id"), fusedDatasets(spark))
    }
    TombstoneLedger.clear(fs, root, consumed)
    removed
  }
}
