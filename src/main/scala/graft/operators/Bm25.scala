package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Rounding.round4
import graft.functions.TextFunctions.tokens

/** BM25 lexical retrieval over a document corpus — the ranking half of a
  * dedup/decontamination/retrieval stack (tf-idf's big sibling: term
  * saturation via k1, length normalization via b).
  *
  * Scale shape: the corpus is never indexed wholesale. Query terms are
  * tiny and broadcast, so the exploded posting stream is PRUNED to query
  * terms at the scan side of the first exchange — tf aggregation, df
  * counting, and scoring all run over `docs-containing-query-terms` rows,
  * not the corpus vocabulary. Corpus-level constants (N, total token
  * count) are one scalar aggregate each; doc lengths ride the same
  * pruned join. Top-k per query is a rank window over the scored rows
  * (bounded by queries x matching docs), never over the corpus.
  *
  * Determinism contract: scores are double but each per-(query,doc) sum
  * folds at most the query's term count (callers keep queries short; the
  * gate uses 2-term queries, and 2-addend IEEE sums are order-exact);
  * final scores round to 4 dp BEFORE ranking, doc id breaks ties.
  */
object Bm25 {

  /** Top-`k` documents per query. `queries`: (query_id, term) rows —
    * multi-term queries contribute one row per term. Returns
    * (query_id, doc_id, score, rank). */
  def topK(docs: DataFrame, queries: DataFrame, k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    // one scalar row: corpus size + mean doc length. INLINE since r19 —
    // the stats agg rides the scoring job as a broadcast cross-join of
    // one row (the exact shape the DuckDB oracle uses) instead of a
    // separate collect() action: one job where there were two, and no
    // driver sync point between the corpus scan and the scoring pass
    // (guide §1.2 / §5 — the values, and therefore every score bit,
    // are unchanged: same count/sum longs cast to double in the same
    // IEEE expression order as the old driver-side literals)
    val corpus = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("toks"))).as("n_tokens"))
    // empty corpus: a neutral avgdl keeps the (empty) pipeline NaN-free,
    // and the result schema stays the real plan's — no hardcoded types
    // that could diverge from the ids' actual types
    val withStats = (df: DataFrame) => df.join(broadcast(
      corpus.select(col("n_docs").cast("double").as("__ndocs"),
        when(col("n_docs") === 0 || col("n_tokens").isNull, 1.0)
          .otherwise(col("n_tokens").cast("double") / col("n_docs"))
          .as("__avgdl"))))
    val posting = toks
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .join(broadcast(queries.select("term").distinct()), "term")
    val tf = posting.groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = withStats(df).select(col("term"),
      log(lit(1.0) + (col("__ndocs") - col("df") + 0.5)
        / (col("df") + 0.5)).as("idf"))
    val termScore = withStats(tf.join(broadcast(idf), "term"))
      .withColumn("ts",
        col("idf") * col("tf") * (lit(k1) + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl"))))
    val scored = termScore
      .join(broadcast(queries), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(round4(sum(col("ts"))).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "doc_id", "score", "rank")
  }

  /** Number of term-hash partitions in a persisted index. */
  val IndexBuckets = 64

  /** Persist an inverted index for repeated retrieval: postings
    * (term, doc_id, dl, tf) PARTITIONED BY `term_bucket` =
    * hash(term) mod 64 — the high-query-volume complement to [[topK]]'s
    * scan+prune (same trade as Similarity.writeIndex: build once, then
    * every search reads only its query terms' buckets, ~1/64th of the
    * postings per term). A narrow `doclens` (doc_id, dl) dataset
    * carries the per-document lengths the corpus constants derive from
    * — DERIVED at search time rather than stored as a scalar, so
    * deletions ([[deleteFromIndex]]) correct n_docs/avgdl through the
    * SAME ledger anti-join that masks postings, with no stored-scalar
    * staleness window under any vacuum crash ordering. A term's
    * postings live entirely inside its bucket, so df computed from
    * probed buckets alone is exact (and from MASKED probed buckets,
    * exact over live documents). */
  def writeIndex(docs: DataFrame, dir: String): Unit = {
    writeDatasets(docs, dir, "overwrite")
    // a full rebuild resets the deletion ledger AND the streaming batch
    // dirs (pre-rebuild tombstones/batches refer to the old corpus, and
    // the fresh postings dir carries no compaction marker, so stale
    // batch dirs would otherwise resurrect as live — same contract as
    // the other indexes)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    TombstoneLedger.reset(fs, s"$dir/tombstones")
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/batches"), true)
  }

  /** Append a document batch into a standing [[writeIndex]] layout —
    * the nightly-crawl shape, O(batch) regardless of index size: the
    * standing corpus is never re-tokenized; the batch's postings land as
    * extra files inside the SAME term-bucket directories
    * (dynamic-partition append) and its doclens rows append alongside.
    * Because [[searchIndex]] DERIVES every corpus statistic — n_docs,
    * avgdl, df — from those two datasets at search time, an append
    * corrects all of them exactly (the mirror of how deletion corrects
    * them through the ledger anti-join): post-append scores equal a
    * fresh index over the grown corpus, with no stored-scalar staleness.
    * Batch ids may collide with standing ids only if the caller
    * re-ingests a document — the index stores postings, not doc rows, so
    * a re-ingest double-counts and the caller owns id discipline (same
    * contract as [[PhraseSearch.appendToIndex]]). */
  def appendToIndex(docs: DataFrame, dir: String): Unit =
    writeDatasets(docs, dir, "append")

  private def writeDatasets(docs: DataFrame, dir: String,
                            mode: String): Unit = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    toks.select(col("doc_id"), size(col("toks")).as("dl"))
      .write.mode(mode).parquet(s"$dir/doclens")
    // cluster rows toward their bucket dir, but NOT on term_bucket
    // alone — that would cap the write at IndexBuckets tasks. The
    // second hash slice keeps every core writing while bounding the
    // layout to `slices` files per bucket dir (same shape as
    // Similarity's clustered index writes).
    val slices = math.max(1,
      docs.sparkSession.sparkContext.defaultParallelism / IndexBuckets)
    toks
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .withColumn("term_bucket",
        pmod(hash(col("term")), lit(IndexBuckets)))
      .repartition(IndexBuckets * slices, col("term_bucket"),
        pmod(hash(col("doc_id")), lit(slices)))
      .write.mode(mode).partitionBy("term_bucket")
      .parquet(s"$dir/postings")
  }

  /** EXACTLY-ONCE streaming ingestion: one micro-batch lands under
    * `batches/<tagHash>/<batchId>` with OVERWRITE (idempotent placement
    * — the in-place [[appendToIndex]] would double-count under
    * foreachBatch replay), carrying BOTH datasets the index derives
    * everything from: `postings/` (term-bucket-partitioned, so lookups
    * prune batch dirs too) and `doclens/` — the batch's documents
    * correct n_docs/avgdl/df exactly the moment the batch commits,
    * because [[searchIndex]] derives the statistics from doclens ∪
    * batch doclens at search time. */
  def appendBatchDir(docs: DataFrame, dir: String, tag: String,
                     batchId: Long): Unit = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    val batchRoot =
      s"$dir/batches/${IndexBatches.tagHash(tag)}/$batchId"
    // two sub-datasets inside ONE batch dir: written postings-first,
    // doclens last — a crashed half-written batch is rewritten wholesale
    // by the replay (overwrite), never half-counted
    // clustered to the leaf (r19): the tf groupBy leaves the frame
    // hash-partitioned by (term, doc_id), so an unclustered dynamic
    // write emits up to tasks × buckets tiny files per micro-batch,
    // each taxing every later union-read (guide §6); the doclens rows
    // of one micro-batch are one small file by construction
    toks
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .withColumn("term_bucket",
        pmod(hash(col("term")), lit(IndexBuckets)))
      .repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$batchRoot/postings")
    toks.select(col("doc_id"), size(col("toks")).as("dl"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$batchRoot/doclens")
  }

  /** Fold live streaming batch directories into the base layout.
    *
    * Two datasets cannot swap atomically, so no ordering alone closes
    * the window where one has folded the batches and the other's
    * liveness decision (the marker in POSTINGS) hasn't committed —
    * whichever order, a crash inside it would leave stats permanently
    * double-counting or missing the batch. The contract that survives
    * EVERY interleaving is idempotence by natural key instead: a
    * document's (doc_id, dl) row and a term's (term, doc_id, dl, tf)
    * row are identical wherever they appear, so folding DEDUPLICATES on
    * those keys, and [[searchIndex]] applies the same dedup whenever
    * live batch dirs exist — a batch counted in both the base and a
    * still-live dir collapses back to one row. Order here (doclens
    * folds first, postings+marker commit last) just minimizes the
    * dedup-covered window; a half-crashed pass re-runs to the same
    * result because the folds are dedup-idempotent. */
  def compactIndexBatches(spark: org.apache.spark.sql.SparkSession,
                          dir: String): Unit = {
    val live = IndexBatches.live(spark, dir, "postings")
    if (live.isEmpty) return
    IndexBatches.foldAndPurge(spark, dir, "bm25", live, None, Nil,
      fusedDatasets)
  }

  /** The kind's [[IndexBatches.foldAndPurge]] parameters: doclens folds
    * flat with doc_id dedup (tiny — no repartition), postings folds
    * under the term-bucket layout with (term, doc_id) dedup and
    * carries the high-water marker (staged/swapped last). */
  private val fusedDatasets = Seq(
    IndexBatches.FusedDataset("doclens", Seq("doc_id", "dl"),
      Seq("doc_id"), None, 0, "doc_id"),
    IndexBatches.FusedDataset("postings",
      Seq("term", "doc_id", "dl", "tf", "term_bucket"),
      Seq("term", "doc_id"), Some("term_bucket"), IndexBuckets,
      "doc_id"))

  /** Append-only deletion (right-to-be-forgotten for the BM25 index):
    * `ids` (a `doc_id` column) land in the tombstone ledger; postings
    * stay on disk until [[vacuumIndex]], but [[searchIndex]] masks them
    * immediately AND corrects the corpus statistics — n_docs, avgdl,
    * and df are all computed over LIVE documents only, so post-delete
    * scores equal a fresh index over the filtered corpus exactly. One
    * tiny parquet append regardless of index size. */
  def deleteFromIndex(ids: DataFrame, dir: String): Unit =
    TombstoneLedger.append(ids.select(col("doc_id")), s"$dir/tombstones")

  /** Test seam: runs after [[vacuumIndex]] snapshots the ledger file
    * list — the race window a concurrent [[deleteFromIndex]] lands in.
    * Production no-op. */
  private[graft] var vacuumAfterSnapshotHook: () => Unit = () => ()

  /** Physically remove tombstoned documents from BOTH index datasets,
    * then clear exactly the consumed ledger files. With no live
    * streaming batch dirs: postings via [[SelectiveVacuum]] — only the
    * term buckets CONTAINING a tombstoned document's postings are
    * rewritten and leaf-swapped (O(affected buckets), not O(index)) —
    * and the small doclens dataset behind a full staged swap. With
    * live batch dirs the fold already forces a full staged rewrite of
    * both datasets, so the purge FUSES into it — (base ∪ batches)
    * dedup ∖ ledger, ONE rewrite per dataset, each byte written once
    * ([[IndexBatches.foldAndPurge]]; a streamed-then-deleted doc still
    * resolves DELETED because the ledger snapshot covers the folded
    * batches). Any crash ordering stays consistent: the corpus
    * constants derive from doclens∖ledger and postings read as
    * postings∖ledger, so whichever dataset swapped first, a search
    * still scores the live corpus exactly. Returns postings rows
    * removed (POST-DEDUP logical rows on the fused path — a
    * re-ingested document's duplicate postings collapse in the fold
    * regardless of the purge). */
  def vacuumIndex(spark: org.apache.spark.sql.SparkSession,
                  dir: String): Long = {
    val root = s"$dir/tombstones"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val consumed = TombstoneLedger.files(fs, root)
    val ts = TombstoneLedger.dfFrom(spark, consumed, "doc_id")
      .getOrElse(return 0L)
    vacuumAfterSnapshotHook()
    val live = IndexBatches.live(spark, dir, "postings")
    val removed = if (live.isEmpty) {
      // the two datasets' independent job chains run concurrently
      // through the shared harness (wall-clock max, not sum); either
      // may commit first — reads stay exact throughout because every
      // corpus constant derives from doclens∖ledger and postings read
      // as postings∖ledger (the crash-ordering argument above).
      IndexBatches.concurrently[Long](spark, "bm25-vacuum", Seq(
        // postings: partition-selective — only the term buckets
        // CONTAINING a tombstoned document's postings are rewritten
        // and leaf-swapped (the compaction marker at the postings root
        // is untouched)
        "postings" -> { () =>
          SelectiveVacuum(spark,
            new org.apache.hadoop.fs.Path(s"$dir/postings"),
            "term_bucket", "doc_id", ts, slices = math.max(1,
              spark.sparkContext.defaultParallelism / IndexBuckets))
        },
        "doclens" -> { () =>
          val dlPath = new org.apache.hadoop.fs.Path(s"$dir/doclens")
          val tmpD = new org.apache.hadoop.fs.Path(s"$dir/.doclens.vacuum")
          val dlKeep = spark.read.parquet(dlPath.toString)
            .join(ts, Seq("doc_id"), "left_anti")
          // full purge: coalesce(1) so the unpartitioned write emits
          // one schema-preserving zero-row file (empty multi-partition
          // writes emit nothing and brick later reads)
          (if (dlKeep.isEmpty) dlKeep.coalesce(1) else dlKeep)
            .write.mode("overwrite").parquet(tmpD.toString)
          graft.sources.Formats.swapInto(fs, tmpD, dlPath)
          spark.catalog.refreshByPath(dlPath.toString)
          0L
        })).apply("postings")
    } else {
      IndexBatches.foldAndPurge(spark, dir, "bm25", live, Some(ts),
        Seq("doc_id"), fusedDatasets)
    }
    TombstoneLedger.clear(fs, root, consumed)
    removed
  }

  /** Search a persisted [[writeIndex]] index — result-identical to
    * running [[topK]] over the original corpus (Bm25Spec pins it), but
    * the scan touches only the query terms' partitions: the bucket
    * filter is a partition filter, so non-matching directories are never
    * opened.
    *
    * Bounded-driver contract: the partition-pruning path enumerates the
    * distinct query terms driver-side, so it only runs when a cheap
    * `limit(maxTerms+1)` probe confirms the term set is small. Beyond
    * the cap the search stays fully distributed — a shuffle join of the
    * postings against the distinct-term frame (no driver collect, no
    * broadcast of the big query side) — trading partition pruning for
    * unbounded query volume with identical results (Bm25Spec pins the
    * equivalence). */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                  queries: DataFrame, k: Int,
                  k1: Double = 1.2, b: Double = 0.75,
                  maxTerms: Int = 65536): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ledger = TombstoneLedger.df(spark, s"$dir/tombstones", "doc_id")
    // live streaming batch dirs union in transparently; whenever any
    // exist, BOTH datasets deduplicate on their natural keys — a batch
    // present in the base AND a still-live dir (the compaction crash
    // window) collapses back to one row, so statistics never
    // double-count under any swap interleaving
    val liveDirs = IndexBatches.live(spark, dir, "postings")
    // corpus constants from doclens MINUS the ledger — the same mask
    // the postings get, so deletions correct n_docs/avgdl/df exactly
    // and post-delete scores equal a fresh index over the live corpus
    val dCols = Seq("doc_id", "dl").map(col)
    val doclens0raw = liveDirs.foldLeft(
        spark.read.parquet(s"$dir/doclens").select(dCols: _*)) { (acc, p) =>
      acc.union(spark.read.parquet(s"$p/doclens").select(dCols: _*))
    }
    val doclens0 =
      if (liveDirs.isEmpty) doclens0raw
      else doclens0raw.dropDuplicates("doc_id")
    val doclens = ledger
      .map(ts => doclens0.join(ts, Seq("doc_id"), "left_anti"))
      .getOrElse(doclens0)
    // INLINE since r19 (same move as [[topK]]): the corpus-constant agg
    // rides the scoring job as a one-row broadcast cross-join instead
    // of a separate collect() action — one job fewer per search, no
    // driver sync between the doclens scan and scoring, identical
    // values bit for bit. An index written from an empty corpus has
    // n_docs = 0 and a NULL token sum — same neutral-avgdl guard as
    // topK, empty result flows.
    val withStats = (df: DataFrame) => df.join(broadcast(
      doclens.agg(count(lit(1)).as("n_docs"),
          sum(col("dl")).as("n_tokens"))
        .select(col("n_docs").cast("double").as("__ndocs"),
          when(col("n_docs") === 0 || col("n_tokens").isNull, 1.0)
            .otherwise(col("n_tokens").cast("double") / col("n_docs"))
            .as("__avgdl"))))
    val qTermDf = queries.select("term").distinct()
    // ONE bounded collect decides the strategy AND supplies the term
    // list (r19 — the previous shape paid a separate limit+count job
    // before re-collecting the same rows for the pruning path)
    val qTermProbe = qTermDf.limit(maxTerms + 1).collect()
    val smallQ = qTermProbe.length <= maxTerms
    val pCols = Seq("term", "doc_id", "dl", "tf", "term_bucket").map(col)
    val raw = liveDirs.foldLeft(
        spark.read.parquet(s"$dir/postings").select(pCols: _*)) { (acc, p) =>
      acc.union(spark.read.parquet(s"$p/postings").select(pCols: _*))
    }
    val postings = ledger
      .map(ts => raw.join(ts, Seq("doc_id"), "left_anti"))
      .getOrElse(raw)
    val pruned =
      if (smallQ) {
        val qTerms = qTermProbe.map(_.getString(0))
        val buckets = qTerms.map(TermBuckets.of(_, IndexBuckets)).distinct
        postings
          .where(col("term_bucket").isin(buckets.map(Integer.valueOf): _*))
          .where(col("term").isin(qTerms: _*))
      } else {
        postings.join(qTermDf, "term")
      }
    // dedup AFTER pruning — the shuffle covers query-term rows only
    val tf =
      if (liveDirs.isEmpty) pruned
      else pruned.dropDuplicates("term", "doc_id")
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = withStats(df).select(col("term"),
      log(lit(1.0) + (col("__ndocs") - col("df") + 0.5)
        / (col("df") + 0.5)).as("idf"))
    val termScore = withStats(tf.join(broadcast(idf), "term"))
      .withColumn("ts",
        col("idf") * col("tf") * (lit(k1) + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl"))))
    val scored = termScore
      .join(if (smallQ) broadcast(queries) else queries, Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(round4(sum(col("ts"))).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "doc_id", "score", "rank")
  }
}
