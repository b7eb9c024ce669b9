package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IndexStats: the maintenance readout tracks the lifecycle it
  * describes — batches appear and fold, tombstones appear and clear,
  * file/byte/row counts stay truthful, and `due` flips exactly when
  * the thresholds say so. */
class IndexStatsSpec extends SparkSpec {

  import spark.implicits._

  test("stats and due track a sketch-index lifecycle end-to-end") {
    val emb = graft.engine.Tables.t(spark, sf001, "embeddings")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_idx_stats").toString
    SketchIndex.writeIndex(emb, dir)
    val ds = Seq("sketches", "vectors")
    def snap() = IndexStats.stats(spark, dir, ds)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val clean = snap()
    val n = emb.count()
    assert(clean("sketches")._4 == n && clean("vectors")._4 == n,
      "row counts must match the corpus")
    assert(clean.values.forall(r => r._2 > 0 && r._3 > 0),
      "file/byte counts must be positive")
    assert(clean.values.forall(r => r._5 == 0 && r._6 == 0),
      "clean index must show no live batches and no tombstones")
    assert(IndexStats.due(spark, dir, ds) == (false, false))
    // a streamed batch dir and two tombstones surface in the counters
    SketchIndex.appendBatchDir(
      emb.where(col("vec_id") < 2)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")),
      dir, "crawl", 0L)
    SketchIndex.deleteFromIndex(Seq(0L, 1L).toDF("vec_id"), dir)
    val dirty = snap()
    assert(dirty("sketches")._5 == 1, "live batch dir not counted")
    assert(dirty("sketches")._6 == 2, "pending tombstones not counted")
    assert(IndexStats.due(spark, dir, ds,
      maxLiveBatches = 0, maxTombstones = 1) == (true, true))
    // maintenance clears exactly what it should
    SketchIndex.compactIndexBatches(spark, dir)
    assert(snap()("sketches")._5 == 0, "compaction left live batches")
    assert(SketchIndex.vacuumIndex(spark, dir) > 0L)
    val after = snap()
    assert(after("sketches")._6 == 0, "vacuum left pending tombstones")
    assert(after("sketches")._4 == n, // 2 deleted, 2 appended survive
      "post-vacuum row count must be corpus - deleted + appended")
    assert(IndexStats.due(spark, dir, ds) == (false, false))
    // countRows = false skips the footer pass but keeps the counters
    val fast = IndexStats.stats(spark, dir, ds, countRows = false)
      .select("n_rows").as[Long].collect()
    assert(fast.forall(_ == -1L))
    // due()'s footer fast path must keep DISTINCT semantics in the
    // ambiguous sandwich: the same id deleted twice is two ledger
    // files of one row each — max-file 1, sum 2 — so a threshold of 1
    // sits strictly inside the sandwich (pendingExceeds = None) and
    // due() must fall through to the exact distinct count (ONE pending
    // tombstone → not due), while a threshold of 0 resolves due from a
    // single file's count alone and 2 resolves not-due from the sum
    SketchIndex.deleteFromIndex(Seq(5L).toDF("vec_id"), dir)
    SketchIndex.deleteFromIndex(Seq(5L).toDF("vec_id"), dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val lFiles = TombstoneLedger.files(
      new org.apache.hadoop.fs.Path(s"$dir/tombstones")
        .getFileSystem(conf), s"$dir/tombstones")
    assert(TombstoneLedger.pendingExceeds(conf, lFiles, 1L).isEmpty,
      "threshold inside the [max-file, sum] sandwich must be ambiguous")
    assert(TombstoneLedger.pendingExceeds(conf, lFiles, 0L)
      .contains(true), "a single 1-row file must prove due at 0")
    assert(TombstoneLedger.pendingExceeds(conf, lFiles, 2L)
      .contains(false), "sum 2 must prove not-due at threshold 2")
    assert(IndexStats.due(spark, dir, ds, maxTombstones = 1) ==
      (false, false),
      "a re-deleted id must not trip the vacuum threshold its " +
        "distinct count is under")
    assert(IndexStats.due(spark, dir, ds, maxTombstones = 0) ==
      (false, true))
  }
}
