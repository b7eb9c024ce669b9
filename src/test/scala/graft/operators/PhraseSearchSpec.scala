package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PhraseSearchSpec extends SparkSpec {

  import spark.implicits._

  private def phrases(ps: (Long, Seq[String])*) =
    ps.toDF("phrase_id", "terms")

  test("overlapping occurrences count individually") {
    val docs = Seq((1L, "a a a a"), (2L, "a b a")).toDF("doc_id", "text")
    val out = PhraseSearch.phraseHits(docs, phrases(10L -> Seq("a", "a")))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq((10L, 1L, 3L, 1L)))
  }

  test("a phrase with a repeated term matches only true windows") {
    val docs = Seq((1L, "x the big the big the y"),
      (2L, "the big dog")).toDF("doc_id", "text")
    val out = PhraseSearch
      .phraseHits(docs, phrases(1L -> Seq("the", "big", "the")))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L)),
      s"expected starts 2 and 4 in doc 1 only, got ${out.toSeq}")
  }

  test("prefix/suffix fragments and cross-doc sequences never match") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    assert(PhraseSearch
      .phraseHits(docs, phrases(1L -> Seq("beta", "gamma"))).count() == 0)
    assert(PhraseSearch
      .phraseHits(docs, phrases(2L -> Seq("alpha", "beta", "gamma")))
      .count() == 0)
  }

  test("multiple phrases attribute hits independently") {
    val docs = Seq((1L, "p q r"), (2L, "q r s"), (3L, "r s"))
      .toDF("doc_id", "text")
    val out = PhraseSearch.phraseHits(docs,
        phrases(1L -> Seq("p", "q"), 2L -> Seq("q", "r"),
          3L -> Seq("r", "s")))
      .orderBy("phrase_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L, 1L), (2L, 1L, 1L), (2L, 2L, 1L),
      (3L, 2L, 1L), (3L, 3L, 1L)))
  }

  test("positional postings are 1-based and lowercased") {
    val docs = Seq((1L, "  Hello   World  ")).toDF("doc_id", "text")
    val out = PhraseSearch.positionalPostings(docs)
      .orderBy("pos")
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.toSeq == Seq(("hello", 1L), ("world", 2L)))
  }

  test("the phrase join broadcasts the query side, never a cartesian") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = PhraseSearch.phraseHits(docs, phrases(1L -> Seq("a", "b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"phrase terms must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"phrase search fell back to all-pairs:\n$plan")
  }

  private val idxDocs = Seq(
    (1L, "a a a a b c"), (2L, "x the big the big the y"),
    (3L, "the big dog barks"), (4L, "unrelated filler words here"),
    (5L, "c b a a"))
  private val idxPhrases = Seq(1L -> Seq("a", "a"),
    2L -> Seq("the", "big", "the"), 3L -> Seq("b", "a"))

  test("searchIndex over a persisted index is result-identical to " +
      "phraseHits, on both the pruned and the distributed path") {
    val docs = idxDocs.toDF("doc_id", "text")
    val ph = phrases(idxPhrases: _*)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phrase_idx").toString
    PhraseSearch.writeIndex(docs, dir)
    val expected = PhraseSearch.phraseHits(docs, ph)
      .orderBy("phrase_id", "doc_id").collect().toSeq
    for (maxTerms <- Seq(65536, 1)) { // pruned path, then forced fallback
      val got = PhraseSearch.searchIndex(spark, dir, ph,
          maxTerms = maxTerms)
        .orderBy("phrase_id", "doc_id").collect().toSeq
      assert(got == expected,
        s"maxTerms=$maxTerms: $got != $expected")
    }
  }

  test("appendToIndex is indistinguishable from a full rebuild over " +
      "the union") {
    val standing = idxDocs.toDF("doc_id", "text")
    val batch = Seq((100L, "a a fresh batch doc"), (101L, "the big the end"))
      .toDF("doc_id", "text")
    val ph = phrases(idxPhrases: _*)
    val incDir = java.nio.file.Files
      .createTempDirectory("graft_phrase_idx_inc").toString
    val fullDir = java.nio.file.Files
      .createTempDirectory("graft_phrase_idx_full").toString
    PhraseSearch.writeIndex(standing, incDir)
    PhraseSearch.appendToIndex(batch, incDir)
    PhraseSearch.writeIndex(standing.union(batch), fullDir)
    val inc = PhraseSearch.searchIndex(spark, incDir, ph)
      .orderBy("phrase_id", "doc_id").collect().toSeq
    val full = PhraseSearch.searchIndex(spark, fullDir, ph)
      .orderBy("phrase_id", "doc_id").collect().toSeq
    assert(inc == full, s"append diverged from rebuild:\n$inc\n$full")
    assert(inc.exists(_.getLong(1) >= 100L),
      s"batch docs never surfaced: $inc")
  }

  test("deleteFromIndex masks immediately; vacuumIndex removes " +
      "physically with identical results") {
    val docs = idxDocs.toDF("doc_id", "text")
    val ph = phrases(idxPhrases: _*)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phrase_idx_del").toString
    PhraseSearch.writeIndex(docs, dir)
    PhraseSearch.deleteFromIndex(Seq(1L).toDF("doc_id"), dir)
    val masked = PhraseSearch.searchIndex(spark, dir, ph)
      .orderBy("phrase_id", "doc_id").collect().toSeq
    assert(!masked.exists(_.getLong(1) == 1L),
      s"tombstoned doc surfaced: $masked")
    val expected = PhraseSearch
      .phraseHits(docs.where(col("doc_id") =!= 1L), ph)
      .orderBy("phrase_id", "doc_id").collect().toSeq
    assert(masked == expected, s"mask != filtered scan:\n$masked\n$expected")
    val removed = PhraseSearch.vacuumIndex(spark, dir)
    assert(removed > 0, "vacuum removed no postings rows")
    val after = PhraseSearch.searchIndex(spark, dir, ph)
      .orderBy("phrase_id", "doc_id").collect().toSeq
    assert(after == expected, s"post-vacuum diverged:\n$after\n$expected")
    // ledger cleared: a second vacuum is a no-op
    assert(PhraseSearch.vacuumIndex(spark, dir) == 0L)
  }

  test("a tombstone landing inside vacuum's race window survives and " +
      "keeps masking") {
    val docs = idxDocs.toDF("doc_id", "text")
    val ph = phrases(idxPhrases: _*)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phrase_idx_race").toString
    PhraseSearch.writeIndex(docs, dir)
    PhraseSearch.deleteFromIndex(Seq(1L).toDF("doc_id"), dir)
    PhraseSearch.vacuumAfterSnapshotHook =
      () => PhraseSearch.deleteFromIndex(Seq(2L).toDF("doc_id"), dir)
    try PhraseSearch.vacuumIndex(spark, dir)
    finally PhraseSearch.vacuumAfterSnapshotHook = () => ()
    // the late tombstone was not consumed by the pass and still masks
    val got = PhraseSearch.searchIndex(spark, dir, ph)
      .orderBy("phrase_id", "doc_id").collect().toSeq
    val expected = PhraseSearch
      .phraseHits(docs.where(!col("doc_id").isin(1L, 2L)), ph)
      .orderBy("phrase_id", "doc_id").collect().toSeq
    assert(got == expected, s"late tombstone lost:\n$got\n$expected")
    // and the next vacuum applies it physically
    assert(PhraseSearch.vacuumIndex(spark, dir) > 0L)
  }

  test("a replayed streaming delete batch rewrites its ledger slot " +
      "instead of accreting") {
    val docs = idxDocs.toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phrase_idx_sdel").toString
    PhraseSearch.writeIndex(docs, dir)
    PhraseSearch.deleteBatchDir(Seq(1L).toDF("doc_id"), dir, "t", 0L)
    PhraseSearch.deleteBatchDir(Seq(1L).toDF("doc_id"), dir, "t", 0L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ledger = TombstoneLedger.files(fs, s"$dir/tombstones")
    assert(ledger.size == 1, s"replay accreted ledger files: $ledger")
    val expected = PhraseSearch
      .phraseHits(docs.where(col("doc_id") =!= 1L),
        phrases(idxPhrases: _*))
      .orderBy("phrase_id", "doc_id").collect().toSeq
    val got = PhraseSearch.searchIndex(spark, dir, phrases(idxPhrases: _*))
      .orderBy("phrase_id", "doc_id").collect().toSeq
    assert(got == expected)
  }

  test("streamed batch dirs are indistinguishable from a rebuild; a " +
      "replayed batch rewrites its slot; compaction folds and the " +
      "marker suppresses folded dirs") {
    val standing = idxDocs.toDF("doc_id", "text")
    val batch = Seq((100L, "a a fresh batch doc"), (101L, "the big the end"))
      .toDF("doc_id", "text")
    val ph = phrases(idxPhrases: _*)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phrase_idx_stream").toString
    val fullDir = java.nio.file.Files
      .createTempDirectory("graft_phrase_idx_stream_full").toString
    PhraseSearch.writeIndex(standing, dir)
    PhraseSearch.appendBatchDir(batch, dir, "crawl", 0L)
    // at-least-once replay: the SAME (tag, batch) rewrites its slot
    PhraseSearch.appendBatchDir(batch, dir, "crawl", 0L)
    PhraseSearch.writeIndex(standing.union(batch), fullDir)
    val full = PhraseSearch.searchIndex(spark, fullDir, ph)
      .orderBy("phrase_id", "doc_id").collect().toSeq
    val streamed = PhraseSearch.searchIndex(spark, dir, ph)
      .orderBy("phrase_id", "doc_id").collect().toSeq
    assert(streamed == full,
      s"streamed batch dirs diverged from rebuild:\n$streamed\n$full")
    // compaction folds the batch into the base and results are stable
    PhraseSearch.compactIndexBatches(spark, dir)
    val compacted = PhraseSearch.searchIndex(spark, dir, ph)
      .orderBy("phrase_id", "doc_id").collect().toSeq
    assert(compacted == full, "compaction changed search results")
    // a folded dir resurrected on disk is suppressed by the marker
    PhraseSearch.appendBatchDir(batch, dir, "crawl", 0L)
    val again = PhraseSearch.searchIndex(spark, dir, ph)
      .orderBy("phrase_id", "doc_id").collect().toSeq
    assert(again == full,
      "a batch dir at/below the compaction marker was double-counted")
    // a NEW batch id above the marker is live
    PhraseSearch.appendBatchDir(
      Seq((200L, "a a late arrival")).toDF("doc_id", "text"),
      dir, "crawl", 1L)
    assert(PhraseSearch.searchIndex(spark, dir,
        phrases(1L -> Seq("a", "a")))
      .where(col("doc_id") === 200L).count() == 1)
  }

  test("vacuum folds live batch dirs first: a streamed-then-deleted " +
      "doc is physically gone after one vacuum") {
    val standing = idxDocs.toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phrase_idx_stream_vac").toString
    PhraseSearch.writeIndex(standing, dir)
    PhraseSearch.appendBatchDir(
      Seq((300L, "a a streamed then forgotten")).toDF("doc_id", "text"),
      dir, "crawl", 0L)
    PhraseSearch.deleteFromIndex(Seq(300L).toDF("doc_id"), dir)
    assert(PhraseSearch.vacuumIndex(spark, dir) > 0L)
    // physically absent from the base layout AND no live batch dirs left
    assert(spark.read.parquet(s"$dir/postings")
      .where(col("doc_id") === 300L).count() == 0)
    assert(PhraseSearch.searchIndex(spark, dir,
        phrases(1L -> Seq("a", "a")))
      .where(col("doc_id") === 300L).count() == 0)
  }

  test("a full purge leaves a readable empty index") {
    val docs = Seq((1L, "solo doc here")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phrase_idx_purge").toString
    PhraseSearch.writeIndex(docs, dir)
    PhraseSearch.deleteFromIndex(Seq(1L).toDF("doc_id"), dir)
    PhraseSearch.vacuumIndex(spark, dir)
    assert(PhraseSearch.searchIndex(spark, dir,
      phrases(1L -> Seq("solo", "doc"))).count() == 0)
  }

  test("the pruned search path reads only the phrase terms' bucket " +
      "partitions") {
    val docs = idxDocs.toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phrase_idx_prune").toString
    PhraseSearch.writeIndex(docs, dir)
    val plan = PhraseSearch
      .searchIndex(spark, dir, phrases(1L -> Seq("a", "a")))
      .queryExecution.executedPlan.toString
    // the term_bucket filter must reach the scan as a partition filter
    assert(plan.contains("PartitionFilters") &&
      plan.contains("term_bucket"),
      s"bucket prune must be a partition filter:\n$plan")
  }
}
