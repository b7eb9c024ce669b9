package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The [[IndexMaintenance]] registry swept across ALL SIX index kinds:
  * a clean build of each kind must report zero maintenance debt through
  * the registry's own dataset list and marker-dataset wiring, and an
  * idle pass must be a no-op. This pins the per-kind wiring (a dataset
  * name typo or a wrong marker dataset would over-report live batch
  * dirs or crash the listing) that the end-to-end gate only exercises
  * for the sketch kind, plus a debt round-trip on a text kind (bm25) so
  * the registry's compact/vacuum function pointers are exercised off
  * the sketch path too. */
class IndexMaintenanceRegistrySpec extends SparkSpec {

  import spark.implicits._

  test("all six registry kinds: clean build → zero debt, idle no-op, " +
      "stats lists every registered dataset") {
    val emb = graft.engine.Tables.t(spark, sf001, "embeddings")
      .where(col("vec_id") < 60)
    val docs = graft.engine.Tables.t(spark, sf001, "documents")
      .orderBy("doc_id").limit(40).select("doc_id", "text")
    val toks = MaxSim.subvectorTokens(emb.where(col("vec_id") < 40),
        "vec_id", "embedding", 8)
      .withColumnRenamed("vec_id", "doc_id")
    val builders: Map[String, String => Unit] = Map(
      "ivf" -> (d => Similarity.writeIndex(emb, d, nClusters = 4)),
      "ivfpq" -> (d => IvfPq.writeIndex(emb, d, nClusters = 4)),
      "sketch" -> (d => SketchIndex.writeIndex(emb, d)),
      "maxsim" -> (d => MaxSim.writeTokenIndex(toks, d, nClusters = 4)),
      "bm25" -> (d => Bm25.writeIndex(docs, d)),
      "phrase" -> (d => PhraseSearch.writeIndex(docs, d)))
    assert(builders.keySet == IndexMaintenance.kinds.keySet,
      "registry and spec sweep diverged: " +
        s"${IndexMaintenance.kinds.keySet} vs ${builders.keySet}")
    for ((kind, build) <- builders) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_maintreg_$kind").toString
      build(dir)
      val k = IndexMaintenance.kinds(kind)
      val st = IndexStats.stats(spark, dir, k.datasets,
          countRows = true, markerDataset = Some(k.marker))
        .collect()
      assert(st.length == k.datasets.size,
        s"$kind: stats listed ${st.length} datasets, " +
          s"expected ${k.datasets.size}")
      assert(st.forall(r => r.getLong(r.fieldIndex("n_rows")) > 0L),
        s"$kind: a registered dataset read zero rows — wrong name? " +
          st.mkString(", "))
      assert(st.forall(r =>
          r.getLong(r.fieldIndex("live_batch_dirs")) == 0L &&
          r.getLong(r.fieldIndex("pending_tombstones")) == 0L),
        s"$kind: clean build reports phantom debt: " + st.mkString(", "))
      val idle = IndexMaintenance.maintain(spark, dir, kind,
        maxLiveBatches = 0, maxTombstones = 0)
      assert(!idle.compactionDue && !idle.vacuumDue && !idle.compacted &&
          idle.vacuumedRows == 0L,
        s"$kind: idle pass was not a no-op: $idle")
    }
  }

  test("bm25 kind pays tombstone debt through the registry's vacuum " +
      "pointer") {
    val docs = graft.engine.Tables.t(spark, sf001, "documents")
      .orderBy("doc_id").limit(40).select("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_maintreg_bm25").toString
    Bm25.writeIndex(docs, dir)
    Bm25.deleteFromIndex(Seq(docs.select("doc_id").as[Long].head())
      .toDF("doc_id"), dir)
    val rep = IndexMaintenance.maintain(spark, dir, "bm25",
      maxLiveBatches = 16, maxTombstones = 0)
    assert(rep.vacuumDue && rep.vacuumedRows > 0L,
      s"bm25 vacuum debt not paid through the registry: $rep")
    val again = IndexMaintenance.maintain(spark, dir, "bm25",
      maxLiveBatches = 16, maxTombstones = 0)
    assert(!again.vacuumDue, s"debt not cleared: $again")
  }

  test("warehouse sweep: one janitor pass over a root of six indexes " +
      "with mixed debt pays every due debt, skips non-indexes, leaves " +
      "zero debt and identical searches") {
    val emb = graft.engine.Tables.t(spark, sf001, "embeddings")
      .where(col("vec_id") < 60)
    val docs = graft.engine.Tables.t(spark, sf001, "documents")
      .orderBy("doc_id").limit(40).select("doc_id", "text")
    val toks = MaxSim.subvectorTokens(emb.where(col("vec_id") < 40),
        "vec_id", "embedding", 8)
      .withColumnRenamed("vec_id", "doc_id")
    val root = java.nio.file.Files
      .createTempDirectory("graft_warehouse").toString
    def sub(n: String) = s"$root/$n"
    Similarity.writeIndex(emb, sub("idx_ivf"), nClusters = 4)
    IvfPq.writeIndex(emb, sub("idx_ivfpq"), nClusters = 4)
    SketchIndex.writeIndex(emb, sub("idx_sketch"))
    MaxSim.writeTokenIndex(toks, sub("idx_maxsim"), nClusters = 4)
    Bm25.writeIndex(docs, sub("idx_bm25"))
    PhraseSearch.writeIndex(docs, sub("idx_phrase"))
    // a non-index warehouse dataset the janitor must SKIP
    docs.limit(5).write.parquet(sub("plain_dataset"))

    // mixed debt under the sweep-wide policy (maxLiveBatches=1,
    // maxTombstones=1): sketch owes a compaction (2 live batch dirs),
    // ivf / ivfpq / bm25 owe vacuums (2 tombstones each); maxsim and
    // phrase stay idle
    val v = graft.functions.VectorFunctions.asDouble(col("embedding"))
    def batch(k: Int) = emb.where(col("vec_id") < 5)
      .select((col("vec_id") + 1000000L * (k + 1)).as("vec_id"),
        concat(array(element_at(v, 1) + 0.1 * (k + 1)), slice(v, 2, 63))
          .as("embedding"))
    for (k <- 0 until 2)
      SketchIndex.appendBatchDir(batch(k), sub("idx_sketch"), "crawl",
        k.toLong)
    val victims = Seq(7L, 11L).toDF("vec_id")
    Similarity.deleteFromIndex(victims, sub("idx_ivf"))
    IvfPq.deleteFromIndex(victims, sub("idx_ivfpq"))
    Bm25.deleteFromIndex(Seq(3L, 9L).toDF("doc_id"), sub("idx_bm25"))

    // post-debt (ledger-masked) searches are the invariant the sweep
    // must preserve
    val qs = emb.where(col("vec_id") < 3)
    val terms = Seq((1L, "spark"), (2L, "customer")).toDF("query_id",
      "term")
    def searches(): Map[String, Seq[String]] = Map(
      "ivf" -> Similarity.searchIndex(spark, sub("idx_ivf"), qs, k = 10,
        nProbe = 4).collect().map(_.toString).sorted.toSeq,
      "ivfpq" -> IvfPq.searchIndex(spark, sub("idx_ivfpq"), qs, k = 10,
        nProbe = 4, rerank = 50).collect().map(_.toString).sorted.toSeq,
      "sketch" -> SketchIndex.searchIndex(spark, sub("idx_sketch"), qs,
        k = 10, shortlist = 50).collect().map(_.toString).sorted.toSeq,
      "bm25" -> Bm25.searchIndex(spark, sub("idx_bm25"), terms, k = 10)
        .collect().map(_.toString).sorted.toSeq)
    val before = searches()

    val entries = IndexMaintenance.sweep(spark, root,
      maxLiveBatches = 1, maxTombstones = 1)
    val byKind = entries.map(e => e.kind -> e).toMap
    assert(entries.size == 6 && byKind.keySet ==
        IndexMaintenance.kinds.keySet,
      s"sweep did not visit exactly the six indexes: $entries")
    assert(entries.forall(e =>
        e.dir.endsWith(s"idx_${e.kind}")),
      s"kind detection mismatched a directory: $entries")
    assert(byKind("sketch").report.compactionDue &&
        byKind("sketch").report.compacted,
      s"sketch compaction debt not paid: ${byKind("sketch")}")
    // vacuumedRows is in each kind's own row unit: vectors for the ANN
    // kinds (2 deleted docs = 2 rows), POSTING rows for bm25 (2 docs =
    // all their term postings)
    for (k <- Seq("ivf", "ivfpq"))
      assert(byKind(k).report.vacuumDue &&
          byKind(k).report.vacuumedRows == 2L,
        s"$k vacuum debt not paid: ${byKind(k)}")
    assert(byKind("bm25").report.vacuumDue &&
        byKind("bm25").report.vacuumedRows > 0L,
      s"bm25 vacuum debt not paid: ${byKind("bm25")}")
    for (k <- Seq("maxsim", "phrase"))
      assert(!byKind(k).report.compactionDue &&
          !byKind(k).report.vacuumDue,
        s"$k was idle but the sweep fired: ${byKind(k)}")

    // after ONE sweep: zero debt everywhere under the same policy…
    for (e <- entries) {
      val k = IndexMaintenance.kinds(e.kind)
      val (c, vdue) = IndexStats.due(spark, e.dir, k.datasets,
        maxLiveBatches = 1, maxTombstones = 1,
        markerDataset = Some(k.marker))
      assert(!c && !vdue, s"${e.kind} still owes debt after the sweep")
    }
    // …and searches are bit-identical to the pre-sweep masked reads
    assert(searches() == before,
      "the janitor sweep changed search results")
    // idempotent: a second sweep is all-idle
    assert(IndexMaintenance.sweep(spark, root, maxLiveBatches = 1,
        maxTombstones = 1)
      .forall(e => !e.report.compactionDue && !e.report.vacuumDue),
      "second sweep found debt the first left behind")
  }
}
