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
}
