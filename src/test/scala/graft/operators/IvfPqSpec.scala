package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables.t

/** IVF-PQ (IVFADC): recall floor, persisted-index identity, partition
  * pruning of the probed code/vector scans, and stability under input
  * repartitioning. */
class IvfPqSpec extends SparkSpec {

  test("ivfpqTopK achieves reasonable recall vs brute force") {
    val emb = t(spark, sf001, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = IvfPq.ivfpqTopK(emb, queries, k = 5,
        nClusters = 8, nProbe = 4, rerank = 50)
      .select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF-PQ recall $recall too low")
  }

  test("exact re-rank means surfaced scores equal brute-force cosine") {
    val emb = t(spark, sf001, "embeddings")
    val queries = emb.where(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 1000)
      .select("query_id", "cand_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val approx = IvfPq.ivfpqTopK(emb, queries, k = 10,
        nClusters = 8, nProbe = 4).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key) && brute(key) == r.getDouble(2),
        s"re-ranked score for $key diverged from exact cosine")
    }
  }

  test("persisted IVF-PQ index round-trips and matches the direct search") {
    import spark.implicits._
    val emb = t(spark, sf001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    IvfPq.writeIndex(emb, dir, nClusters = 8)
    // inverted-file layout is literal for BOTH the codes and the vectors
    for (sub <- Seq("pqcodes", "vectors")) {
      val parts = new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.startsWith("centroid_id=")).map(_.getName).sorted
      assert(parts.length == 8,
        s"expected 8 cluster dirs under $sub, got ${parts.toSeq}")
    }
    val qs = emb.where(col("vec_id") < 5)
    val direct = IvfPq.ivfpqTopK(emb, qs, k = 10, nClusters = 8, nProbe = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val via = IvfPq.searchIndex(spark, dir, qs, k = 10, nProbe = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(direct.nonEmpty && direct.sameElements(via),
      "persisted IVF-PQ search diverged from the direct IVFADC search")
  }

  test("persisted search prunes unprobed cluster directories at the scan") {
    val emb = t(spark, sf001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_prune")
      .toString
    IvfPq.writeIndex(emb, dir, nClusters = 8)
    val qs = emb.where(col("vec_id") === 0)
    val plan = IvfPq.searchIndex(spark, dir, qs, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    // the probed-cell isin lands as a PartitionFilters entry on the
    // pqcodes/vectors scans — unprobed directories are never opened
    assert(plan.contains("PartitionFilters") &&
      plan.contains("centroid_id"),
      s"probed-cell partition filter missing from the scan:\n$plan")
  }

  test("results are stable under input repartitioning") {
    import spark.implicits._
    val emb = t(spark, sf001, "embeddings")
    val qs = emb.where(col("vec_id") < 5)
    def run(c: org.apache.spark.sql.DataFrame) =
      IvfPq.ivfpqTopK(c, qs, k = 10, nClusters = 8, nProbe = 3)
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val a = run(emb)
    val b = run(emb.repartition(13, col("vec_id")))
    assert(a.nonEmpty && a.sameElements(b),
      "IVFADC result changed under a different input partitioning")
  }

  test("appendToIndex: appended vectors surface in search (encoded " +
      "against the standing model, landed as extra partition files)") {
    import spark.implicits._
    import graft.functions.VectorFunctions.asDouble
    val emb = t(spark, sf001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_app")
      .toString
    IvfPq.writeIndex(emb, dir, nClusters = 8)
    val filesBefore = new java.io.File(s"$dir/pqcodes").listFiles()
      .filter(_.getName.startsWith("centroid_id=")).flatMap(_.listFiles())
      .length
    val v = asDouble(col("embedding"))
    // near-copies of the query vectors under new ids: each must rank
    // at the top for its source query, through appended files only
    val batch = emb.where(col("vec_id") < 5)
      .select((col("vec_id") + 1000000).as("vec_id"),
        concat(array(element_at(v, 1) + 0.1), slice(v, 2, 63))
          .as("embedding"))
    IvfPq.appendToIndex(batch, dir)
    val filesAfter = new java.io.File(s"$dir/pqcodes").listFiles()
      .filter(_.getName.startsWith("centroid_id=")).flatMap(_.listFiles())
      .length
    assert(filesAfter > filesBefore, "append landed no new code files")
    val got = IvfPq.searchIndex(spark, dir, emb.where(col("vec_id") < 5),
        k = 10, nProbe = 4, rerank = 100)
      .as[(Long, Long, Double, Int)].collect()
    (0L until 5L).foreach { q =>
      assert(got.exists(r => r._1 == q && r._2 == q + 1000000),
        s"appended near-copy of query $q not retrieved")
    }
  }

  test("streamed batch dirs match the in-place append exactly; a " +
      "replayed batch rewrites its slot; compaction is dedup-idempotent") {
    import spark.implicits._
    import graft.functions.VectorFunctions.asDouble
    val emb = t(spark, sf001, "embeddings")
    val v = asDouble(col("embedding"))
    val batch = emb.where(col("vec_id") < 5)
      .select((col("vec_id") + 1000000).as("vec_id"),
        concat(array(element_at(v, 1) + 0.1), slice(v, 2, 63))
          .as("embedding"))
    val qs = emb.where(col("vec_id") < 5)
    val sDir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_sb").toString
    val aDir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_sb_ref").toString
    IvfPq.writeIndex(emb, sDir, nClusters = 8)
    IvfPq.writeIndex(emb, aDir, nClusters = 8)
    IvfPq.appendBatchDir(batch, sDir, "crawl", 0L)
    IvfPq.appendBatchDir(batch, sDir, "crawl", 0L) // at-least-once replay
    IvfPq.appendToIndex(batch, aDir)
    def res(d: String) = IvfPq.searchIndex(spark, d, qs,
        k = 10, nProbe = 4, rerank = 100)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val ref = res(aDir)
    assert(ref.nonEmpty && res(sDir).sameElements(ref),
      "streamed batch dirs diverged from the in-place append")
    IvfPq.compactIndexBatches(spark, sDir)
    assert(res(sDir).sameElements(ref), "compaction changed results")
    // crash window: a folded dir resurrected at/below the marker
    IvfPq.appendBatchDir(batch, sDir, "crawl", 0L)
    assert(res(sDir).sameElements(ref),
      "a resurrected folded batch double-counted")
    IvfPq.compactIndexBatches(spark, sDir)
    assert(res(sDir).sameElements(ref))
  }

  test("recenter after appends is row-identical to a fresh index over " +
      "the union (same vector set, same deterministic fit)") {
    import spark.implicits._
    import graft.functions.VectorFunctions.asDouble
    val emb = t(spark, sf001, "embeddings")
    val v = asDouble(col("embedding"))
    val batch = emb.where(col("vec_id") < 10)
      .select((col("vec_id") + 1000000).as("vec_id"),
        concat(array(element_at(v, 1) + 0.1), slice(v, 2, 63))
          .as("embedding"))
    val qs = emb.where(col("vec_id") < 5)
    val rDir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_rc").toString
    val fDir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_rc_ref").toString
    IvfPq.writeIndex(emb, rDir, nClusters = 8)
    IvfPq.appendToIndex(batch, rDir)
    val stats = IvfPq.recenterIndex(spark, rDir, nClusters = 8)
      .as[(Long, Long, Long)].collect().head
    assert(stats._1 == emb.count() + 10, s"recenter saw ${stats._1} vectors")
    IvfPq.writeIndex(
      emb.select(col("vec_id"), v.as("embedding")).union(batch),
      fDir, nClusters = 8)
    def res(d: String) = IvfPq.searchIndex(spark, d, qs,
        k = 10, nProbe = 4, rerank = 100)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val a = res(rDir); val b = res(fDir)
    assert(a.nonEmpty && a.sameElements(b),
      "recentered index diverged from a fresh rebuild over the union")
  }

  test("a streamed-then-deleted vector resolves DELETED through one " +
      "vacuum, physically gone from both datasets") {
    import spark.implicits._
    val emb = t(spark, sf001, "embeddings")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_sv").toString
    IvfPq.writeIndex(emb, dir, nClusters = 8)
    IvfPq.appendBatchDir(
      emb.where(col("vec_id") === 7)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")),
      dir, "crawl", 0L)
    IvfPq.deleteFromIndex(Seq(1000007L).toDF("vec_id"), dir)
    assert(IvfPq.vacuumIndex(spark, dir) > 0L)
    for (ds <- Seq("pqcodes", "vectors"))
      assert(spark.read.parquet(s"$dir/$ds")
        .where(col("cand_id") === 1000007L).count() == 0,
        s"$ds still holds the streamed-then-deleted vector")
  }

  test("tombstoned vectors vanish from search immediately and vacuum " +
      "preserves results while physically removing both datasets' rows") {
    import spark.implicits._
    val emb = t(spark, sf001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_del")
      .toString
    IvfPq.writeIndex(emb, dir, nClusters = 8)
    val qs = emb.where(col("vec_id") < 5)
    def search() = IvfPq.searchIndex(spark, dir, qs, k = 10, nProbe = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val deadIds = (0L until 500L).filter(_ % 17 == 3).toSet
    IvfPq.deleteFromIndex(
      emb.where(col("vec_id") % 17 === 3).select("vec_id"), dir)
    val masked = search()
    assert(masked.nonEmpty && masked.forall(r => !deadIds.contains(r._2)),
      "a tombstoned vector surfaced in the masked search")
    val removed = IvfPq.vacuumIndex(spark, dir)
    assert(removed > 0, "vacuum removed nothing")
    val vacuumed = search()
    assert(masked.sameElements(vacuumed),
      "vacuum changed search results")
    // physically gone from BOTH datasets
    for (ds <- Seq("pqcodes", "vectors")) {
      val left = spark.read.parquet(s"$dir/$ds")
        .where(col("cand_id").isin(deadIds.toSeq: _*)).count()
      assert(left == 0, s"$ds still holds $left tombstoned rows")
    }
    // idempotent: an empty-ledger vacuum is a no-op
    assert(IvfPq.vacuumIndex(spark, dir) == 0L)
  }

  test("a tombstone landing inside vacuum's race window survives and " +
      "keeps masking its vector") {
    import spark.implicits._
    val emb = t(spark, sf001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_race")
      .toString
    IvfPq.writeIndex(emb, dir, nClusters = 8)
    val qs = emb.where(col("vec_id") < 5)
    def hits() = IvfPq.searchIndex(spark, dir, qs, k = 10, nProbe = 3)
      .select("cand_id").as[Long].collect().toSet
    val firstHit = hits().min
    IvfPq.deleteFromIndex(Seq(firstHit + 1000000).toDF("vec_id"), dir)
    IvfPq.vacuumAfterSnapshotHook = () =>
      IvfPq.deleteFromIndex(Seq(firstHit).toDF("vec_id"), dir)
    try IvfPq.vacuumIndex(spark, dir)
    finally IvfPq.vacuumAfterSnapshotHook = () => ()
    // the late tombstone was not consumed: still on the ledger, still
    // masking, and the NEXT vacuum folds it physically
    assert(!hits().contains(firstHit),
      "the race-window tombstone stopped masking its vector")
    assert(IvfPq.vacuumIndex(spark, dir) > 0L,
      "the surviving tombstone was not folded by the next vacuum")
    assert(!hits().contains(firstHit))
  }

  test("a full purge leaves a readable empty index") {
    import spark.implicits._
    val emb = t(spark, sf001, "embeddings").where(col("vec_id") < 20)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_purge")
      .toString
    IvfPq.writeIndex(emb, dir, nClusters = 4)
    IvfPq.deleteFromIndex(emb.select("vec_id"), dir)
    IvfPq.vacuumIndex(spark, dir)
    val got = IvfPq.searchIndex(spark,
      dir, emb.where(col("vec_id") < 2), k = 5, nProbe = 2)
    assert(got.count() == 0, "a fully purged index should return nothing")
  }

  test("a full purge through the FUSED vacuum (live batch dirs + " +
      "everything tombstoned) leaves a readable, appendable layout") {
    import spark.implicits._
    val emb = t(spark, sf001, "embeddings").where(col("vec_id") < 20)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_fp")
      .toString
    IvfPq.writeIndex(emb, dir, nClusters = 4)
    IvfPq.appendBatchDir(
      emb.where(col("vec_id") < 3)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")),
      dir, "crawl", 0L)
    // tombstone EVERY id, base and batch alike → the fused rewrite's
    // keep set is empty and must write the schema-carrying empty layout
    IvfPq.deleteFromIndex(
      emb.select("vec_id").union(emb.where(col("vec_id") < 3)
        .select((col("vec_id") + 1000000).as("vec_id"))), dir)
    assert(IvfPq.vacuumIndex(spark, dir) == 23L)
    val qs = emb.where(col("vec_id") < 2)
    assert(IvfPq.searchIndex(spark, dir, qs, k = 5, nProbe = 2)
      .count() == 0, "a fully purged index should return nothing")
    // the layout survives an append — the empty rewrite kept schema
    IvfPq.appendToIndex(emb.where(col("vec_id") < 5), dir)
    assert(IvfPq.searchIndex(spark, dir, qs, k = 5, nProbe = 2)
      .count() > 0, "append after a fused full purge broke the layout")
  }

  test("ivfpqTopKAll batches past the maxQ cap and matches the " +
      "single-call result per query") {
    import spark.implicits._
    val emb = t(spark, sf001, "embeddings")
    val qs = emb.where(col("vec_id") < 7)
    val one = IvfPq.ivfpqTopK(emb, qs, k = 5, nClusters = 8, nProbe = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    // maxQ = 2 forces 4 chunks; fit/encode happen once, results union
    val batched = IvfPq.ivfpqTopKAll(emb, qs, k = 5, nClusters = 8,
        nProbe = 3, maxQ = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(one.nonEmpty && batched.sameElements(one),
      "batched search diverged from the single bounded call")
    // zero queries: empty result in the right schema, no crash
    assert(IvfPq.ivfpqTopKAll(emb, qs.limit(0), k = 5,
      nClusters = 8, maxQ = 2).count() == 0)
  }

  test("oversized query side fails loudly before any driver collect") {
    val emb = t(spark, sf001, "embeddings")
    val e = intercept[IllegalArgumentException] {
      IvfPq.ivfpqTopK(emb, emb, k = 5, maxQ = 10)
    }
    assert(e.getMessage.contains("maxQ"))
  }
}
