package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cadence maintenance pass: consults IndexStats.due and pays
  * exactly the debt that is due — batch-dir growth stays bounded,
  * search results are untouched, idle passes do nothing. */
class IndexMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  test("maintain() folds batch dirs once past the threshold, vacuums " +
      "once past the tombstone threshold, and is a no-op when idle") {
    val emb = graft.engine.Tables.t(spark, sf001, "embeddings")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_maint").toString
    SketchIndex.writeIndex(emb, dir)
    val v = graft.functions.VectorFunctions.asDouble(col("embedding"))
    def batch(k: Int) = emb.where(col("vec_id") < 5)
      .select((col("vec_id") + 1000000L * (k + 1)).as("vec_id"),
        concat(array(element_at(v, 1) + 0.1 * (k + 1)), slice(v, 2, 63))
          .as("embedding"))
    val qs = emb.where(col("vec_id") < 3)
    def rows() = SketchIndex.searchIndex(spark, dir, qs, k = 10,
        shortlist = 50)
      .as[(Long, Long, Int, Double, Int)].collect()
      .sortBy(r => (r._1, r._5)).toSeq

    // two batches: below the maxLiveBatches=2 threshold — pass is idle
    for (k <- 0 until 2)
      SketchIndex.appendBatchDir(batch(k), dir, "crawl", k.toLong)
    val idle = IndexMaintenance.maintain(spark, dir, "sketch",
      maxLiveBatches = 2, maxTombstones = 1)
    assert(!idle.compactionDue && !idle.compacted,
      s"pass fired below the threshold: $idle")
    assert(IndexBatches.live(spark, dir, "sketches").size == 2)

    // third batch crosses it; results identical across the fold
    SketchIndex.appendBatchDir(batch(2), dir, "crawl", 2L)
    val before = rows()
    val pass = IndexMaintenance.maintain(spark, dir, "sketch",
      maxLiveBatches = 2, maxTombstones = 1)
    assert(pass.compactionDue && pass.compacted && !pass.vacuumDue,
      s"compaction debt not paid: $pass")
    assert(IndexBatches.live(spark, dir, "sketches").isEmpty,
      "batch dirs not bounded by the cadence pass")
    assert(rows() == before, "maintenance changed search results")

    // tombstones past maxTombstones=1 → the next pass vacuums
    val victims = before.map(_._2).distinct.take(2)
    SketchIndex.deleteFromIndex(victims.toDF("vec_id"), dir)
    val live = rows()
    assert(victims.forall(vv => !live.exists(_._2 == vv)))
    val vac = IndexMaintenance.maintain(spark, dir, "sketch",
      maxLiveBatches = 2, maxTombstones = 1)
    assert(vac.vacuumDue && vac.vacuumedRows == victims.size.toLong,
      s"vacuum debt not paid: $vac")
    assert(rows() == live, "vacuum changed masked search results")

    // unknown kind fails loudly
    intercept[IllegalArgumentException] {
      IndexMaintenance.maintain(spark, dir, "nope")
    }
  }
}
