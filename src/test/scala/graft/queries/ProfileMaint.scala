package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch substep profiler for q_index_maintenance (dev-only; run via
  * Test/runMain graft.queries.ProfileMaint). Mirrors Bench's session. */
object ProfileMaint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import graft.operators.{IndexBatches, IndexMaintenance, SketchIndex,
      StagingCaches, OperatorCaches}
    import spark.implicits._
    import graft.engine.Tables.t

    // warm pass: memoize the shared fixture build (amortized across the
    // driver session, not part of the steady-state gate cost)
    graft.SparkEntry.queries("q_index_maintenance")(spark, dir).count()
    OperatorCaches.releaseAll(spark)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      val total0 = System.nanoTime()
      val emb = t(spark, dir, "embeddings")
      val idxDir = time("fixture clone") {
        IndexFixtures.cloned(spark, dir, "sketch")(
          VectorQueries.buildSketch(spark, dir))
      }
      val batch = VectorQueries.perturbedBatch(emb)
      time("2x appendBatchDir") {
        for ((lo, hi, b) <- Seq((0, 10, 0L), (10, 20, 1L)))
          SketchIndex.appendBatchDir(
            batch.where(col("vec_id") >= 1000000L + lo &&
              col("vec_id") < 1000000L + hi), idxDir, "crawl", b)
      }
      time("deleteFromIndex") {
        SketchIndex.deleteFromIndex(Seq(40L, 41L).toDF("vec_id"), idxDir)
      }
      val qs = emb.where(col("vec_id") < 5)
      def search() = SketchIndex.searchIndex(spark, idxDir, qs, k = 10,
          shortlist = 50)
        .withColumn("hamming", col("hamming").cast("long"))
        .withColumn("rank", col("rank").cast("long"))
      val pre = time("debt search (checkpoint)") {
        StagingCaches.checkpointed(
          search().withColumn("phase", lit("debt")))
      }
      time("maintain (vacuum pass)") {
        IndexMaintenance.maintain(spark, idxDir, "sketch",
          maxLiveBatches = 1, maxTombstones = 1)
      }
      time("maintain (idle pass)") {
        IndexMaintenance.maintain(spark, idxDir, "sketch",
          maxLiveBatches = 1, maxTombstones = 1)
      }
      time("maintained search + union") {
        pre.unionByName(search().withColumn("phase", lit("maintained")))
          .select("phase", "query_id", "cand_id", "hamming", "score",
            "rank")
          .orderBy("phase", "query_id", "rank")
          .count()
      }
      println(f"[profile] TOTAL                        " +
        f"${(System.nanoTime() - total0) / 1e9}%.3f s")
      OperatorCaches.releaseAll(spark)
    }
    spark.stop()
  }
}
