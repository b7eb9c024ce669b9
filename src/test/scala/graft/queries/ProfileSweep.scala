package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch substep profiler for q_warehouse_sweep (dev-only; run via
  * Test/runMain graft.queries.ProfileSweep). Mirrors Bench's session. */
object ProfileSweep {
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
    import graft.operators.{Bm25, IndexMaintenance, IndexStats,
      OperatorCaches, SketchIndex}
    import spark.implicits._
    import graft.engine.Tables.t

    // warm pass: memoize the shared fixture build
    graft.SparkEntry.queries("q_warehouse_sweep")(spark, dir).count()
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
      val emb = t(spark, dir, "embeddings").where(col("vec_id") < 60)
      val root = time("fixture clone") {
        IndexFixtures.cloned(spark, dir, "warehouse")(
          VectorQueries.buildWarehouse(spark, dir))
      }
      val qs = emb.where(col("vec_id") < 3)
      val terms = Seq((1L, "spark"), (2L, "customer"))
        .toDF("query_id", "term")
      def searches(): Map[String, Seq[String]] = Map(
        "sketch" -> SketchIndex.searchIndex(spark, s"$root/idx_sketch", qs,
          k = 10, shortlist = 50).collect().map(_.toString).sorted.toSeq,
        "bm25" -> Bm25.searchIndex(spark, s"$root/idx_bm25", terms, k = 10)
          .collect().map(_.toString).sorted.toSeq)
      val before = time("pre-sweep searches")(searches())
      val entries = time("sweep") {
        IndexMaintenance.sweep(spark, root,
          maxLiveBatches = 1, maxTombstones = 1)
      }
      // per-kind maintain timing breakdown, second-level
      for (e <- entries) println(s"[profile]   ${e.kind}: ${e.report}")
      time("post-sweep searches")(assert(searches() == before))
      time("post-sweep due checks") {
        entries.foreach { e =>
          val k = IndexMaintenance.kinds(e.kind)
          IndexStats.due(spark, e.dir, k.datasets,
            maxLiveBatches = 1, maxTombstones = 1,
            markerDataset = Some(k.marker))
        }
      }
      println(f"[profile] TOTAL                        " +
        f"${(System.nanoTime() - total0) / 1e9}%.3f s")
      OperatorCaches.releaseAll(spark)
    }
    spark.stop()
  }
}
