package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B for the r18 fold∖ledger vacuum fusion on the MaxSim and
  * IvfPq kinds (dev-only; run via
  * Test/runMain graft.queries.ProfileFusedVacuum). The OLD behavior
  * (compact fully, then vacuum the already-folded layout) is exactly
  * reproducible on HEAD by calling compact*Batches first — vacuum then
  * sees no live dirs and takes the selective path — so both shapes
  * measure on identical binaries and fixtures. Mirrors Bench's session.
  */
object ProfileFusedVacuum {
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
    import graft.operators.{IvfPq, MaxSim, OperatorCaches}
    import spark.implicits._
    import graft.engine.Tables.t

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val emb = t(spark, dir, "embeddings")
    def batch(lo: Long, hi: Long) = emb
      .where(col("vec_id") >= lo && col("vec_id") < hi)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))

    // warm the clean fixtures once (untimed)
    IndexFixtures.shared(spark, dir, "maxsim")(
      VectorQueries.buildMaxsim(spark, dir))
    IndexFixtures.shared(spark, dir, "ivfpq")(
      VectorQueries.buildIvfPq(spark, dir))

    for (rep <- 1 to 3; mode <- Seq("fused", "old")) {
      println(s"=== rep $rep mode $mode")
      // --- maxsim: 2 batch dirs + 3 tombstones, then vacuum
      val mDir = IndexFixtures.cloned(spark, dir, "maxsim")(
        VectorQueries.buildMaxsim(spark, dir))
      val mToks = (b: Long, lo: Long, hi: Long) =>
        MaxSim.appendTokenBatchDir(
          MaxSim.subvectorTokens(batch(lo, hi), "vec_id", "embedding", 8)
            .withColumnRenamed("vec_id", "doc_id"), mDir, "crawl", b)
      mToks(0L, 0L, 10L); mToks(1L, 10L, 20L)
      MaxSim.deleteFromTokenIndex(
        Seq(3L, 9L, 1000004L).toDF("doc_id"), mDir)
      time(s"maxsim vacuum-with-debt ($mode)") {
        if (mode == "old") MaxSim.compactTokenIndexBatches(spark, mDir)
        MaxSim.vacuumTokenIndex(spark, mDir)
      }
      // --- ivfpq: 2 batch dirs + 3 tombstones, then vacuum
      val pDir = IndexFixtures.cloned(spark, dir, "ivfpq")(
        VectorQueries.buildIvfPq(spark, dir))
      IvfPq.appendBatchDir(batch(0L, 10L), pDir, "crawl", 0L)
      IvfPq.appendBatchDir(batch(10L, 20L), pDir, "crawl", 1L)
      IvfPq.deleteFromIndex(Seq(3L, 9L, 1000004L).toDF("vec_id"), pDir)
      time(s"ivfpq vacuum-with-debt ($mode)") {
        if (mode == "old") IvfPq.compactIndexBatches(spark, pDir)
        IvfPq.vacuumIndex(spark, pDir)
      }
      OperatorCaches.releaseAll(spark)
    }
    spark.stop()
  }
}
