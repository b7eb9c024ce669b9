package graft.queries

import org.apache.spark.sql.SparkSession

/** Scratch measurement for the metadata-only maintenance decision
  * (dev-only; run via Test/runMain graft.queries.ProfileIdleSweep): an
  * IDLE janitor pass over a many-index warehouse root must cost a
  * directory listing per index — no Spark jobs — or the 100 TB
  * serving-tier story (sweep dozens of indexes on a cadence) charges
  * every idle index a fixed job tax. Builds a root of 24 clean indexes
  * (the six kinds × 4 hardlink clones) and times sweep() plus the
  * Spark-job count it triggers. */
object ProfileIdleSweep {
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
    import graft.operators.IndexMaintenance

    // a clean warehouse: clone the debted fixture and sweep its debt
    // out once (untimed), then link the six clean indexes 4× each
    val base = IndexFixtures.cloned(spark, dir, "warehouse")(
      VectorQueries.buildWarehouse(spark, dir))
    IndexMaintenance.sweep(spark, base, maxLiveBatches = 1,
      maxTombstones = 1)
    val root = java.nio.file.Files
      .createTempDirectory("graft_idle_warehouse").toString
    val from = java.nio.file.Paths.get(base)
    def linkTree(f: java.nio.file.Path, t: java.nio.file.Path): Unit =
      if (java.nio.file.Files.isDirectory(f)) {
        java.nio.file.Files.createDirectories(t)
        val it = java.nio.file.Files.list(f).iterator()
        while (it.hasNext) {
          val c = it.next(); linkTree(c, t.resolve(c.getFileName))
        }
      } else java.nio.file.Files.createLink(t, f)
    for (copy <- 0 until 4;
         kind <- IndexMaintenance.kinds.keys.toSeq.sorted)
      linkTree(from.resolve(s"idx_$kind"),
        java.nio.file.Paths.get(root, s"c${copy}_idx_$kind"))

    val sc = spark.sparkContext
    for (rep <- 1 to 3) {
      val jobs0 = sc.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      val entries = IndexMaintenance.sweep(spark, root,
        maxLiveBatches = 1, maxTombstones = 1)
      val ms = (System.nanoTime() - t0) / 1e6
      val jobs = sc.statusTracker.getJobIdsForGroup(null).length - jobs0
      require(entries.size == 24 &&
        entries.forall(e => !e.report.compactionDue &&
          !e.report.vacuumDue),
        s"idle sweep found debt or missed indexes: $entries")
      println(f"[profile] idle sweep over 24 indexes: $ms%.1f ms, " +
        s"$jobs Spark jobs")
    }
    spark.stop()
  }
}
