package graft
import org.apache.spark.sql.SparkSession

/** Scratch timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--order")) {
      // print the Bench iteration order (HashMap order of queries keys)
      SparkEntry.queries.keys.zipWithIndex
        .foreach { case (k, i) => println(f"[order] $i%3d $k") }
      return
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qnames =
      if (args.length > 1) args.drop(1).toSeq else Seq("q_vault_rating_slide")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    if (qnames == Seq("--ivf")) {
      // sub-step timing of the persisted-index lifecycle gates
      import org.apache.spark.sql.functions._
      import graft.operators.Similarity
      val emb = graft.engine.Tables.t(spark, sfDir, "embeddings")
      val idxDir = "/tmp/graft_probe_ivf"
      (1 to 2).foreach { rep =>
        time(s"fitCentroids rep$rep")(
          Similarity.fitCentroids(emb, 16))
        time(s"writeIndex rep$rep")(
          Similarity.writeIndex(emb, idxDir, nClusters = 16))
        val v = graft.functions.VectorFunctions.asDouble(col("embedding"))
        val batch = emb.where(col("vec_id") < 20)
          .select((col("vec_id") + 1000000).as("vec_id"),
            concat(array(element_at(v, 1) + 0.1), slice(v, 2, 63))
              .as("embedding"))
        time(s"append rep$rep")(Similarity.appendToIndex(batch, idxDir))
        time(s"search rep$rep")(
          Similarity.searchIndex(spark, idxDir,
            emb.where(col("vec_id") < 5), k = 10, nProbe = 4).count())
      }
      spark.stop(); return
    }
    qnames.foreach { qname =>
      val fn = SparkEntry.queries(qname)
      time(s"$qname cold")(fn(spark, sfDir).count())
      time(s"$qname warm")(fn(spark, sfDir).count())
    }
    spark.stop()
  }
}
