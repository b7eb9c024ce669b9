package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables.t

/** Scratch timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val docs = t(spark, sfDir, "documents")
    time("warmup")(docs.count())
    val n = time("minhash-new")(graft.operators.Dedup.minhashLshPairs(
      docs, "doc_id", "text", 5, 8, 4, 0.5).count())
    println(s"[probe] pairs = $n")
    spark.stop()
  }
}
