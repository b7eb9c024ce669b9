package graft
import org.apache.spark.sql.SparkSession

/** Scratch timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
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
    qnames.foreach { qname =>
      val fn = SparkEntry.queries(qname)
      time(s"$qname cold")(fn(spark, sfDir).count())
      time(s"$qname warm")(fn(spark, sfDir).count())
    }
    spark.stop()
  }
}
