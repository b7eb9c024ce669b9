package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Timestamp-type matrix: the driver's testdata generator has shipped
  * `events.ts` as BOTH int64 nanoseconds (read as LongType under
  * `nanosAsLong`) and `timestamp[us]` without timezone (read as
  * TIMESTAMP_NTZ). Round 8 shipped with the second variant silently
  * crashing every epoch-cast in the event/range/stream family at
  * analysis time. This spec pins [[graft.engine.Tables.t]]'s
  * normalization against both physical encodings: each event-family
  * catalog gate must produce IDENTICAL results over either variant, so
  * a future testdata regeneration can never crash these gates again.
  */
class TsMatrixSpec extends SparkSpec {

  private val eventGates = Seq(
    "q_events_sessionize", "q_events_concurrency", "q_events_funnel",
    "q_join_range", "q_window_range_frame",
    "q_stream_late_replay", "q_stream_join_replay")

  /** Build an sf-dir clone with events.parquet re-encoded by `enc`,
    * every other table symlinked to the canonical sf0.001 files. */
  private def variantDir(tag: String)(
      enc: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : String = {
    val dir = Files.createTempDirectory(s"graft-ts-$tag")
    graft.engine.Tables.testdataNames.filterNot(_ == "events").foreach { n =>
      Files.createSymbolicLink(dir.resolve(s"$n.parquet"),
        Paths.get(s"$sf001/$n.parquet"))
    }
    enc(graft.engine.Tables.t(spark, sf001, "events"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  private def results(name: String, dir: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq

  test("event gates are identical over int64-nanos and NTZ-µs events") {
    // (a) the int64-nanos generation: under nanosAsLong the column reads
    // back as a plain long of nanos-since-epoch — exactly what Tables.t
    // saw in rounds 1-7
    val nanosDir = variantDir("nanos")(df =>
      df.withColumn("ts", unix_micros(col("ts")) * lit(1000L)))
    // (b) the timestamp[us]-no-tz generation: Spark writes TIMESTAMP_NTZ
    // as parquet timestamp[us] with isAdjustedToUTC=false — the r8 shape
    val ntzDir = variantDir("ntz")(df =>
      df.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampNTZType)))
    // sanity: the variants really decode to the intended physical types
    val rawNanos = spark.read.parquet(s"$nanosDir/events.parquet")
    val rawNtz = spark.read.parquet(s"$ntzDir/events.parquet")
    assert(rawNanos.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(rawNtz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)

    for (name <- eventGates) {
      val canonical = results(name, sf001)
      assert(canonical.nonEmpty, s"$name returned no rows on sf0.001")
      assert(results(name, nanosDir) == canonical,
        s"$name differs on the int64-nanos events encoding")
      assert(results(name, ntzDir) == canonical,
        s"$name differs on the TIMESTAMP_NTZ events encoding")
      graft.operators.OperatorCaches.releaseAll(spark)
    }
  }
}
