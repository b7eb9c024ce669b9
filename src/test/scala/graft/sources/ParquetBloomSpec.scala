package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ParquetBloomSpec extends SparkSpec {

  import spark.implicits._

  // Deterministic high-cardinality keys, deliberately UNSORTED so every
  // row group's [min,max] spans the whole domain — zone maps prune
  // nothing, only the bloom can.
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-bloom").toString + "/t"
    val df = spark.range(0, 60000, 1, 1)
      .select(((col("id") * 48271L) % 59999L).as("key"),
        (col("id") % 1000L).as("payload"))
    ParquetBloom.writeWithBloom(df, d, Seq("key"),
      rowGroupBytes = 256L * 1024, ndv = 60000L)
    d
  }

  test("every row group's key chunk carries a bloom filter") {
    val probes = ParquetBloom.bloomMaybeContains(spark, dir, "key", Seq(0L))
    assert(probes.nonEmpty)
    assert(probes.forall(_._4), "a row group is missing its bloom filter")
  }

  test("bloom membership: present keys answer maybe, absent keys answer " +
    "definitely-not in every group") {
    // key = (id * 48271) % 59999 with id < 60000 covers [0, 59999) fully
    // except nothing — so probe presence via values >= 59999 (absent) and
    // a directly computed present value.
    val present = (12345L * 48271L) % 59999L
    val absent = Seq(59999L, 70001L, 123456789L)
    val answers = ParquetBloom.bloomMaybeContains(
      spark, dir, "key", present +: absent)
    val (pres, abs) = answers.partition(_._3 == present)
    assert(pres.exists(_._5), "present key must hit in its group's bloom")
    // absent keys: no group may claim maybe (deterministic data ->
    // deterministic filters; a persistent false positive would surface
    // here as a stable failure, at which point pick another probe)
    assert(abs.forall(!_._5),
      s"absent key claimed present: ${abs.filter(_._5)}")
  }

  test("BLOOMFILTER-level row-group filtering prunes absent keys and " +
    "keeps present ones") {
    val present = (777L * 48271L) % 59999L
    val (keptP, totalP) =
      ParquetBloom.filteredRowGroups(spark, dir, "key", present)
    val (keptA, totalA) =
      ParquetBloom.filteredRowGroups(spark, dir, "key", 70001L)
    assert(totalP > 1, s"fixture must span multiple row groups, got $totalP")
    assert(keptP >= 1)
    assert(keptA == 0, s"absent key kept $keptA of $totalA groups")
    // and the zone maps genuinely cannot help here: the present key's
    // groups were kept by membership, not because the data was sorted
    assert(keptP < totalP,
      "unsorted keys should still prune some groups for a point lookup")
  }

  test("query results through bloom-enabled files match plain files") {
    val plain = Files.createTempDirectory("graft-bloom-plain").toString + "/t"
    spark.read.parquet(dir).write.parquet(plain)
    val keys = Seq((5L * 48271L) % 59999L, 70001L, (9L * 48271L) % 59999L)
    def q(p: String) = spark.read.parquet(p)
      .where(col("key").isin(keys: _*))
      .groupBy("key").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .orderBy("key").collect().toSeq
    assert(q(dir) == q(plain))
    assert(q(dir).nonEmpty)
  }
}
