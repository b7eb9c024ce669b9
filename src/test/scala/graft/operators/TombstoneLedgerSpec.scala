package graft.operators

import graft.SparkSpec

class TombstoneLedgerSpec extends SparkSpec {

  import spark.implicits._

  private def fsFor(root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("flat appends and batch-scoped appends read as one distinct set") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ledger").toString + "/tombstones"
    TombstoneLedger.append(Seq(1L, 2L, 2L).toDF("x"), root)
    TombstoneLedger.append(Seq(2L, 3L).toDF("x"), root)
    TombstoneLedger.appendBatch(Seq(4L).toDF("x"), root, "tag", 0L)
    val got = TombstoneLedger.df(spark, root, "id")
      .get.as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L), s"ledger read: $got")
  }

  test("a replayed batch overwrites its slot; clear drops exactly the " +
      "consumed files and emptied batch dirs") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ledger2").toString + "/tombstones"
    val fs = fsFor(root)
    TombstoneLedger.append(Seq(1L).toDF("x"), root)
    TombstoneLedger.appendBatch(Seq(2L).toDF("x"), root, "t", 7L)
    TombstoneLedger.appendBatch(Seq(3L).toDF("x"), root, "t", 7L) // replay
    val snapshot = TombstoneLedger.files(fs, root)
    assert(TombstoneLedger.dfFrom(spark, snapshot, "id")
      .get.as[Long].collect().sorted.toSeq == Seq(1L, 3L),
      "replayed batch must overwrite, not accrete")
    // a late delete lands AFTER the snapshot
    TombstoneLedger.append(Seq(9L).toDF("x"), root)
    TombstoneLedger.clear(fs, root, snapshot)
    val survivors = TombstoneLedger.df(spark, root, "id")
      .map(_.as[Long].collect().sorted.toSeq).getOrElse(Nil)
    assert(survivors == Seq(9L),
      s"late tombstone must survive clear: $survivors")
  }

  test("an empty or absent ledger reads as None; reset removes all") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ledger3").toString + "/tombstones"
    val fs = fsFor(root)
    assert(TombstoneLedger.df(spark, root, "id").isEmpty)
    TombstoneLedger.append(Seq(1L).toDF("x"), root)
    TombstoneLedger.reset(fs, root)
    assert(TombstoneLedger.df(spark, root, "id").isEmpty)
  }
}
