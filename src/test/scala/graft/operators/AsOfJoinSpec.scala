package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 11:00:00"), 110.0),
    (2L, ts("2024-01-01 10:30:00"), 200.0)
  ).toDF("k", "ts", "price")

  private val trades = Seq(
    (1L, ts("2024-01-01 10:30:00"), "t1"), // → quote 10:00 (100)
    (1L, ts("2024-01-01 11:00:00"), "t2"), // → quote 11:00 (tie, inclusive)
    (1L, ts("2024-01-01 09:00:00"), "t3"), // → no quote yet (null)
    (2L, ts("2024-01-01 12:00:00"), "t4"), // → quote 10:30 (200)
    (3L, ts("2024-01-01 12:00:00"), "t5")  // → key never quoted (null)
  ).toDF("k", "ts", "trade_id")

  test("asof matches latest right row at-or-before each left row") {
    val out = AsOfJoin.asof(trades, quotes, Seq("k"), "ts", Seq("price"))
      .select("trade_id", "price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null
                                   else r.getDouble(1))).toMap
    assert(out == Map("t1" -> 100.0, "t2" -> 110.0, "t3" -> null,
      "t4" -> 200.0, "t5" -> null))
  }

  test("validAt selects exactly the SCD2 rows covering the instant") {
    val scd2 = Seq(
      ("a", ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00"), "v1"),
      ("a", ts("2024-02-01 00:00:00"), ts("9999-12-31 00:00:00"), "v2")
    ).toDF("pk", "valid_from", "valid_to", "v")
    assert(AsOfJoin.validAt(scd2, lit("2024-01-15 00:00:00").cast("timestamp"))
      .select("v").as[String].collect().toSeq == Seq("v1"))
    // boundary instant belongs to the NEW version ([from, to) intervals)
    assert(AsOfJoin.validAt(scd2, lit("2024-02-01 00:00:00").cast("timestamp"))
      .select("v").as[String].collect().toSeq == Seq("v2"))
  }
}
