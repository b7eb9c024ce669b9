package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SCD2 merge invariants over a 3-load scenario (SURVEY.md §5.2 #2):
  * initial load, changed attributes, vanished pk.
  */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private val T1 = "2024-01-01 00:00:00"
  private val T2 = "2024-02-01 00:00:00"
  private val T3 = "2024-03-01 00:00:00"

  private def snap(rows: (String, String, Int)*): DataFrame =
    rows.toDF("pk", "attr", "num")

  private def merged3: DataFrame = {
    // load 1: a,b,c — load 2: a unchanged, b changed, c vanished, d new —
    // load 3: b changed back.
    val l1 = snap(("a", "x", 1), ("b", "y", 2), ("c", "z", 3))
    val l2 = snap(("a", "x", 1), ("b", "y2", 2), ("d", "w", 4))
    val l3 = snap(("a", "x", 1), ("b", "y", 2), ("d", "w", 4))
    val t1 = Scd2.stamp(l1, T1)
    val t2 = Scd2.merge(t1, l2, Seq("pk"), Seq("attr", "num"), T2)
    Scd2.merge(t2, l3, Seq("pk"), Seq("attr", "num"), T3)
  }

  test("exactly one open row per live pk") {
    val open = merged3.filter(col(Scd2.ValidTo) === Scd2.OpenEnd)
    val counts = open.groupBy("pk").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 1L, "b" -> 1L, "d" -> 1L)) // c closed out
  }

  test("no overlapping validity intervals per pk") {
    val rows = merged3.select("pk", "valid_from", "valid_to")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
    rows.groupBy(_._1).foreach { case (_, vs) =>
      val sorted = vs.toSeq.sortBy(_._2.getTime)
      sorted.sliding(2).foreach {
        case Seq((_, _, end1), (_, from2, _)) =>
          assert(!from2.before(end1), s"overlap in $sorted")
        case _ =>
      }
    }
  }

  test("changed pk accumulates the full version history") {
    val b = merged3.filter(col("pk") === "b")
      .orderBy("valid_from").collect()
    assert(b.length == 3) // y → y2 → y
    assert(b.map(_.getAs[String]("attr")).toSeq == Seq("y", "y2", "y"))
    // closed rows carry the next version's load ts
    assert(b(0).getAs[java.sql.Timestamp]("valid_to").toString
      .startsWith("2024-02-01"))
    assert(b(1).getAs[java.sql.Timestamp]("valid_to").toString
      .startsWith("2024-03-01"))
  }

  test("vanished pk is closed, not deleted") {
    val c = merged3.filter(col("pk") === "c").collect()
    assert(c.length == 1)
    assert(c(0).getAs[java.sql.Timestamp]("valid_to").toString
      .startsWith("2024-02-01"))
  }

  test("null attribute change is UNKNOWN → treated unchanged (J59 parity)") {
    val withNull = Seq(("a", null.asInstanceOf[String], 1)).toDF("pk", "attr", "num")
    val t1 = Scd2.stamp(withNull, T1)
    val out = Scd2.merge(t1, snap(("a", "x", 1)), Seq("pk"),
      Seq("attr", "num"), T2)
    // null != 'x' is UNKNOWN in PG → row not closed, no new version
    assert(out.count() == 1)
    assert(out.filter(col(Scd2.ValidTo) === Scd2.OpenEnd).count() == 1)
  }

  test("insertOnlyNew never mutates existing rows (mart accretion J62)") {
    val target = snap(("a", "x", 1), ("b", "y", 2))
    val snapshot = snap(("a", "CHANGED", 9), ("c", "z", 3))
    val out = Scd2.insertOnlyNew(target, snapshot, Seq("pk"))
    assert(out.count() == 3)
    assert(out.filter(col("pk") === "a").select("attr").as[String]
      .collect().toSeq == Seq("x"))
  }

  test("insertOnlyNew never inserts NULL pks (PG NOT IN parity)") {
    val nullPk = Seq((null.asInstanceOf[String], "v", 1)).toDF("pk", "attr", "num")
    val run1 = Scd2.insertOnlyNew(snap(("a", "x", 1)), nullPk, Seq("pk"))
    assert(run1.count() == 1) // NULL-pk row not inserted...
    val run2 = Scd2.insertOnlyNew(run1, nullPk, Seq("pk"))
    assert(run2.count() == 1) // ...and cannot accrete across runs
  }

  test("preprocessActors passes NULL-role rows through unrotated (B18 parity)") {
    val actors = Seq(
      ("M", 100, "Name", "Role", "actor"),
      ("M", 100, "RotatedName", "actor", null.asInstanceOf[String]),
      ("M", 100, "N2", "R2", null.asInstanceOf[String])
    ).toDF("movie_name", "movie_duration", "name", "raw_role", "role")
    val out = CoreQueries.preprocessActors(actors)
    // PG `role not in (...)` is UNKNOWN for NULL → neither rotated nor
    // deleted: all 3 rows survive, NULL-role names untouched
    assert(out.count() == 3)
    assert(out.filter(col("role").isNull).select("name").as[String]
      .collect().toSet == Set("RotatedName", "N2"))
  }

  test("merge survives exact-duplicate snapshot rows (pk-unique contract)") {
    val dup = snap(("a", "x", 1), ("a", "x", 1), ("b", "y", 2))
    val out = Scd2.merge(Scd2.stamp(snap(("b", "y", 2)), T1), dup,
      Seq("pk"), Seq("attr", "num"), T2)
    assert(out.count() == 2) // one open row per pk, no multiplication
    assert(out.filter(col(Scd2.ValidTo) === Scd2.OpenEnd).count() == 2)
  }

  test("reconcile is idempotent and enforces the declared schema") {
    import org.apache.spark.sql.types._
    val declared = StructType(Seq(
      StructField("pk", StringType), StructField("num", StringType),
      StructField("extra", IntegerType)))
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    val once = Scd2.reconcile(snap(("a", "x", 1)), declared)
    val twice = Scd2.reconcile(once, declared)
    // nullability is derived by Spark (a cast of a non-null column stays
    // non-null) — the declared contract is names + types.
    assert(shape(once.schema) == shape(declared))
    assert(shape(twice.schema) == shape(declared))
    assert(once.collect().toSeq == twice.collect().toSeq)
    assert(once.head.getString(1) == "1") // int → string cast
    assert(once.head.isNullAt(2))         // missing → typed null
  }
}

/** CDC changelog application invariants: last-writer-wins ordering,
  * loud rejection of malformed logs, and the diff→apply round trip. */
class CdcSpec extends SparkSpec {

  import spark.implicits._
  import graft.operators.Cdc

  private def snap: DataFrame =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "amt")

  test("applyChangelog: LWW picks the highest lsn; D removes; I inserts") {
    val chg = Seq(
      (1L, "a2", 11.0, "U", 1L), (1L, "a3", 12.0, "U", 2L), // latest wins
      (2L, "b", 20.0, "D", 1L),                             // delete
      (3L, "c", 30.0, "D", 1L), (3L, "c2", 33.0, "U", 2L),  // D then U: kept
      (9L, "z", 99.0, "I", 1L))                             // brand new
      .toDF("id", "name", "amt", "op", "lsn")
    val out = Cdc.applyChangelog(snap, chg, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a3", 12.0), (3L, "c2", 33.0), (9L, "z", 99.0)))
  }

  test("applyChangelog refuses duplicate (pk, lsn) and unknown ops") {
    val dup = Seq((1L, "x", 1.0, "U", 1L), (1L, "y", 2.0, "U", 1L))
      .toDF("id", "name", "amt", "op", "lsn")
    val e1 = intercept[IllegalArgumentException] {
      Cdc.applyChangelog(snap, dup, Seq("id"))
    }
    assert(e1.getMessage.contains("ambiguous"))
    val bad = Seq((1L, "x", 1.0, "X", 1L)).toDF("id", "name", "amt", "op", "lsn")
    val e2 = intercept[IllegalArgumentException] {
      Cdc.applyChangelog(snap, bad, Seq("id"))
    }
    assert(e2.getMessage.contains("outside I/U/D"))
  }

  test("diffToChangelog emits the minimal I/U/D log and round-trips") {
    val after = Seq((1L, "a", 10.0),   // unchanged → no event
        (2L, "b2", 21.0),              // changed → U
        (4L, "d", 40.0))               // new → I   (3 vanished → D)
      .toDF("id", "name", "amt")
    val log = Cdc.diffToChangelog(snap, after, Seq("id"))
    val ops = log.select("id", "op").as[(Long, String)].collect().toMap
    assert(ops == Map(2L -> "U", 3L -> "D", 4L -> "I"))
    val replayed = Cdc.applyChangelog(snap, log, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(replayed == after.orderBy("id")
      .as[(Long, String, Double)].collect().toSeq)
  }
}
