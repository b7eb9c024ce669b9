package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.{Scd2, Tables}
import graft.engine.Tables.t

/** Driver-gated queries for the historization engine (SURVEY.md §2 family J)
  * — the heart of the reference's `stg_checker` procedure, oracled in plain
  * SQL by replaying the same close-out / keep / insert legs in DuckDB.
  *
  * Snapshots are derived deterministically from `orders` so both engines see
  * identical inputs: snapshot A = orders before 1999 (the "first load");
  * snapshot B = orders before 2000 with a deterministic price change on
  * orderkeys divisible by 10 (the "second load" — changed attrs + new pks;
  * pks that vanished, i.e. none here, are covered by ScalaTest scenarios).
  */
object Scd2Queries {

  private val T1 = "2024-01-01 00:00:00"
  private val T2 = "2024-02-01 00:00:00"

  private def snapA(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "orders")
      .where(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_orderstatus", "o_totalprice")

  private def snapB(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "orders")
      .where(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 10 === 0,
          graft.functions.Rounding.roundCompat(col("o_totalprice") + 100, 2))
          .otherwise(col("o_totalprice")).as("o_totalprice"))

  private val sqlSnapA =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE o_orderdate < TIMESTAMP '1999-01-01'""".stripMargin

  private val sqlSnapB =
    """SELECT o_orderkey, o_orderstatus,
      |       CASE WHEN o_orderkey % 10 = 0
      |            THEN round(o_totalprice + 100, 2)
      |            ELSE o_totalprice END AS o_totalprice
      |FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'""".stripMargin

  val all: Seq[Q] = Seq(

    // J57-J61 — the SCD2 merge: load A at T1, merge B at T2. Output =
    // history ∪ closed-out ∪ kept-open ∪ new versions, one full-outer join
    // on pk (SURVEY §4.3).
    Q("q_scd2_merge", mergeOracle) {
      (s, dir) =>
        // valid_from/valid_to are projected as strings: the open-end sentinel
        // 9999-12-31 written as an INT96 parquet timestamp overflows
        // datetime64[ns] in nanosecond-based readers (pyarrow wraps it to a
        // pre-2262 value), corrupting the driver-side compare (ADVICE r1).
        // Both engines render '9999-12-31 00:00:00' identically as text.
        val target = Scd2.stamp(snapA(s, dir), T1)
        Scd2.merge(target, snapB(s, dir), pk = Seq("o_orderkey"),
            attrs = Seq("o_orderstatus", "o_totalprice"), loadTs = T2)
          .withColumn("valid_from", col("valid_from").cast("string"))
          .withColumn("valid_to", col("valid_to").cast("string"))
          .orderBy("o_orderkey", "valid_from", "valid_to")
    },

    // The STREAMING twin through the driver hash (EventStreams.scd2Sink):
    // a real foreachBatch query merges each arriving snapshot into the
    // parquet table behind a crash-safe swap — two one-shot streams
    // deliver load A then load B, and the final table must hash-match
    // the SAME oracle as the batch merge: micro-batch boundaries and the
    // swap machinery must be invisible in the history.
    Q("q_stream_scd2_replay", mergeOracle) { (s, dir) =>
      val tablePath = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft_scd2_stream",
        dir.replace('/', '_').replace(':', '_')).toString
      val fs = new org.apache.hadoop.fs.Path(tablePath)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tablePath), true)
      // each load is STAGED to a snapshot directory and ingested through
      // a real file-source readStream — no snapshot-sized collect, no
      // driver funnel: the sink sees exactly what a landing-zone
      // directory on a cluster would deliver
      def feed(snap: org.apache.spark.sql.DataFrame, ts: String,
               load: Int): Unit = {
        val stageDir = s"$tablePath.stage_$load"
        fs.delete(new org.apache.hadoop.fs.Path(stageDir), true)
        val projected = snap.select(col("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice"))
        projected.write.mode("overwrite").parquet(stageDir)
        graft.streaming.EventStreams.scd2Sink(
            s.readStream.schema(projected.schema).parquet(stageDir)
              .withColumn("load_ts", lit(ts).cast("timestamp")),
            tablePath, pk = Seq("o_orderkey"),
            attrs = Seq("o_orderstatus", "o_totalprice"),
            orderCol = "load_ts")
          .awaitTermination()
        fs.delete(new org.apache.hadoop.fs.Path(stageDir), true)
      }
      feed(snapA(s, dir), T1, 1)
      feed(snapB(s, dir), T2, 2)
      s.read.parquet(tablePath)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"),
          col("valid_from").cast("string").as("valid_from"),
          col("valid_to").cast("string").as("valid_to"))
        .orderBy("o_orderkey", "valid_from", "valid_to")
    },
  ) ++ rest

  /** J57-J61 — the SCD2 merge oracle, shared verbatim by the batch gate
    * and the streaming-sink replay gate (the stream must land on the
    * IDENTICAL table). Output = history ∪ closed-out ∪ kept-open ∪ new
    * versions (SURVEY §4.3). */
  private lazy val mergeOracle: String =
    s"""WITH a AS ($sqlSnapA),
       |     b AS ($sqlSnapB),
       |tgt AS (SELECT *, TIMESTAMP '$T1' AS valid_from,
       |               TIMESTAMP '9999-12-31' AS valid_to FROM a),
       |snap AS (SELECT *, TIMESTAMP '$T2' AS valid_from,
       |                TIMESTAMP '9999-12-31' AS valid_to FROM b),
       |diff AS (SELECT t.o_orderkey,
       |                (t.o_orderstatus != s.o_orderstatus
       |                 OR t.o_totalprice != s.o_totalprice) AS changed
       |         FROM tgt t JOIN snap s USING (o_orderkey)),
       |closed AS (
       |  SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice,
       |         t.valid_from, TIMESTAMP '$T2' AS valid_to
       |  FROM tgt t LEFT JOIN diff d USING (o_orderkey)
       |  WHERE d.o_orderkey IS NULL OR coalesce(d.changed, FALSE)),
       |kept AS (
       |  SELECT t.* FROM tgt t JOIN diff d USING (o_orderkey)
       |  WHERE NOT coalesce(d.changed, FALSE)),
       |ins AS (
       |  SELECT s.* FROM snap s LEFT JOIN diff d USING (o_orderkey)
       |  WHERE d.o_orderkey IS NULL OR coalesce(d.changed, FALSE))
       |SELECT o_orderkey, o_orderstatus, o_totalprice,
       |       CAST(valid_from AS VARCHAR) AS valid_from,
       |       CAST(valid_to AS VARCHAR) AS valid_to
       |FROM (SELECT * FROM closed UNION ALL SELECT * FROM kept
       |      UNION ALL SELECT * FROM ins)
       |ORDER BY o_orderkey, valid_from, valid_to""".stripMargin

  private def rest: Seq[Q] = Seq(

    // Point-in-time reconstruction (AsOfJoin.validAt over the merged SCD2
    // table): state as-of a timestamp BETWEEN the loads must equal
    // snapshot A verbatim, and as-of T2 must equal snapshot B — the oracle
    // is just the snapshot definition, so the whole merge + interval
    // filter machinery has to reproduce it exactly. Validity columns are
    // dropped from the output (the 9999 sentinel never reaches parquet).
    Q("q_scd2_pit",
      s"""SELECT 'mid' AS as_of, * FROM ($sqlSnapA)
         |UNION ALL
         |SELECT 't2', * FROM ($sqlSnapB)
         |ORDER BY as_of, o_orderkey""".stripMargin) { (s, dir) =>
      import graft.operators.AsOfJoin
      val merged = Scd2.merge(Scd2.stamp(snapA(s, dir), T1), snapB(s, dir),
        pk = Seq("o_orderkey"), attrs = Seq("o_orderstatus", "o_totalprice"),
        loadTs = T2)
      def at(tag: String, ts: String) =
        AsOfJoin.validAt(merged, lit(ts).cast("timestamp"))
          .select(lit(tag).as("as_of"), col("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice"))
      at("mid", "2024-01-15 00:00:00").union(at("t2", T2))
        .orderBy("as_of", "o_orderkey")
    },

    // J62 — insert-only-new (hubs/marts): target keeps its rows verbatim,
    // only unseen pks append (marts accrete, SURVEY.md J62).
    Q("q_scd2_insert_only",
      """SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 1000
        |UNION ALL
        |SELECT c_custkey, c_name || '!' FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_custkey <= 1000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val target = c.where(col("c_custkey") <= 1000)
        .select("c_custkey", "c_name")
      val snapshot = c.select(col("c_custkey"),
        concat(col("c_name"), lit("!")).as("c_name"))
      Scd2.insertOnlyNew(target, snapshot, Seq("c_custkey"))
        .orderBy("c_custkey")
    },

    // J63 — schema reconciliation: declared schema wins — cast present
    // columns, null-fill missing ones, drop undeclared ones (ddl.py:486-520).
    Q("q_schema_reconcile",
      """SELECT c_custkey, c_name, CAST(c_nationkey AS VARCHAR) AS c_nationkey,
        |       CAST(NULL AS INTEGER) AS loyalty_tier
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types._
      val declared = StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_nationkey", StringType),   // int → string migration
        StructField("loyalty_tier", IntegerType)  // newly declared → null
      ))
      Scd2.reconcile(t(s, dir, "customer"), declared)
        .orderBy("c_custkey")
    },

    // CDC-style snapshot diff: classify every pk across the two loads as
    // added / removed / changed / unchanged — one full-outer join on the
    // pk, the change-data-feed a downstream consumer reads instead of
    // re-scanning both snapshots. Removed is non-empty here because B's
    // date window shifts (A-only pks exist), so all four classes are
    // exercised.
    Q("q_snapshot_diff", {
      val a = """SELECT o_orderkey, o_totalprice FROM orders
                |WHERE o_orderdate < TIMESTAMP '1999-01-01'""".stripMargin
      val b = """SELECT o_orderkey,
                |  CASE WHEN o_orderkey % 10 = 0
                |       THEN round(o_totalprice + 100, 2)
                |       ELSE o_totalprice END AS o_totalprice
                |FROM orders
                |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                |  AND o_orderdate < TIMESTAMP '2000-01-01'""".stripMargin
      s"""WITH a AS ($a), b AS ($b)
         |SELECT coalesce(a.o_orderkey, b.o_orderkey) AS pk,
         |       CASE WHEN a.o_orderkey IS NULL THEN 'added'
         |            WHEN b.o_orderkey IS NULL THEN 'removed'
         |            WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
         |              THEN 'changed'
         |            ELSE 'unchanged' END AS change
         |FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
         |ORDER BY pk""".stripMargin
    }) { (s, dir) =>
      val o = t(s, dir, "orders")
      val a = o.where(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_totalprice"))
      val b = o.where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 10 === 0,
            graft.functions.Rounding.roundCompat(col("o_totalprice") + 100, 2))
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      a.alias("a").join(b.alias("b"),
          col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
        .select(
          coalesce(col("a.o_orderkey"), col("b.o_orderkey")).as("pk"),
          when(col("a.o_orderkey").isNull, "added")
            .when(col("b.o_orderkey").isNull, "removed")
            .when(!(col("a.o_totalprice") <=> col("b.o_totalprice")),
              "changed")
            .otherwise("unchanged").as("change"))
        .orderBy("pk")
    },

    // H56/J64 — SQL-TEXT registry execution: the reference's metadata rows
    // store SQL strings run via dynamic SQL (ddl.py:559-570). The gate
    // seeds a Warehouse with source tables and executes REGISTERED TEXT
    // through Runner.sqlTransform (temp views + spark.sql); the oracle is
    // the IDENTICAL text, so both engines run the same registry row.
    // Scale: the text compiles through Catalyst like any DataFrame plan —
    // broadcast join on the dim, partial agg, no interpretation overhead.
    Q("q_registry_sql",
      """SELECT r.r_name AS region_name, count(*) AS n_nations
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY region_name""".stripMargin) { (s, dir) =>
      val wh = new graft.engine.Runner.Warehouse(s)
      wh.put("nation", t(s, dir, "nation"))
      wh.put("region", t(s, dir, "region"))
      graft.engine.Runner.sqlTransform(
        """SELECT r.r_name AS region_name, count(*) AS n_nations
          |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
          |GROUP BY r.r_name ORDER BY region_name""".stripMargin)(wh)
    },

    // CDC changelog application (operators.Cdc.applyChangelog): a
    // deterministic event log over the orders snapshot exercises every
    // last-writer-wins case — update (U@1), update-then-delete (U@1,D@2),
    // delete (D@1), delete-then-update (D@1,U@2 — the key survives with
    // the U payload), and inserts of brand-new keys — folded into current
    // state in two pk-keyed exchanges (changelog argmax + snapshot anti
    // join). The oracle replays the same log with a window argmax; the
    // hash pins that replaying a delta equals the state it encodes,
    // CDC's entire correctness contract.
    Q("q_cdc_apply",
      """WITH snap AS (SELECT o_orderkey AS k, o_custkey AS c,
        |                     o_totalprice AS p
        |              FROM orders),
        |chg AS (
        |  SELECT k, c, p + 1000.0 AS p, 'U' AS op, 1 AS lsn FROM snap
        |  WHERE k % 10 = 3
        |  UNION ALL SELECT k, c, p, 'D', 2 FROM snap WHERE k % 20 = 3
        |  UNION ALL SELECT k, c, p, 'D', 1 FROM snap WHERE k % 10 = 7
        |  UNION ALL SELECT k, c, p * 2.0, 'U', 2 FROM snap
        |  WHERE k % 20 = 7
        |  UNION ALL SELECT k + 100000000, c, 999.0, 'I', 1 FROM snap
        |  WHERE k % 100 = 1),
        |latest AS (SELECT k, c, p, op FROM (
        |  SELECT k, c, p, op,
        |         row_number() OVER (PARTITION BY k ORDER BY lsn DESC) AS rn
        |  FROM chg) WHERE rn = 1),
        |kept AS (SELECT s.k, s.c, s.p FROM snap s
        |         LEFT JOIN latest l ON s.k = l.k WHERE l.k IS NULL),
        |outp AS (SELECT k, c, p FROM kept
        |         UNION ALL SELECT k, c, p FROM latest WHERE op <> 'D')
        |SELECT k AS o_orderkey, c AS o_custkey, round(p, 4) AS price
        |FROM outp ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val snap = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
          col("o_totalprice").as("p"))
      def slice(m: Int, r: Int) = snap.where(col("k") % m === r)
      val chg = slice(10, 3)
        .select(col("k"), col("c"), (col("p") + 1000.0).as("p"),
          lit("U").as("op"), lit(1).as("lsn"))
        .unionByName(slice(20, 3).select(col("k"), col("c"), col("p"),
          lit("D").as("op"), lit(2).as("lsn")))
        .unionByName(slice(10, 7).select(col("k"), col("c"), col("p"),
          lit("D").as("op"), lit(1).as("lsn")))
        .unionByName(slice(20, 7).select(col("k"), col("c"),
          (col("p") * 2.0).as("p"), lit("U").as("op"), lit(2).as("lsn")))
        .unionByName(slice(100, 1).select((col("k") + 100000000L).as("k"),
          col("c"), lit(999.0).as("p"), lit("I").as("op"),
          lit(1).as("lsn")))
      graft.operators.Cdc.applyChangelog(snap, chg, Seq("k"))
        .select(col("k").as("o_orderkey"), col("c").as("o_custkey"),
          graft.functions.Rounding.round4(col("p")).as("price"))
        .orderBy("o_orderkey")
    },

    // The inverse CDC direction (Cdc.diffToChangelog): derive the
    // MINIMAL I/U/D event log that turns snapshot A (orders before 1999)
    // into snapshot B (a shifted window with planted price changes) —
    // new keys emit I with B's payload, vanished keys emit D carrying
    // A's payload, null-safe attribute comparison emits U. One
    // full-outer join on the pk; unchanged keys emit NOTHING, which is
    // the entire point of shipping deltas instead of snapshots. The
    // apply gate (q_cdc_apply) plus this one pin both directions of the
    // diff↔apply round trip the spec closes.
    Q("q_cdc_diff",
      """WITH a AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders
        |           WHERE o_orderdate < TIMESTAMP '1999-01-01'),
        |b AS (SELECT o_orderkey AS k,
        |             CASE WHEN o_orderkey % 10 = 0
        |                  THEN round(o_totalprice + 100, 2)
        |                  ELSE o_totalprice END AS p
        |      FROM orders
        |      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |        AND o_orderdate < TIMESTAMP '2000-01-01')
        |SELECT coalesce(a.k, b.k) AS k,
        |       round(CASE WHEN a.k IS NULL OR b.k IS NOT NULL
        |                  THEN b.p ELSE a.p END, 4) AS p,
        |       CASE WHEN a.k IS NULL THEN 'I'
        |            WHEN b.k IS NULL THEN 'D'
        |            ELSE 'U' END AS op,
        |       1 AS lsn
        |FROM a FULL OUTER JOIN b ON a.k = b.k
        |WHERE a.k IS NULL OR b.k IS NULL
        |   OR a.p IS DISTINCT FROM b.p
        |ORDER BY k""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val a = o.where(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      val b = o.where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 10 === 0,
            graft.functions.Rounding.roundCompat(col("o_totalprice") + 100, 2))
            .otherwise(col("o_totalprice")).as("p"))
      graft.operators.Cdc.diffToChangelog(a, b, Seq("k"))
        .select(col("k"), graft.functions.Rounding.round4(col("p")).as("p"),
          col("op"), col("lsn").cast("int").as("lsn"))
        .orderBy("k")
    },
  )
}
