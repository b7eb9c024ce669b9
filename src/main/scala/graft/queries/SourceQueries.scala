package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-gated source-format queries. Parquet is gated everywhere (every
  * other query reads it); this file gates the messy-ingest path a corpus
  * pipeline actually starts from: JSONL with corrupt lines.
  */
object SourceQueries {

  /** Deterministic JSONL fixture: 40 valid lines from a fixed formula
    * (identical bytes at every sf, so the static oracle SQL can name the
    * path) with two corrupt lines planted after line 10 and at EOF.
    * Idempotent rewrite — concurrent verifies at different scales write
    * the same content. */
  private val fixtureLangs = Seq("en", "es", "de", "fr", "ja")
  private[queries] lazy val jsonlFixturePath: String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft_jsonl_fixture.jsonl")
    val lines = (0 until 40).map { i =>
      s"""{"doc_id":$i,"lang":"${fixtureLangs(i % 5)}","n_chars":${100 + 7 * i}}"""
    }
    val (head, tail) = lines.splitAt(10)
    val content = (head ++ Seq("{\"doc_id\": oops, not json") ++ tail ++
      Seq("trailing garbage, also not json")).mkString("", "\n", "\n")
    java.nio.file.Files.write(p,
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    p.toString
  }

  val all: Seq[Q] = Seq(

    // JSONL ingest with corrupt-record accounting: PERMISSIVE parse; the
    // two planted corrupt lines are COUNTED independently on each side
    // (Spark via _corrupt_record, DuckDB via ignore_errors' null rows) —
    // a parser that silently drops or mis-parses a line flips either the
    // valid-row hashes or the summary row. At 100 TB this is the landing
    // scan: schema declared (no inference pass over the corpus), parse
    // scan-local, quarantine accounting in the same pass as the read.
    Q("q_source_jsonl", {
      val path = jsonlFixturePath // materialize at catalog build
      s"""WITH src AS (SELECT * FROM read_json('$path',
         |  format = 'newline_delimited',
         |  columns = {'doc_id': 'BIGINT', 'lang': 'VARCHAR',
         |             'n_chars': 'BIGINT'},
         |  ignore_errors = true))
         |SELECT doc_id, lang, n_chars FROM src WHERE doc_id IS NOT NULL
         |UNION ALL
         |SELECT -1, 'corrupt', count(*) FROM src WHERE doc_id IS NULL
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val path = jsonlFixturePath
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("n_chars", LongType),
        StructField("_corrupt_record", StringType)))
      val raw = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache() // Spark cannot filter on ONLY the corrupt column uncached
      val valid = raw.where(col("_corrupt_record").isNull)
        .select("doc_id", "lang", "n_chars")
      val summary = raw.where(col("_corrupt_record").isNotNull)
        .agg(count(lit(1)).as("n_chars"))
        .select(lit(-1L).as("doc_id"), lit("corrupt").as("lang"),
          col("n_chars"))
      valid.union(summary).orderBy("doc_id")
    },

    // Cross-format federation: the parquet corpus and the JSONL batch
    // unioned BY NAME (the jsonl fixture's column order differs from the
    // select order — positional union would silently cross-wire), then
    // one aggregation spanning both sources. At 100 TB this is the
    // landing union: yesterday's parquet warehouse + today's raw JSONL
    // drop queried as one table before conversion.
    Q("q_source_federated", {
      val path = jsonlFixturePath
      s"""WITH pq AS (SELECT 'parquet' AS src, lang, n_chars
         |            FROM documents WHERE doc_id < 40),
         |js AS (SELECT 'jsonl' AS src, lang, n_chars
         |       FROM read_json('$path',
         |         format = 'newline_delimited',
         |         columns = {'doc_id': 'BIGINT', 'lang': 'VARCHAR',
         |                    'n_chars': 'BIGINT'},
         |         ignore_errors = true)
         |       WHERE doc_id IS NOT NULL),
         |u AS (SELECT * FROM pq UNION ALL SELECT * FROM js)
         |SELECT src, lang, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS chars
         |FROM u GROUP BY src, lang ORDER BY src, lang""".stripMargin
    }) { (s, dir) =>
      import graft.engine.Tables.t
      val path = jsonlFixturePath
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("n_chars", LongType),
        StructField("_corrupt_record", StringType)))
      val pq = t(s, dir, "documents").where(col("doc_id") < 40)
        .select(lit("parquet").as("src"), col("lang"), col("n_chars"))
      val js = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .where(col("_corrupt_record").isNull)
        // deliberately different column order: unionByName must align
        .select(col("n_chars"), col("lang"), lit("jsonl").as("src"))
      pq.unionByName(js)
        .groupBy("src", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
        .orderBy("src", "lang")
    },

    // RFC 4180 CSV: quoted fields carrying the delimiter, doubled-quote
    // escapes, and an EMBEDDED NEWLINE — the shapes naive line-split
    // ingest corrupts silently. Spark needs multiLine + quote-escape
    // configured (the default escape is backslash, not RFC 4180);
    // DuckDB's reader is RFC-native — agreement IS the gate.
    Q("q_source_csv", {
      val path = csvFixturePath
      s"""SELECT id, title, val
         |FROM read_csv('$path', header = true,
         |  columns = {'id': 'BIGINT', 'title': 'VARCHAR', 'val': 'BIGINT'})
         |ORDER BY id""".stripMargin
    }) { (s, dir) =>
      val path = csvFixturePath
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("title", StringType),
        StructField("val", LongType)))
      s.read.schema(schema)
        .option("header", "true")
        .option("multiLine", "true")
        .option("quote", "\"").option("escape", "\"")
        .csv(path)
        .orderBy("id")
    },

    // ORC round-trip: the warehouse scan written to ORC and read back
    // through graft.sources.Formats, rolled up per language. DuckDB
    // cannot read ORC, so the oracle computes the SAME rollup from the
    // parquet source — agreement pins write/read fidelity (row loss,
    // type drift, or encoding damage in either direction flips a hash).
    // Every value column participates: counts, exact sums, and an md5
    // over the sorted per-doc fingerprints.
    Q("q_source_orc",
      """WITH h AS (SELECT lang, n_chars,
        |             md5(CAST(doc_id AS VARCHAR) || ':' || text) AS dh
        |           FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS chars,
        |       md5(string_agg(dh, ' ' ORDER BY dh)) AS docs_md5
        |FROM h GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, dir) =>
        import graft.sources.Formats
        val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          "graft_orc_roundtrip_" +
            Integer.toHexString(dir.hashCode)).toString
        Formats.writeOrc(graft.engine.Tables.t(s, dir, "documents"), tmp)
        Formats.readOrc(s, tmp)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"),
            md5(array_join(array_sort(collect_list(
              md5(concat(col("doc_id").cast("string"), lit(":"),
                col("text"))))), " ")).as("docs_md5"))
          .orderBy("lang")
    },

    // Avro OCF round-trip with planted damage: the corpus written as one
    // deflate container per partition (sources.AvroCodec — Spark ships
    // the Avro runtime but not the DataSource, so the codec drives the
    // container format through the binaryFile seam), read back and
    // rolled up per language. Two hostile files live in the same dir: a
    // mid-block-truncated container of fake 'xx' rows (the damaged block
    // must drop entirely, not partially decode) and a non-Avro byte blob
    // (dropped whole) — a leak from either creates an 'xx' group and
    // flips the row count. DuckDB cannot read Avro, so the oracle
    // recomputes the same rollup from the parquet source: agreement pins
    // write/read fidelity for every value of every column.
    Q("q_source_avro",
      """WITH h AS (SELECT lang, n_chars,
        |             md5(CAST(doc_id AS VARCHAR) || ':' || text) AS dh
        |           FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS chars,
        |       CAST(min(7919 * (1 + n_chars % 97)) AS BIGINT) AS probe,
        |       md5(string_agg(dh, ' ' ORDER BY dh)) AS docs_md5
        |FROM h GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      import graft.sources.AvroCodec
      val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft_avro_roundtrip_" +
          Integer.toHexString(dir.hashCode)).toString
      // clean slate — a stale dir from a wider-partition run would leak
      // extra part files into the glob
      val hPath = new org.apache.hadoop.fs.Path(tmp)
      val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(hPath, true)
      val docs = graft.engine.Tables.t(s, dir, "documents")
        .select("doc_id", "lang", "n_chars", "text")
      AvroCodec.writeAvro(docs, tmp)
      plantDamagedAvro(tmp)
      AvroCodec.readAvro(s, tmp, StructType(Seq(
          StructField("doc_id", LongType), StructField("lang", StringType),
          StructField("n_chars", LongType), StructField("text", StringType))))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"),
          min(lit(7919) * (lit(1) + col("n_chars") % 97))
            .cast("long").as("probe"),
          md5(array_join(array_sort(collect_list(
            md5(concat(col("doc_id").cast("string"), lit(":"),
              col("text"))))), " ")).as("docs_md5"))
        .orderBy("lang")
    },

    // Time travel (sources.Versioned): two successive commits of a
    // rollup table — the 1996 close and the 1997 close — then BOTH
    // versions read back through the pointer history and compared
    // against recomputing each from the facts. Reading v1 after v2
    // committed returning the 1996 numbers bit-for-bit IS the
    // reproducibility contract (yesterday's pipeline re-runs against
    // yesterday's inputs); the commit protocol (snapshot first, pointer
    // rename last) is what makes each version immutable. VersionedSpec
    // covers crash orphans and VACUUM.
    Q("q_source_timetravel",
      """WITH v1 AS (SELECT o_orderpriority AS prio, count(*) AS n
        |            FROM orders
        |            WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |            GROUP BY 1),
        |v2 AS (SELECT o_orderpriority AS prio, count(*) AS n
        |       FROM orders
        |       WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |       GROUP BY 1)
        |SELECT 1 AS version, prio, n FROM v1
        |UNION ALL SELECT 2 AS version, prio, n FROM v2
        |ORDER BY version, prio""".stripMargin) { (s, dir) =>
      import graft.sources.Versioned
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_timetravel").toString
      def rollup(cutoff: String) = graft.engine.Tables.t(s, dir, "orders")
        .where(col("o_orderdate") < lit(cutoff).cast("timestamp"))
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"))
      Versioned.write(rollup("1997-01-01"), tmp)
      Versioned.write(rollup("1998-01-01"), tmp)
      Versioned.read(s, tmp, Some(1)).withColumn("version", lit(1))
        .unionByName(Versioned.read(s, tmp, Some(2))
          .withColumn("version", lit(2)))
        .select("version", "prio", "n")
        .orderBy("version", "prio")
    },

    // Parquet schema evolution on read: a dataset whose later files
    // carry ADDED columns (the normal life of a long-lived corpus dir)
    // read as one frame with `mergeSchema` — old files surface NULL for
    // the new columns, nothing is dropped or cross-wired. The oracle
    // reads the same two generations with DuckDB's union_by_name.
    // Row-level: every value of every generation is hash-compared.
    Q("q_schema_merge",
      s"""SELECT doc_id, lang, n_chars, source
         |FROM read_parquet(['$schemaMergeV1/*.parquet',
         |                   '$schemaMergeV2/*.parquet'],
         |                  union_by_name = true)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      (0L until 40L).map(i => (i, fixtureLangs((i % 5).toInt)))
        .toDF("doc_id", "lang")
        .coalesce(1).write.mode("overwrite").parquet(schemaMergeV1)
      (40L until 80L).map(i => (i, fixtureLangs((i % 5).toInt),
          100L + 7L * i, s"src${i % 3}"))
        .toDF("doc_id", "lang", "n_chars", "source")
        .coalesce(1).write.mode("overwrite").parquet(schemaMergeV2)
      s.read.option("mergeSchema", "true")
        .parquet(schemaMergeV1, schemaMergeV2)
        .select("doc_id", "lang", "n_chars", "source")
        .orderBy("doc_id")
    },

    // Small-file compaction (Formats.compact): a deliberately fragmented
    // copy of orders (32 shards) compacts in place — coalesce (no
    // shuffle), staging dir + atomic swap — and the gate reads the
    // compacted table back against the ORIGINAL facts: every key must
    // survive, exactly once, which the per-group sorted-key md5 pins.
    // File-count mechanics (before/after, swap atomicity, sort-key
    // clustering) are FormatsSpec's; this gate owns row fidelity.
    Q("q_source_compact",
      """SELECT o_orderpriority AS prio, CAST(count(*) AS BIGINT) AS n,
        |       md5(string_agg(CAST(o_orderkey AS VARCHAR), ' '
        |                      ORDER BY o_orderkey)) AS keys_md5
        |FROM orders GROUP BY 1 ORDER BY prio""".stripMargin) { (s, dir) =>
      import graft.sources.Formats
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_compact").toString + "/orders"
      graft.engine.Tables.t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .repartition(32) // the small-file problem, planted
        .write.parquet(tmp)
      Formats.compact(s, tmp, targetBytes = 1L << 30)
      s.read.parquet(tmp)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("n"),
          md5(array_join(transform(array_sort(collect_list("o_orderkey")),
            _.cast("string")), " ")).as("keys_md5"))
        .orderBy("prio")
    },
  )

  /** Schema-evolution fixture dirs (written by the q_schema_merge gate
    * itself — parquet needs a SparkSession): v1 is the ORIGINAL schema
    * (doc_id, lang); v2 the EVOLVED one (+ n_chars, + source). Formula
    * content, idempotent overwrite, sf-independent — the static oracle
    * SQL can name the paths. */
  private[queries] lazy val schemaMergeV1: String = java.nio.file.Paths
    .get(sys.props("java.io.tmpdir"), "graft_schema_merge", "v1").toString
  private[queries] lazy val schemaMergeV2: String = java.nio.file.Paths
    .get(sys.props("java.io.tmpdir"), "graft_schema_merge", "v2").toString

  /** Plant the q_source_avro hostile files: a deflate OCF of five fake
    * lang='xx' rows (all in ONE block) truncated mid-block — intact-block
    * decoding must surrender all five — and a blob that is not an Avro
    * container at all. Idempotent fixed names, deterministic bytes. */
  private def plantDamagedAvro(dir: String): Unit = {
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter,
      GenericRecord}
    val st = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType), StructField("text", StringType)))
    val schema = graft.sources.AvroCodec.avroSchema(st)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(schema, bos)
    (1 to 5).foreach { i =>
      val rec = new GenericData.Record(schema)
      rec.put("doc_id", -i.toLong)
      rec.put("lang", "xx")
      rec.put("n_chars", 0L)
      rec.put("text", s"must never surface $i")
      w.append(rec)
    }
    w.close()
    val bytes = bos.toByteArray
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "damaged.avro"),
      java.util.Arrays.copyOf(bytes, bytes.length - 9))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "garbage.avro"),
      "this is not an avro object container file".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
  }

  /** RFC 4180 CSV fixture: 20 formula rows whose titles exercise quoted
    * commas, doubled-quote escapes, and one embedded newline. */
  private[queries] lazy val csvFixturePath: String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft_csv_fixture.csv")
    val rows = (0 until 20).map { i =>
      val title = i % 4 match {
        case 0 => s"plain title $i"
        case 1 => s"\"comma, inside $i\""
        case 2 => s"\"she said \"\"hi\"\" $i\""
        case _ => s"\"line one $i\nline two\""
      }
      s"$i,$title,${i * 11}"
    }
    val content = ("id,title,val" +: rows).mkString("", "\n", "\n")
    java.nio.file.Files.write(p,
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    p.toString
  }
}
