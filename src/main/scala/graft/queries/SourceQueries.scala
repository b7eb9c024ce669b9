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
  )
}
