package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro object-container-file (OCF) leg of the source surface — the one
  * classic lake format the columnar readers (parquet/ORC/CSV/JSONL) don't
  * cover. Spark ships the core Avro runtime for its shuffle/IPC layers but
  * not the `avro` DataSource, so this codec drives the container format
  * directly, with the same discipline as the other byte-level seams
  * (`multimodal/WarcCodec`): scan-local decode behind `binaryFile`, a
  * bomb cap, and damage that surrenders only itself — a corrupt container
  * drops its own remaining blocks, never the scan.
  *
  * Reference anchor: the reference's load boundary is row-at-a-time
  * INSERTs from scraped frames (`imdb parser.py:237-248`); Avro OCF is the
  * standard row-major landing format that boundary produces at scale
  * (Kafka/connect dumps, Sqoop-era warehouse exports).
  *
  * Scale shape: WRITE side emits one container per partition (full write
  * parallelism, no driver funnel) through the Hadoop FS API, so the same
  * code lands on HDFS/object stores; READ side is file-per-task via the
  * `binaryFile` source with the size cap pushed down as a `length`
  * predicate — whole-file reads are the unit of parallelism, matching how
  * OCF is consumed when a splitter index is absent (sync-marker splitting
  * is an optimization for giant single files; lake landings are
  * many-file). Decode never shuffles.
  *
  * Type surface: the primitive column types the landing contract uses
  * (long/int/double/float/boolean/string/binary), each nullable via
  * `union(null, T)`. Nested rows stay parquet's job.
  */
object AvroCodec {

  /** Map a flat Spark schema onto an Avro record schema, every field
    * `union(null, T)` with null default (Spark columns are nullable). */
  def avroSchema(st: StructType): Schema = {
    val fields = st.fields.foldLeft(
      SchemaBuilder.record("GraftRow").namespace("graft").fields()) {
      (fs, f) =>
        f.dataType match {
          case LongType    => fs.optionalLong(f.name)
          case IntegerType => fs.optionalInt(f.name)
          case DoubleType  => fs.optionalDouble(f.name)
          case FloatType   => fs.optionalFloat(f.name)
          case BooleanType => fs.optionalBoolean(f.name)
          case StringType  => fs.optionalString(f.name)
          case BinaryType  => fs.optionalBytes(f.name)
          case other => throw new IllegalArgumentException(
            s"AvroCodec supports flat primitive columns; " +
              s"got ${f.name}: $other")
        }
    }
    fields.endRecord()
  }

  /** Write `df` as one deflate-compressed OCF per partition under `dir`
    * (created if absent, existing part files overwritten — the
    * truncate-reload shape). Runs on the executors through the Hadoop FS
    * API; the only driver-side values are the schema JSON and the path. */
  def writeAvro(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    // Avro Schema is not serializable across all runtime versions — ship
    // the canonical JSON and re-parse per partition.
    val schemaJson = avroSchema(st).toString
    val n = st.fields.length
    val types = st.fields.map(_.dataType)
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val path = new Path(dir, f"part-$pid%05d.avro")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(path, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(CodecFactory.deflateCodec(6))
        w.create(schema, out)
        try it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < n) {
            if (!row.isNullAt(i)) rec.put(i, types(i) match {
              case BinaryType =>
                java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
              case _ => row.get(i)
            })
            i += 1
          }
          w.append(rec)
        } finally w.close()
      }
      Iterator.empty[Int]
    }.count() // the action that runs the write
  }

  /** Decode one container's bytes into rows of `st`. Returns the rows of
    * every block that decodes intact; the first damaged block (truncation,
    * bit rot, codec damage) drops itself and the file's remainder. Bytes
    * that are not an OCF at all (bad magic / unparseable header) yield
    * nothing. Never throws. */
  def decodeContainer(bytes: Array[Byte], st: StructType): Seq[Row] = {
    if (bytes == null || bytes.length < 4) return Nil
    val out = ArrayBuffer.empty[Row]
    val n = st.fields.length
    try {
      val in = new java.io.ByteArrayInputStream(bytes)
      val reader = new DataFileStream[GenericRecord](
        in, new GenericDatumReader[GenericRecord]())
      try {
        val names = st.fields.map(_.name)
        while (reader.hasNext) {
          val rec = reader.next()
          val vals = new Array[Any](n)
          var i = 0
          while (i < n) {
            vals(i) = rec.get(names(i)) match {
              case null                            => null
              case u: org.apache.avro.util.Utf8    => u.toString
              case b: java.nio.ByteBuffer =>
                val a = new Array[Byte](b.remaining()); b.get(a); a
              case x                               => x
            }
            i += 1
          }
          out += Row.fromSeq(vals.toIndexedSeq)
        }
      } finally reader.close()
    } catch {
      case _: java.io.IOException | _: RuntimeException => () // keep prefix
    }
    out.toSeq
  }

  /** Read every `*.avro` container under `dir` as one DataFrame of `st`.
    * The size cap is pushed down on the `binaryFile` source's `length`
    * column, so over-cap containers are skipped without their bytes ever
    * being read; decode is scan-local ([[decodeContainer]] per file). */
  def readAvro(spark: SparkSession, dir: String, st: StructType,
               maxBytes: Long = 1L << 30): DataFrame = {
    val bin = spark.read.format("binaryFile").load(s"$dir/*.avro")
      .where(col("length") <= maxBytes)
      .select("content")
    val rows = bin.rdd.flatMap(r =>
      decodeContainer(r.getAs[Array[Byte]](0), st))
    spark.createDataFrame(rows, st)
  }
}
