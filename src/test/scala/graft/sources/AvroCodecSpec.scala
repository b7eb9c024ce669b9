package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.Files

import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter,
  GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class AvroCodecSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("n", IntegerType),
    StructField("ok", BooleanType), StructField("blob", BinaryType)))

  private def container(rows: Seq[(Long, String)],
                        syncEvery: Int = Int.MaxValue): Array[Byte] = {
    val st = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val avro = AvroCodec.avroSchema(st)
    val bos = new ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avro))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(avro, bos)
    rows.zipWithIndex.foreach { case ((id, name), i) =>
      val rec = new GenericData.Record(avro)
      rec.put("id", id)
      rec.put("name", name)
      w.append(rec)
      if ((i + 1) % syncEvery == 0) w.sync() // force a block boundary
    }
    w.close()
    bos.toByteArray
  }

  test("avro round-trip preserves every supported type, nulls included") {
    val dir = Files.createTempDirectory("graft-avro").toString
    val rows = Seq(
      Row(1L, "a", 1.5, 7, true, Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, false, null),
      Row(null, "c", -0.25, -1, null, Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    AvroCodec.writeAvro(df, s"$dir/t")
    val back = AvroCodec.readAvro(spark, s"$dir/t", schema)
      .orderBy("id").collect()
    assert(back.length == 3)
    val byId = back.sortBy(r => Option(r.getAs[java.lang.Long]("id"))
      .map(_.toLong).getOrElse(Long.MinValue))
    assert(byId(1).getLong(0) == 1L && byId(1).getString(1) == "a" &&
      byId(1).getDouble(2) == 1.5 && byId(1).getInt(3) == 7 &&
      byId(1).getBoolean(4) &&
      byId(1).getAs[Array[Byte]](5).toSeq == Seq[Byte](1, 2, 3))
    assert(byId(2).isNullAt(1) && byId(2).isNullAt(2) &&
      byId(2).isNullAt(3) && !byId(2).getBoolean(4) && byId(2).isNullAt(5))
    assert(byId(0).isNullAt(0) && byId(0).getString(1) == "c")
  }

  test("a damaged block drops itself; intact leading blocks survive") {
    val st = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val bytes = container(
      (1L to 6L).map(i => (i, s"r$i")), syncEvery = 3)
    // cut into the final block: rows 1-3 (first block) must survive,
    // rows 4-6 must vanish with their block
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 9)
    val rows = AvroCodec.decodeContainer(cut, st)
    assert(rows.map(_.getLong(0)) == Seq(1L, 2L, 3L))
    // intact container sanity
    assert(AvroCodec.decodeContainer(bytes, st).length == 6)
  }

  test("bytes that are not an OCF decode to nothing, never throw") {
    val st = StructType(Seq(StructField("id", LongType)))
    assert(AvroCodec.decodeContainer(null, st).isEmpty)
    assert(AvroCodec.decodeContainer(Array[Byte](1, 2), st).isEmpty)
    assert(AvroCodec.decodeContainer(
      "Obj but then garbage".getBytes, st).isEmpty)
  }

  test("the size cap skips over-cap containers at the scan") {
    val dir = Files.createTempDirectory("graft-avro-cap").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    AvroCodec.writeAvro(df, s"$dir/t")
    val st = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    assert(AvroCodec.readAvro(spark, s"$dir/t", st).count() == 2)
    assert(AvroCodec.readAvro(spark, s"$dir/t", st, maxBytes = 16).count()
      == 0)
  }

  test("the decompression-bomb cap bounds decoded output, keeping the " +
      "under-cap prefix") {
    val st = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    // highly compressible payload: 400 rows × 5 KB of 'a' deflates to a
    // few KB on disk but expands to ~2 MB decoded
    val bytes = container(
      (1L to 400L).map(i => (i, "a" * 5000)), syncEvery = 16)
    assert(bytes.length < 100000, "fixture should compress far below 2 MB")
    val full = AvroCodec.decodeContainer(bytes, st)
    assert(full.length == 400)
    val capped = AvroCodec.decodeContainer(bytes, st, maxDecoded = 100000L)
    assert(capped.nonEmpty && capped.length < 400,
      s"cap kept ${capped.length} rows — expected a proper prefix")
    assert(capped.map(_.getLong(0)) == (1L to capped.length.toLong),
      "cap must keep the leading prefix, not an arbitrary subset")
    // the scan-level reader honors the same cap
    val dir = Files.createTempDirectory("graft-avro-bomb").toString
    Files.write(java.nio.file.Paths.get(dir, "bomb.avro"), bytes)
    assert(AvroCodec.readAvro(spark, dir, st,
      maxDecoded = 100000L).count() < 400)
  }

  test("sync-marker range reads decode one giant container in parallel, " +
      "identical to the whole-file read") {
    val st = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    // incompressible payload (md5 hex chains), so the container's on-disk
    // size comfortably spans several 4 KB split ranges
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(i: Long) = (0 until 4).map(j =>
      md.digest(s"$i-$j".getBytes).map("%02x".format(_)).mkString).mkString
    val bytes = container(
      (1L to 2000L).map(i => (i, hex(i))), syncEvery = 25)
    val dir = Files.createTempDirectory("graft-avro-split").toString
    Files.write(java.nio.file.Paths.get(dir, "big.avro"), bytes)
    assert(bytes.length > 16384,
      "fixture must span several 4 KB split ranges")
    val whole = AvroCodec.readAvro(spark, dir, st)
      .orderBy("id").collect().toSeq
    val split = AvroCodec.readAvroSplit(spark, dir, st, splitBytes = 4096L)
    assert(split.rdd.getNumPartitions > 1,
      "one giant container must fan out over multiple range tasks")
    assert(split.orderBy("id").collect().toSeq == whole,
      "range ownership must partition the file: no dropped/double blocks")
    // oversized split (one range) also agrees — boundary sanity
    assert(AvroCodec.readAvroSplit(spark, dir, st, splitBytes = 1L << 30)
      .orderBy("id").collect().toSeq == whole)
  }

  test("unsupported column types are rejected at schema mapping") {
    intercept[IllegalArgumentException] {
      AvroCodec.avroSchema(StructType(Seq(
        StructField("m", MapType(StringType, LongType)))))
    }
  }
}
