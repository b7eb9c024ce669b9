package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AudioCodec, GifCodec, ImageCodec, WarcCodec}

/** Deterministic mutation-fuzz over every byte-level parser: random
  * payloads and corrupted-real payloads must parse to None or a sane
  * value — never throw, never hang. The hostile-input bugs this class
  * has actually caught (the WAV zero-step cursor in round 9, the PNG
  * FDICT inflate spin in round 10) were both "valid-prefix, hostile
  * middle" shapes, which is exactly what the mutation arm generates.
  * No SparkSession needed: parsers are plain functions.
  */
class MultimodalFuzzSpec extends AnyFunSuite {

  private val rnd = new java.util.Random(0x5eed5eedL)

  private def randomBytes(n: Int): Array[Byte] = {
    val b = new Array[Byte](n); rnd.nextBytes(b); b
  }

  /** Flip 1-4 bytes, or truncate, or splice random bytes mid-stream. */
  private def mutate(base: Array[Byte]): Array[Byte] =
    rnd.nextInt(3) match {
      case 0 =>
        val b = base.clone()
        (0 until 1 + rnd.nextInt(4)).foreach { _ =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        }
        b
      case 1 => base.take(rnd.nextInt(base.length + 1))
      case _ =>
        val at = rnd.nextInt(base.length)
        base.take(at) ++ randomBytes(1 + rnd.nextInt(16)) ++ base.drop(at)
    }

  private def exercise(name: String, valid: Seq[Array[Byte]],
                       parsers: Seq[Array[Byte] => Any]): Unit = {
    // pure-random arm
    (0 until 200).foreach { _ =>
      val b = randomBytes(rnd.nextInt(400))
      parsers.foreach(p => p(b))
    }
    // mutation arm: corrupted versions of every valid asset
    valid.foreach { base =>
      (0 until 120).foreach { _ =>
        val b = mutate(base)
        parsers.foreach(p => p(b))
      }
    }
    // null and empty are table stakes
    parsers.foreach { p => p(null); p(Array.emptyByteArray) }
  }

  test("image parsers survive random and mutated payloads") {
    val px = Array.tabulate(9 * 7)(k => (k * 5 % 251).toByte)
    val valid = Seq(
      ImageCodec.buildPng(33, 44, pad = 5),
      ImageCodec.buildBmp(12, 9, pad = 2),
      ImageCodec.buildJpeg(65, 43, pad = 7),
      ImageCodec.buildPngPixels(9, 7, 1, px),
      ImageCodec.buildPngPixelsInterlaced(9, 7, 1, px),
      ImageCodec.addPngTexts(ImageCodec.buildPngPixels(9, 7, 1, px),
        Seq("k" -> "v", "a" -> "b c")))
    exercise("image", valid, Seq(
      b => ImageCodec.parse(b),
      b => ImageCodec.parsePngPixels(b),
      b => ImageCodec.parsePngTexts(b),
      b => ImageCodec.stripPngMetadata(b)))
  }

  test("gif parsers survive random and mutated payloads") {
    val pal = Array.tabulate(3 * 8)(j => (j * 11 % 256).toByte)
    val idx = Array.tabulate(10 * 6)(k => (k % 8).toByte)
    val valid = Seq(
      GifCodec.buildGif(16, 16,
        Seq((0, 0, 4, 3, 10), (1, 1, 5, 4, 12)), i => i + 1),
      GifCodec.buildGifPixels(10, 6, pal, idx, interlaced = false),
      GifCodec.buildGifPixels(10, 6, pal, idx, interlaced = true))
    exercise("gif", valid, Seq(
      b => GifCodec.parseFrames(b),
      b => GifCodec.parseGifPixels(b)))
  }

  test("jpeg entropy decoder survives random and mutated payloads") {
    import graft.multimodal.JpegCodec
    val progressive = {
      val img = new java.awt.image.BufferedImage(24, 16,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 16; x <- 0 until 24)
        img.getRaster.setSample(x, y, 0, (x * 9 + y * 5) % 256)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null),
        param)
      writer.dispose(); ios.close()
      bos.toByteArray
    }
    val valid = Seq(
      JpegCodec.buildJpegDcOnly(16, 16, Array(0, 255, 7, 200)),
      JpegCodec.buildJpegDcOnly(24, 8, Array(10, 20, 30)),
      JpegCodec.buildJpegDcOnly(32, 8, Array(9, 250, 17, 180),
        restartInterval = 2),
      JpegCodec.buildJpegDcOnlyProgressive(16, 16, Array(3, 130, 255, 0)),
      progressive)
    exercise("jpeg", valid, Seq(
      b => JpegCodec.decodeJpegPixels(b)))
  }

  test("mp4 parsers survive random and mutated payloads") {
    import graft.multimodal.Mp4Codec
    def sample(j: Int) = Array.tabulate(6 + j)(k => (k * 7 + j).toByte)
    val video = Mp4Codec.TrackSpec("vide", 600L, 20L,
      (0 until 5).map(sample), width = 32, height = 24)
    val audio = Mp4Codec.TrackSpec("soun", 8000L, 100L,
      Seq(Array[Byte](1, 2), Array[Byte](3, 4)))
    val valid = Seq(
      Mp4Codec.buildMp4(Seq(video)),
      Mp4Codec.buildMp4(Seq(video, audio)),
      Mp4Codec.buildMp4(Seq(video.copy(samples = Seq(sample(0))))),
      Mp4Codec.buildFragmentedMp4(Seq(video, audio)),
      Mp4Codec.buildFragmentedMp4(Seq(video), samplesPerFragment = 3))
    exercise("mp4", valid, Seq(
      b => Mp4Codec.parseMp4Meta(b),
      b => Mp4Codec.parseMp4SampleRanges(b)))
  }

  test("warc parser survives random and mutated payloads") {
    val valid = Seq(
      WarcCodec.buildWarcGz(Seq(
        WarcCodec.WarcRecord("warcinfo", None, Some("2026-01-01T00:00:00Z"),
          "software: graft\r\n".getBytes("UTF-8")),
        WarcCodec.WarcRecord("response", Some("https://example.com/doc/1"),
          Some("2026-01-01T00:00:01Z"),
          WarcCodec.httpResponsePayload(200, "hello warc".getBytes("UTF-8"))),
        WarcCodec.WarcRecord("request", Some("https://example.com/doc/1"),
          Some("2026-01-01T00:00:01Z"),
          "GET /doc/1 HTTP/1.1\r\n\r\n".getBytes("UTF-8")))),
      WarcCodec.buildWarcGz(Seq(
        WarcCodec.WarcRecord("response", Some("https://example.com/doc/2"),
          None, WarcCodec.httpResponsePayload(404, Array.emptyByteArray)))))
    exercise("warc", valid, Seq(
      b => WarcCodec.parseWarcGz(b),
      b => WarcCodec.parseWarcGz(b, maxBytes = 64),
      b => WarcCodec.httpBody(if (b == null) Array.emptyByteArray else b)))
  }

  test("avro container decoder survives random and mutated payloads") {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    def container(n: Int, deflate: Boolean): Array[Byte] = {
      val avro = graft.sources.AvroCodec.avroSchema(st)
      val bos = new java.io.ByteArrayOutputStream()
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](avro))
      if (deflate)
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      w.create(avro, bos)
      (0 until n).foreach { i =>
        val rec = new org.apache.avro.generic.GenericData.Record(avro)
        rec.put("id", i.toLong)
        rec.put("name", s"row $i")
        w.append(rec)
        if (i % 7 == 6) w.sync()
      }
      w.close()
      bos.toByteArray
    }
    val valid = Seq(container(20, deflate = true),
      container(3, deflate = false))
    exercise("avro", valid, Seq(
      b => graft.sources.AvroCodec.decodeContainer(b, st)))
  }

  test("wav parsers survive random and mutated payloads") {
    val valid = Seq(
      AudioCodec.buildWav(2, 44100, 16, 1234L, listPad = 3),
      AudioCodec.buildWavPcm(1, 8000, 16, Array(5, -5, 100, -32768)),
      AudioCodec.buildWavPcm(1, 8000, 8, Array(0, 255, 17)),
      AudioCodec.addWavInfo(
        AudioCodec.buildWavPcm(1, 8000, 16, Array(9, -9)),
        Seq("IART" -> "a", "ICMT" -> "longer odd value")))
    exercise("wav", valid, Seq(
      b => AudioCodec.parseWav(b),
      b => AudioCodec.parseWavSamples(b),
      b => AudioCodec.parseWavInfo(b),
      b => AudioCodec.stripWavMetadata(b)))
  }
}
