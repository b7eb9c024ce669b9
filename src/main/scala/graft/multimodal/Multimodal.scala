package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The Spark-side architecture is real — schema, partitioning, batch shape,
  * and the mapPartitions seam where a decoder plugs in. Dimension metadata
  * is decoded from REAL bytes ([[ImageCodec]]: PNG/BMP header parsing in
  * [[decodeImageMeta]]); full pixel decode (feature vectors, resampling)
  * is a DETERMINISTIC FAKE (clearly marked below) because pixel codecs
  * aren't available in this environment, and the engine's job is the
  * dataflow, not the codec. Swapping `fakeDecode` for an actual decoder
  * (JNI/FFI or a Python worker via Arrow batches) changes no plan shape.
  *
  * Scale notes: payloads stay columnar parquet binary — never strings,
  * never driver-collected. Feature extraction is scan-local (no shuffle);
  * `repartition(byteBudget)` ahead of decode balances skew from variable
  * payload sizes.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, duration_ms: Long)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           checksum: Long, feature: Array[Float])

  /** Build a media table from the documents corpus: payload = UTF-8 bytes,
    * metadata derived deterministically (stand-in for real assets). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 16).cast("int").as("width"),
      (col("doc_id") % 480 + 16).cast("int").as("height"),
      (col("n_chars") * 10).as("duration_ms"))

  /** DETERMINISTIC FAKE of a media decoder: derives an 8-dim feature vector
    * from payload bytes (rolling checksum buckets). A real implementation
    * decodes/resamples here; everything around it — the Dataset encoder,
    * the partition-local batch loop, the output schema — is production
    * shape. */
  def fakeDecode(payload: Array[Byte]): (Long, Array[Float]) = {
    var checksum = 0L
    val feat = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      checksum = checksum * 31 + (payload(i) & 0xff)
      feat(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    (checksum, feat)
  }

  /** Image payloads with REAL encoded headers: ids rotate BMP / PNG /
    * JPEG by `doc_id % 3` (dimensions from the same doc-derived formula
    * as [[mediaFromDocuments]], plus `doc_id % 32` filler bytes). The
    * bytes are genuine format headers — the JPEG even requires a segment
    * walk past its APP0 to reach the SOF — so [[decodeImageMeta]] must
    * invert this builder through actual parsing, which the
    * `q_multimodal_meta` gate pins end-to-end. */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        (col("doc_id") % 640 + 16).cast("int"),
        (col("doc_id") % 480 + 16).cast("int"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) =>
        val pad = (id % 32).toInt
        val payload = (id % 3) match {
          case 0 => ImageCodec.buildBmp(w, h, pad)
          case 1 => ImageCodec.buildPng(w, h, pad)
          case _ => ImageCodec.buildJpeg(w, h, pad)
        }
        (id, payload)
      }.toDF("media_id", "payload")
  }

  /** REAL decode in the mapPartitions seam: parse each payload's actual
    * bytes ([[ImageCodec]] — PNG/BMP header formats) into typed metadata.
    * Scan-local, header-only, no shuffle; unparseable payloads yield null
    * format/dims (corruption is visible, never fabricated). This replaces
    * the deterministic fake for dimension metadata; full pixel decode
    * (features, resampling) remains the marked seam below. */
  def decodeImageMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val n = if (bytes == null) 0 else bytes.length
        ImageCodec.parse(bytes) match {
          case Some(m) =>
            (id, Option(m.format), Option(m.width), Option(m.height), n)
          case None =>
            (id, None: Option[String], None: Option[Int],
              None: Option[Int], n)
        }
      }).toDF("media_id", "format", "width", "height", "n_bytes")
  }

  /** Synthetic WAV assets from formula parameters — real RIFF bytes
    * ([[AudioCodec.buildWav]]), including an odd-sized LIST chunk every
    * third row so the decode walk must handle word alignment. */
  def syntheticAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val channels = (id % 2 + 1).toInt
        val rate = Seq(8000, 16000, 44100)((id % 3).toInt)
        val bits = Seq(8, 16)((id % 2).toInt)
        val frames = id % 1000 + 1
        val listPad = if (id % 3 == 0) (id % 7 + 1).toInt else 0
        (id, AudioCodec.buildWav(channels, rate, bits, frames, listPad))
      }.toDF("media_id", "payload")
  }

  /** REAL audio decode in the mapPartitions seam: parse each payload's
    * actual RIFF bytes into typed metadata. Scan-local, header-only;
    * unparseable payloads yield null metadata (nothing fabricated). */
  def decodeAudioMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        AudioCodec.parseWav(bytes) match {
          case Some(m) =>
            (id, Option(m.channels), Option(m.sampleRate),
              Option(m.bitsPerSample), Option(m.nFrames),
              Option(m.durationUs))
          case None =>
            (id, None: Option[Int], None: Option[Int], None: Option[Int],
              None: Option[Long], None: Option[Long])
        }
      }).toDF("media_id", "channels", "sample_rate", "bits", "n_frames",
        "duration_us")
  }

  /** Feature extraction over the media table: partition-local, batched,
    * no shuffle. The mapPartitions seam is where a real codec (or an Arrow
    * round-trip to a Python worker) slots in. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload", "width", "height",
        "duration_ms")
      .as[(Long, String, Array[Byte], Int, Int, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, kind, payload, _, _, _) =>
          val (checksum, feat) = fakeDecode(payload)
          MediaFeatures(id, kind, payload.length, checksum, feat)
        }
      }
  }

  /** Resize for image payloads: the metadata math is real (aspect-ratio-
    * preserving fit into a maxDim×maxDim box, floor semantics, upscale
    * suppressed); the pixel transform is the marked seam — payload passes
    * through where a real implementation re-encodes. Scan-local projection:
    * resizing 100 TB of images shuffles nothing. */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    // corrupt metadata (null or non-positive dims) propagates as null
    // output dims — fabricating plausible-looking 1px dimensions would
    // hide the corruption from downstream filters
    val valid = col("width").isNotNull && col("height").isNotNull &&
      col("width") > 0 && col("height") > 0
    media.where(col("kind") === "image")
      .withColumn("__scale", when(valid, least(lit(1.0),
        lit(maxDim.toDouble) /
          greatest(col("width"), col("height")).cast("double"))))
      // when(valid, ...) must wrap the WHOLE expression: Spark's greatest()
      // skips nulls, so greatest(1, null) would resurrect a 1px dimension
      .withColumn("out_width", when(valid,
        greatest(lit(1), floor(col("width") * col("__scale")))).cast("int"))
      .withColumn("out_height", when(valid,
        greatest(lit(1), floor(col("height") * col("__scale")))).cast("int"))
      .drop("__scale")
  }

  /** Frame sampling stub for video payloads: selects deterministic byte
    * offsets standing in for frame indices — the real version seeks key
    * frames; the sampling *plan* (explode per frame, scan-local) is real. */
  def sampleFrames(media: DataFrame, nFrames: Int = 4): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), lit(nFrames - 1)),
          i => i * octet_length(col("payload")) / nFrames)))
      .toDF("media_id", "frame_idx", "byte_offset")
}
