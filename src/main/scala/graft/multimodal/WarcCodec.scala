package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable.ArrayBuffer

/** WARC/1.0 (ISO 28500) record grammar — the container format of
  * web-crawl text lakes (reference ingests curated snapshots, e.g.
  * parsing/load_imdb.py:1; at 100 TB the text column arrives as
  * WARC.gz shards, so ingestion must parse it, not assume parquet).
  *
  * Builder and parser are byte-level and driver-free:
  *  - [[buildWarcGz]] serializes records with CRLF header blocks,
  *    `Content-Length` in BYTES, and ONE GZIP MEMBER PER RECORD — the
  *    warc.gz convention that keeps records independently seekable.
  *  - [[parseWarcGz]] inflates the concatenated members behind the
  *    same zip-bomb guard as [[Multimodal.gunzipText]] (total inflated
  *    bytes capped; over-cap or corrupt gzip → no records, never a
  *    throw) and then walks records structurally: version line, header
  *    lines to the blank line, exactly `Content-Length` payload bytes,
  *    trailing CRLF CRLF. A malformed record ends the walk — records
  *    already parsed are kept, so one truncated tail record cannot
  *    discard a shard.
  *
  * HTTP payloads (`WARC-Type: response`) carry a full status line +
  * header block; [[httpBody]] strips it at the first CRLFCRLF and
  * returns (status, body bytes). Header names are matched
  * case-insensitively per RFC 9110.
  */
object WarcCodec {

  final case class WarcRecord(
      warcType: String,
      targetUri: Option[String],
      date: Option[String],
      body: Array[Byte])

  private val CRLF = "\r\n"

  /** Serialize one record; `body` is the full record payload (for a
    * response record: HTTP status line + headers + entity body). */
  private def recordBytes(r: WarcRecord): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(CRLF)
    sb.append("WARC-Type: ").append(r.warcType).append(CRLF)
    r.targetUri.foreach(u => sb.append("WARC-Target-URI: ").append(u).append(CRLF))
    r.date.foreach(d => sb.append("WARC-Date: ").append(d).append(CRLF))
    val ct =
      if (r.warcType == "response" || r.warcType == "request")
        s"application/http; msgtype=${r.warcType}"
      else "application/warc-fields"
    sb.append("Content-Type: ").append(ct).append(CRLF)
    sb.append("Content-Length: ").append(r.body.length).append(CRLF)
    sb.append(CRLF)
    val head = sb.toString.getBytes(UTF_8)
    val out = new ByteArrayOutputStream(head.length + r.body.length + 4)
    out.write(head)
    out.write(r.body)
    out.write((CRLF + CRLF).getBytes(UTF_8))
    out.toByteArray
  }

  /** One gzip member per record, concatenated — a real .warc.gz shard. */
  def buildWarcGz(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new GZIPOutputStream(out)
      gz.write(recordBytes(r))
      gz.finish()
    }
    out.toByteArray
  }

  /** An HTTP/1.1 response payload for a response record. */
  def httpResponsePayload(status: Int, body: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("HTTP/1.1 ").append(status)
      .append(if (status == 200) " OK" else "").append(CRLF)
    sb.append("Content-Type: text/plain; charset=utf-8").append(CRLF)
    sb.append("Content-Length: ").append(body.length).append(CRLF)
    extraHeaders.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append(CRLF) }
    sb.append(CRLF)
    val head = sb.toString.getBytes(UTF_8)
    val out = new ByteArrayOutputStream(head.length + body.length)
    out.write(head)
    out.write(body)
    out.toByteArray
  }

  /** Bomb-guarded inflate of concatenated gzip members. Over-cap →
    * None (hostile input, drop the shard). A mid-stream gzip error
    * (truncated tail member, bit rot) keeps the bytes inflated BEFORE
    * the error — complete leading members survive, so one damaged tail
    * record cannot discard a shard's worth of intact records. */
  private def inflateAll(bytes: Array[Byte], maxBytes: Int): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream()
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val buf = new Array[Byte](8192)
      var total = 0L
      var n = in.read(buf)
      while (n > 0) {
        total += n
        if (total > maxBytes) return None
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => Some(out.toByteArray) }
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Parse a .warc.gz shard into records. Malformed tail → the records
    * parsed so far; corrupt/over-cap gzip → Nil. */
  def parseWarcGz(bytes: Array[Byte], maxBytes: Int = 1 << 26): Seq[WarcRecord] = {
    if (bytes == null) return Nil
    val flat = inflateAll(bytes, maxBytes) match {
      case Some(f) => f
      case None    => return Nil
    }
    val recs = ArrayBuffer.empty[WarcRecord]
    var pos = 0
    while (pos < flat.length) {
      val headEnd = indexOfCrlfCrlf(flat, pos)
      if (headEnd < 0) return recs.toSeq
      val head = new String(flat, pos, headEnd - pos, UTF_8)
      val lines = head.split("\r\n", -1)
      if (lines.isEmpty || !lines(0).startsWith("WARC/")) return recs.toSeq
      var warcType: String = null
      var uri: Option[String] = None
      var date: Option[String] = None
      var contentLength = -1L
      lines.iterator.drop(1).foreach { ln =>
        val c = ln.indexOf(':')
        if (c > 0) {
          val k = ln.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val v = ln.substring(c + 1).trim
          k match {
            case "warc-type"       => warcType = v
            case "warc-target-uri" => uri = Some(v)
            case "warc-date"       => date = Some(v)
            case "content-length"  =>
              contentLength = try v.toLong catch { case _: NumberFormatException => -1L }
            case _ => ()
          }
        }
      }
      val bodyStart = headEnd + 4
      if (warcType == null || contentLength < 0 ||
          bodyStart + contentLength > flat.length) return recs.toSeq
      val body = java.util.Arrays.copyOfRange(
        flat, bodyStart, bodyStart + contentLength.toInt)
      recs += WarcRecord(warcType, uri, date, body)
      pos = bodyStart + contentLength.toInt
      // trailing record separator (two CRLFs); tolerate a bare tail
      if (pos + 4 <= flat.length &&
          flat(pos) == '\r' && flat(pos + 1) == '\n' &&
          flat(pos + 2) == '\r' && flat(pos + 3) == '\n') pos += 4
      else if (pos < flat.length) return recs.toSeq
    }
    recs.toSeq
  }

  /** Split an HTTP message payload into (status code, entity body);
    * None when the payload isn't a parseable HTTP/1.x message. */
  def httpBody(payload: Array[Byte]): Option[(Int, Array[Byte])] = {
    val headEnd = indexOfCrlfCrlf(payload, 0)
    if (headEnd < 0) return None
    val head = new String(payload, 0, headEnd, UTF_8)
    val statusLine = head.split("\r\n", 2)(0)
    if (!statusLine.startsWith("HTTP/1.")) return None
    val parts = statusLine.split(" ")
    if (parts.length < 2) return None
    val status = try parts(1).toInt catch { case _: NumberFormatException => return None }
    Some((status, java.util.Arrays.copyOfRange(payload, headEnd + 4, payload.length)))
  }
}
