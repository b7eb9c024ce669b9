package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream, Inflater, InflaterInputStream}

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

  /** One gzip member per record, concatenated — a real .warc.gz shard.
    * close() (not just finish()) ends each member's native Deflater
    * eagerly — thousands of records per shard would otherwise pin
    * off-heap zlib state until GC finalization; closing the backing
    * ByteArrayOutputStream is a no-op, so the loop can keep writing. */
  def buildWarcGz(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new GZIPOutputStream(out)
      gz.write(recordBytes(r))
      gz.close()
    }
    out.toByteArray
  }

  /** A plain (uncompressed) .warc shard — records back to back. Real
    * crawl lakes mix generations: early CommonCrawl shards are plain
    * WARC, later ones per-record gzip members. */
  def buildWarc(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach(r => out.write(recordBytes(r)))
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
    var in: GZIPInputStream = null
    try {
      in = new GZIPInputStream(new ByteArrayInputStream(bytes))
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
    finally if (in != null) { // release the native Inflater eagerly
      try in.close() catch { case _: java.io.IOException => () }
    }
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
    inflateAll(bytes, maxBytes) match {
      case Some(f) => parseFlat(f)
      case None    => Nil
    }
  }

  /** Generation-blind shard parse: sniffs the gzip magic (real crawl
    * lakes mix plain-WARC and per-record-gzip shards in one listing)
    * and routes to [[parseWarcGz]] or the plain record walk. A plain
    * shard larger than `maxBytes` is dropped whole — the same
    * per-shard memory contract the inflate path enforces. */
  def parseWarc(bytes: Array[Byte], maxBytes: Int = 1 << 26): Seq[WarcRecord] = {
    if (bytes == null || bytes.length < 2) Nil
    else if ((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
      parseWarcGz(bytes, maxBytes)
    else if (bytes.length > maxBytes) Nil
    else parseFlat(bytes)
  }

  /** The record walk over already-flat WARC bytes; malformed tail →
    * records parsed so far (one truncated record never discards the
    * shard's intact prefix). */
  private def parseFlat(flat: Array[Byte]): Seq[WarcRecord] = {
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
    * None when the payload isn't a parseable HTTP/1.x message. The body
    * is the raw on-the-wire bytes — see [[httpBodyDecoded]] for the
    * transfer/content-decoded text. */
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

  /** [[httpBody]] plus the wire decodings a real crawl response needs
    * before its entity bytes are text: `Transfer-Encoding: chunked`
    * (RFC 9112 §7.1 — hex size lines, chunk extensions tolerated,
    * trailers ignored) and `Content-Encoding: gzip`/`deflate`
    * (RFC 9110 §8.4; deflate tries zlib-wrapped first, then the raw
    * stream some servers send). A malformed chunk frame, a corrupt
    * compressed body, an over-`maxBytes` inflation, or an encoding we
    * don't know → None, never a throw and never fabricated bytes. */
  def httpBodyDecoded(payload: Array[Byte],
                      maxBytes: Int = 1 << 26): Option[(Int, Array[Byte])] = {
    val headEnd = indexOfCrlfCrlf(payload, 0)
    if (headEnd < 0) return None
    val head = new String(payload, 0, headEnd, UTF_8)
    val lines = head.split("\r\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("HTTP/1.")) return None
    val parts = lines(0).split(" ")
    if (parts.length < 2) return None
    val status = try parts(1).toInt catch { case _: NumberFormatException => return None }
    var chunked = false
    // any transfer coding we can't undo (gzip/deflate/compress in the
    // Transfer-Encoding list — rare but legal, RFC 9112 §6.1) → None:
    // dechunking alone would return still-compressed bytes as "decoded"
    // text, breaking the never-fabricated-bytes contract (same policy
    // as an unknown Content-Encoding below)
    var unknownTransferCoding = false
    var encoding: String = null
    lines.iterator.drop(1).foreach { ln =>
      val c = ln.indexOf(':')
      if (c > 0) {
        val k = ln.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val v = ln.substring(c + 1).trim.toLowerCase(java.util.Locale.ROOT)
        k match {
          case "transfer-encoding" =>
            v.split(",").map(_.trim).filter(_.nonEmpty).foreach {
              case "chunked" => chunked = true
              case "identity" => ()
              case _ => unknownTransferCoding = true
            }
          case "content-encoding" => encoding = v
          case _ => ()
        }
      }
    }
    if (unknownTransferCoding) return None
    val wire = java.util.Arrays.copyOfRange(payload, headEnd + 4, payload.length)
    val framed = if (chunked) dechunk(wire, maxBytes) else Some(wire)
    framed.flatMap { body =>
      encoding match {
        case null | "identity" => Some(body)
        case "gzip" | "x-gzip" => gunzipStrict(body, maxBytes)
        case "deflate" =>
          inflateStrict(body, rawDeflate = false, maxBytes)
            .orElse(inflateStrict(body, rawDeflate = true, maxBytes))
        case _ => None
      }
    }.map((status, _))
  }

  /** De-frame a chunked entity: hex size line (extensions after ';'
    * dropped), `size` bytes, CRLF, repeat; a 0-size chunk ends the
    * body (trailer section ignored). Any framing violation → None. */
  private def dechunk(b: Array[Byte], maxBytes: Int): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream()
    var p = 0
    var total = 0L
    while (true) {
      var e = p
      while (e + 1 < b.length && !(b(e) == '\r' && b(e + 1) == '\n')) e += 1
      if (e + 1 >= b.length) return None
      val hexRaw = new String(b, p, e - p, UTF_8).split(";", 2)(0).trim
      if (hexRaw.isEmpty) return None
      // leading-zero-padded sizes ("000000040") are legal per RFC 9112
      // and appear in the wild — strip the padding BEFORE the 8-digit
      // overflow cap, keeping one zero for the terminal chunk
      val hexPart = {
        val s = hexRaw.dropWhile(_ == '0')
        if (s.isEmpty) "0" else s
      }
      if (hexPart.length > 8) return None
      val size = try java.lang.Long.parseLong(hexPart, 16)
        catch { case _: NumberFormatException => return None }
      if (size < 0) return None
      p = e + 2
      if (size == 0) return Some(out.toByteArray)
      total += size
      if (total > maxBytes) return None
      if (p + size + 2 > b.length) return None
      out.write(b, p, size.toInt)
      p += size.toInt
      if (!(b(p) == '\r' && b(p + 1) == '\n')) return None
      p += 2
    }
    None
  }

  /** Strict (entity-body) gunzip: unlike [[inflateAll]]'s keep-prefix
    * shard policy, a corrupt compressed BODY yields None — a half
    * document must not pose as a whole one. */
  private def gunzipStrict(b: Array[Byte], maxBytes: Int): Option[Array[Byte]] = {
    var in: GZIPInputStream = null
    try {
      in = new GZIPInputStream(new ByteArrayInputStream(b))
      val out = new ByteArrayOutputStream()
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
    } catch { case _: java.io.IOException => None }
    finally if (in != null) {
      try in.close() catch { case _: java.io.IOException => () }
    }
  }

  private def inflateStrict(b: Array[Byte], rawDeflate: Boolean,
                            maxBytes: Int): Option[Array[Byte]] = {
    val inf = new Inflater(rawDeflate)
    try {
      val in = new InflaterInputStream(new ByteArrayInputStream(b), inf)
      try {
        val out = new ByteArrayOutputStream()
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
      } catch { case _: java.io.IOException => None }
      finally try in.close() catch { case _: java.io.IOException => () }
    } finally inf.end()
  }

  /** Builder twin of [[httpBodyDecoded]]: a chunked HTTP/1.1 response
    * whose entity is optionally gzip- or deflate-compressed — the
    * modern-crawl wire shape ([[httpResponsePayload]] builds the
    * Content-Length generation). `chunkSize` frames the (encoded)
    * entity into equal chunks with a hex size line each. */
  def httpResponsePayloadChunked(status: Int, body: Array[Byte],
      chunkSize: Int = 64,
      contentEncoding: Option[String] = None): Array[Byte] = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    val encoded = contentEncoding match {
      case None => body
      case Some("gzip") =>
        val bo = new ByteArrayOutputStream()
        val gz = new GZIPOutputStream(bo)
        gz.write(body); gz.close()
        bo.toByteArray
      case Some("deflate") =>
        val bo = new ByteArrayOutputStream()
        val df = new java.util.zip.DeflaterOutputStream(bo)
        df.write(body); df.close()
        bo.toByteArray
      case Some(other) =>
        throw new IllegalArgumentException(s"unsupported encoding $other")
    }
    val sb = new StringBuilder
    sb.append("HTTP/1.1 ").append(status)
      .append(if (status == 200) " OK" else "").append(CRLF)
    sb.append("Content-Type: text/plain; charset=utf-8").append(CRLF)
    contentEncoding.foreach(e =>
      sb.append("Content-Encoding: ").append(e).append(CRLF))
    sb.append("Transfer-Encoding: chunked").append(CRLF)
    sb.append(CRLF)
    val out = new ByteArrayOutputStream()
    out.write(sb.toString.getBytes(UTF_8))
    var p = 0
    while (p < encoded.length) {
      val n = math.min(chunkSize, encoded.length - p)
      out.write(s"${n.toHexString}$CRLF".getBytes(UTF_8))
      out.write(encoded, p, n)
      out.write(CRLF.getBytes(UTF_8))
      p += n
    }
    out.write(s"0$CRLF$CRLF".getBytes(UTF_8))
    out.toByteArray
  }
}
