package graft.multimodal

/** Pure-JVM image header codec — the REAL (non-fake) part of the
  * multimodal decode seam: extracts pixel dimensions from actual encoded
  * bytes for the formats whose headers are parseable without a pixel
  * codec.
  *
  *   - PNG: 8-byte signature, then the IHDR chunk — width/height as
  *     big-endian uint32 at offsets 16/20 (PNG spec §5.2, §11.2.2).
  *   - BMP: "BM" magic, BITMAPINFOHEADER (DIB size ≥ 40) — width/height
  *     as little-endian int32 at offsets 18/22; negative height means
  *     top-down row order, magnitude is the pixel height.
  *   - JPEG: SOI, then a marker-segment walk to the first SOFn frame
  *     header, which carries height/width as big-endian uint16
  *     (ITU-T T.81 §B.2.2) — unlike the fixed-offset formats, dimensions
  *     sit at a data-dependent offset behind APPn/DQT/DHT segments.
  *
  * Parsing is header-only and allocation-free: exactly what a 100 TB
  * metadata-extraction scan should do (no pixel decode, no buffering the
  * payload). Unparseable bytes yield None — corruption propagates as
  * null metadata, never fabricated dimensions (same policy as
  * `Multimodal.resizeImages`).
  */
object ImageCodec {

  final case class ImageMeta(format: String, width: Int, height: Int)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  def parsePng(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 24) return None
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
    // first chunk must be IHDR (spec); its type tag sits at bytes 12-15
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    // uint32 dims; 0 or > Int.MaxValue is invalid/hostile input
    if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(ImageMeta("png", w.toInt, h.toInt))
  }

  def parseBmp(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') return None
    if (le32(b, 14) < 40) return None // BITMAPCOREHEADER (16-bit dims) unsupported
    val w = le32(b, 18)
    val h = le32(b, 22)
    if (w < 1 || h == 0 || h == Int.MinValue) None
    else Some(ImageMeta("bmp", w, math.abs(h)))
  }

  /** JPEG: SOI marker, then a segment walk — skip every variable-length
    * segment (APPn, DQT, DHT, COM, ...) by its big-endian length field
    * until a frame header SOFn (C0-CF except C4 DHT / C8 JPG / CC DAC)
    * whose payload carries precision(1), height(2 BE), width(2 BE)
    * (ITU-T T.81 §B.2.2). Height 0 is legal-but-deferred in the spec
    * (DNL); treated as unparseable here. Stops at SOS/EOI — dimensions
    * after the scan starts would mean a malformed stream. */
  def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // lost marker alignment
      // optional fill bytes: any number of FFs may precede a marker
      while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 3 >= b.length) return None
      val marker = b(i + 1) & 0xff
      marker match {
        case 0x01 | 0xd8 => i += 2 // TEM / (stray) SOI: standalone
        case m if m >= 0xd0 && m <= 0xd7 => i += 2 // RSTn: standalone
        case 0xd9 | 0xda => return None // EOI / SOS before any SOF
        case m if m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc =>
          // SOFn: len(2) precision(1) height(2) width(2) ...
          if (i + 8 >= b.length) return None
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          if (len < 8) return None
          val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
          val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
          return if (w < 1 || h < 1) None
          else Some(ImageMeta("jpeg", w, h))
        case _ =>
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          if (len < 2) return None
          i += 2 + len
      }
    }
    None
  }

  def parse(b: Array[Byte]): Option[ImageMeta] =
    if (b == null) None
    else parsePng(b).orElse(parseBmp(b)).orElse(parseJpeg(b))

  // ---- encoders (header-only synthetic assets for fixtures/round-trip) --

  /** Minimal PNG prefix (signature + IHDR length/type/dims) + `pad`
    * filler bytes: 24 + pad bytes, parseable by any header reader. */
  def buildPng(width: Int, height: Int, pad: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && pad >= 0)
    val out = new Array[Byte](24 + pad)
    System.arraycopy(PngSig, 0, out, 0, 8)
    out(11) = 13 // IHDR data length (big-endian 13)
    out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
    putBe32(out, 16, width)
    putBe32(out, 20, height)
    out
  }

  /** Minimal BMP header (BM + sizes + BITMAPINFOHEADER dims) + `pad`
    * filler bytes: 26 + pad bytes. */
  def buildBmp(width: Int, height: Int, pad: Int = 0): Array[Byte] = {
    require(width > 0 && height != 0 && pad >= 0)
    val out = new Array[Byte](26 + pad)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length) // file size
    putLe32(out, 14, 40)        // BITMAPINFOHEADER
    putLe32(out, 18, width)
    putLe32(out, 22, height)
    out
  }

  /** Minimal JPEG prefix (SOI + 16-byte JFIF APP0 + single-component
    * SOF0 with dims) + `pad` filler bytes: 33 + pad bytes — a segment
    * walk must skip APP0 by length to reach the SOF. */
  def buildJpeg(width: Int, height: Int, pad: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && pad >= 0)
    require(width <= 0xffff && height <= 0xffff,
      s"JPEG dims are uint16, got ${width}x$height")
    val out = new Array[Byte](33 + pad)
    out(0) = 0xff.toByte; out(1) = 0xd8.toByte // SOI
    out(2) = 0xff.toByte; out(3) = 0xe0.toByte // APP0
    out(4) = 0; out(5) = 16                    // APP0 length (incl. itself)
    out(6) = 'J'; out(7) = 'F'; out(8) = 'I'; out(9) = 'F'; out(10) = 0
    out(11) = 1; out(12) = 1                   // JFIF 1.1
    // bytes 13-19: density/thumbnail fields, zero is valid
    out(20) = 0xff.toByte; out(21) = 0xc0.toByte // SOF0
    out(22) = 0; out(23) = 11                  // SOF length: baseline, 1 comp
    out(24) = 8                                // precision
    out(25) = (height >>> 8).toByte; out(26) = height.toByte
    out(27) = (width >>> 8).toByte; out(28) = width.toByte
    out(29) = 1                                // 1 component
    out(30) = 1; out(31) = 0x11; out(32) = 0   // comp id/sampling/quant
    out
  }

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  private def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
    b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
  }

  // ---- full PNG pixel codec (spec-complete for 8-bit gray/RGB) --------
  //
  // Everything here is public knowledge: the PNG spec (RFC 2083 /
  // ISO 15948 §9 filtering, §11 chunks) and java.util.zip for the zlib
  // IDAT stream. No interlace, bit depth 8, color types 0 (grayscale)
  // and 2 (truecolor) — the shapes a training-data pipeline's thumbnail
  // features actually need; anything else parses as None, never as
  // made-up pixels.

  final case class PixelImage(width: Int, height: Int, channels: Int,
                              pixels: Array[Byte])

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
                    data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putBe32(len, 0, data.length)
    out.write(len)
    val t = typ.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    val c = new Array[Byte](4); putBe32(c, 0, crc.getValue.toInt)
    out.write(c)
  }

  /** Encode 8-bit pixels (1 channel = grayscale, 3 = RGB, row-major,
    * interleaved) as a REAL standards-conformant PNG: signature, IHDR,
    * one zlib-deflated IDAT, IEND, all CRC'd. Row filters cycle
    * None/Sub/Up/Average/Paeth (`row % 5`), so any decoder — ours
    * included — must implement the complete filter suite to invert it. */
  def buildPngPixels(width: Int, height: Int, channels: Int,
                     pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(channels == 1 || channels == 3, s"channels must be 1|3")
    require(pixels.length == width * height * channels,
      s"expected ${width * height * channels} bytes, got ${pixels.length}")
    val rowLen = width * channels
    val raw = new Array[Byte](height * (1 + rowLen))
    var r = 0
    while (r < height) {
      val f = r % 5
      raw(r * (1 + rowLen)) = f.toByte
      var x = 0
      while (x < rowLen) {
        val cur = pixels(r * rowLen + x) & 0xff
        val a = if (x >= channels) pixels(r * rowLen + x - channels) & 0xff
                else 0
        val b = if (r > 0) pixels((r - 1) * rowLen + x) & 0xff else 0
        val c = if (r > 0 && x >= channels)
                  pixels((r - 1) * rowLen + x - channels) & 0xff
                else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 => cur - paeth(a, b, c)
        }
        raw(r * (1 + rowLen) + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      r += 1
    }
    val zipped = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(zipped)
    dos.write(raw); dos.finish(); dos.close()
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = if (channels == 1) 0 else 2 // color type gray | truecolor
    // ihdr(10..12): compression 0, filter 0, interlace 0
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zipped.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // Adam7 pass grid (PNG §8.2): per pass the origin and stride of the
  // pixels it carries. Each pass is an independently filtered sub-image.
  private val Adam7: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** (xo, yo, dx, dy, passWidth, passHeight) for every NON-EMPTY pass —
    * the shared geometry of the interlaced builder and decoder; a
    * non-interlaced image is the single identity pass. */
  private def passGeometry(w: Int, h: Int,
                           interlaced: Boolean): Seq[(Int, Int, Int, Int, Int, Int)] =
    if (!interlaced) Seq((0, 0, 1, 1, w, h))
    else Adam7.map { case (xo, yo, dx, dy) =>
      (xo, yo, dx, dy,
        math.max(0, (w - xo + dx - 1) / dx),
        math.max(0, (h - yo + dy - 1) / dy))
    }.filter(p => p._5 > 0 && p._6 > 0)

  /** Filter one pass sub-image into `out` (filter byte per scanline,
    * types cycling `row % 5` — the same rotation as the sequential
    * builder, so decoders must invert the full suite per pass). */
  private def filterPass(passPx: Array[Byte], pw: Int, ph: Int,
                         channels: Int,
                         out: java.io.ByteArrayOutputStream): Unit = {
    val rowLen = pw * channels
    var r = 0
    while (r < ph) {
      val f = r % 5
      out.write(f)
      var x = 0
      while (x < rowLen) {
        val cur = passPx(r * rowLen + x) & 0xff
        val a = if (x >= channels) passPx(r * rowLen + x - channels) & 0xff
                else 0
        val b = if (r > 0) passPx((r - 1) * rowLen + x) & 0xff else 0
        val c = if (r > 0 && x >= channels)
                  passPx((r - 1) * rowLen + x - channels) & 0xff
                else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 => cur - paeth(a, b, c)
        }
        out.write(filtered & 0xff)
        x += 1
      }
      r += 1
    }
  }

  /** [[buildPngPixels]] with Adam7 interlace (IHDR interlace = 1): the
    * SAME pixels delivered as seven independently filtered passes — the
    * progressive layout crawled web PNGs actually ship. Decoders must
    * reassemble the pass grid exactly; the interlace gate pins that the
    * two physical layouts converge on identical pixels. */
  def buildPngPixelsInterlaced(width: Int, height: Int, channels: Int,
                               pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(channels == 1 || channels == 3, s"channels must be 1|3")
    require(pixels.length == width * height * channels,
      s"expected ${width * height * channels} bytes, got ${pixels.length}")
    val raw = new java.io.ByteArrayOutputStream()
    passGeometry(width, height, interlaced = true).foreach {
      case (xo, yo, dx, dy, pw, ph) =>
        val passPx = new Array[Byte](pw * ph * channels)
        var py = 0
        while (py < ph) {
          var px = 0
          while (px < pw) {
            var ch = 0
            while (ch < channels) {
              passPx((py * pw + px) * channels + ch) =
                pixels(((yo + py * dy) * width + (xo + px * dx))
                  * channels + ch)
              ch += 1
            }
            px += 1
          }
          py += 1
        }
        filterPass(passPx, pw, ph, channels, raw)
    }
    val zipped = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(zipped)
    dos.write(raw.toByteArray); dos.finish(); dos.close()
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8
    ihdr(9) = if (channels == 1) 0 else 2
    ihdr(12) = 1 // Adam7
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zipped.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Splice tEXt metadata chunks (PNG §11.3.4: keyword, NUL, Latin-1
    * text) into a PNG right after its IHDR — real chunks, real CRCs;
    * any standards-conformant reader sees them. */
  def addPngTexts(png: Array[Byte],
                  texts: Seq[(String, String)]): Array[Byte] = {
    require(png.length >= 33, "not a PNG with an IHDR")
    val out = new java.io.ByteArrayOutputStream()
    out.write(png, 0, 33) // signature + IHDR chunk
    texts.foreach { case (k, v) =>
      chunk(out, "tEXt",
        k.getBytes("ISO-8859-1") ++ Array[Byte](0) ++
          v.getBytes("ISO-8859-1"))
    }
    out.write(png, 33, png.length - 33)
    out.toByteArray
  }

  /** Collect tEXt key/value pairs via the real chunk walk (stops at
    * IEND); structural corruption → None, never a partial fabrication. */
  def parsePngTexts(b: Array[Byte]): Option[Seq[(String, String)]] = {
    if (b == null || b.length < 8) return None
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
    val out = Seq.newBuilder[(String, String)]
    var pos = 8
    var seenIend = false
    while (!seenIend) {
      if (pos + 8 > b.length) return None
      val len = be32(b, pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > b.length) return None
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      if (typ == "tEXt") {
        val data = java.util.Arrays.copyOfRange(b, pos + 8,
          pos + 8 + len.toInt)
        val nul = data.indexOf(0: Byte)
        if (nul < 0) return None // keyword must be NUL-terminated
        out += ((new String(data, 0, nul, "ISO-8859-1"),
          new String(data, nul + 1, data.length - nul - 1, "ISO-8859-1")))
      }
      if (typ == "IEND") seenIend = true
      pos += 12 + len.toInt
    }
    Some(out.result())
  }

  /** Strip ancillary chunks (PNG §5.4: ancillary = bit 5 of the first
    * type byte set — tEXt, zTXt, iTXt, tIME, eXIf, ...) keeping the
    * critical ones byte-identical: the privacy pass a crawled-image
    * pipeline runs before training export. Corruption → None. */
  def stripPngMetadata(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null || b.length < 8) return None
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
    val out = new java.io.ByteArrayOutputStream()
    out.write(b, 0, 8)
    var pos = 8
    var seenIend = false
    while (!seenIend) {
      if (pos + 8 > b.length) return None
      val len = be32(b, pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > b.length) return None
      val critical = (b(pos + 4) & 0x20) == 0
      if (new String(b, pos + 4, 4, "US-ASCII") == "IEND") seenIend = true
      if (critical) out.write(b, pos, 12 + len.toInt)
      pos += 12 + len.toInt
    }
    Some(out.toByteArray)
  }

  /** Decode a PNG's ACTUAL pixels: chunk walk (IDAT may be split),
    * zlib inflate, and the full §9 un-filter pass — per Adam7 pass when
    * IHDR says interlace 1, each pass an independent sub-image
    * reassembled onto the §8.2 grid. Supports the shapes
    * [[buildPngPixels]] / [[buildPngPixelsInterlaced]] emit (8-bit,
    * gray/RGB); any other shape, bad CRC-length structure, or
    * short/corrupt pixel data returns None — corruption is visible,
    * never fabricated. */
  def parsePngPixels(bytes: Array[Byte]): Option[PixelImage] = {
    if (bytes == null || bytes.length < 8) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PngSig(i)) return None; i += 1 }
    var width = 0; var height = 0; var channels = 0
    var interlaced = false
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    var seenIhdr = false; var seenIend = false
    while (!seenIend) {
      if (pos + 8 > bytes.length) return None
      val len = be32(bytes, pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length)
        return None
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          val w = be32(bytes, dataOff); val h = be32(bytes, dataOff + 4)
          if (w < 1 || h < 1 || w > (1 << 24) || h > (1 << 24)) return None
          val depth = bytes(dataOff + 8) & 0xff
          val color = bytes(dataOff + 9) & 0xff
          val interlace = bytes(dataOff + 12) & 0xff
          if (depth != 8 || (color != 0 && color != 2)
              || interlace > 1) return None
          width = w.toInt; height = h.toInt
          channels = if (color == 0) 1 else 3
          interlaced = interlace == 1
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(bytes, dataOff, len.toInt)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks skipped by length
      }
      pos = dataOff + len.toInt + 4 // + CRC
    }
    if (!seenIhdr) return None
    // hostile-input bound: cap the decode buffer (64 MiB of pixels) so a
    // forged IHDR can't make a metadata scan allocate per-row gigabytes
    if (width.toLong * height * channels > (1L << 26)) return None
    val rowLen = width * channels
    val passes = passGeometry(width, height, interlaced)
    val expect = passes.map { case (_, _, _, _, pw, ph) =>
      ph * (1 + pw * channels) }.sum
    val raw = new Array[Byte](expect)
    // finally-scoped end(): the truncated-stream return and the
    // DataFormatException path must still release the native zlib
    // buffer, or executors scanning many corrupt payloads leak until GC
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < expect && !inf.finished()) {
        val n = inf.inflate(raw, got, expect - got)
        // 0 while unfinished = truncated stream (needsInput) OR a
        // preset-dictionary demand (FDICT set — legal zlib, forbidden
        // in PNG): both corruption; looping on the latter spins forever
        if (n == 0) return None
        got += n
      }
      if (got < expect) return None
      // layout consistency: a stream with MORE pixel bytes than the
      // declared (interlace, dims) layout needs is a lie somewhere —
      // e.g. a sequential stream whose IHDR interlace byte was flipped
      // would otherwise "decode" into scattered garbage
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) > 0)
        return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    val px = new Array[Byte](height * rowLen)
    var off = 0
    var passIdx = 0
    while (passIdx < passes.length) {
      val (xo, yo, dx, dy, pw, ph) = passes(passIdx)
      passIdx += 1
      val passRow = pw * channels
      val passPx = new Array[Byte](ph * passRow)
      var r = 0
      while (r < ph) {
        val f = raw(off + r * (1 + passRow)) & 0xff
        if (f > 4) return None
        var x = 0
        while (x < passRow) {
          val filt = raw(off + r * (1 + passRow) + 1 + x) & 0xff
          val a = if (x >= channels) passPx(r * passRow + x - channels) & 0xff
                  else 0
          val b = if (r > 0) passPx((r - 1) * passRow + x) & 0xff else 0
          val c = if (r > 0 && x >= channels)
                    passPx((r - 1) * passRow + x - channels) & 0xff
                  else 0
          val recon = f match {
            case 0 => filt
            case 1 => filt + a
            case 2 => filt + b
            case 3 => filt + ((a + b) >> 1)
            case 4 => filt + paeth(a, b, c)
          }
          passPx(r * passRow + x) = (recon & 0xff).toByte
          x += 1
        }
        r += 1
      }
      off += ph * (1 + passRow)
      // scatter the pass onto the output grid (identity when
      // non-interlaced: one pass at stride 1)
      var py = 0
      while (py < ph) {
        var pxi = 0
        while (pxi < pw) {
          var ch = 0
          while (ch < channels) {
            px(((yo + py * dy) * width + (xo + pxi * dx)) * channels + ch) =
              passPx((py * pw + pxi) * channels + ch)
            ch += 1
          }
          pxi += 1
        }
        py += 1
      }
    }
    Some(PixelImage(width, height, channels, px))
  }
}
