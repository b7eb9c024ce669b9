package graft.multimodal

/** Pure-JVM GIF container walk — the REAL frame-indexing half of the
  * video/animation decode seam: enumerate the frames of actual encoded
  * GIF bytes (GIF89a, the published CompuServe/W3C spec) without
  * decoding pixel data.
  *
  * Structure walked: 6-byte signature, logical screen descriptor
  * (+ optional global color table), then a block stream — extensions
  * (0x21: label + length-prefixed sub-blocks; the 0xF9 graphic-control
  * extension carries the frame delay), image descriptors (0x2C: x, y,
  * w, h as LE16 + optional local color table + LZW-min-code byte +
  * length-prefixed data sub-blocks), and the 0x3B trailer.
  *
  * Frame INDEXING ([[parseFrames]]) is what a 100 TB media pipeline
  * wants from a container scan: per-frame geometry, timing, and byte
  * offsets (so a downstream decoder can seek straight to a sampled
  * frame) at O(container bytes) with no pixel work — there the LZW
  * payloads are skipped by their sub-block lengths. PIXEL decode
  * ([[parseGifPixels]]) is the full other half: a real GIF-variant LZW
  * decompressor (GIF89a appendix F — variable-width LSB-first codes,
  * clear/end codes, deferred width growth, the KwKwK case) plus palette
  * lookup and 4-pass de-interlacing. Truncated or malformed streams
  * yield None: corruption propagates as null metadata, never fabricated
  * frames or pixels (same policy as [[ImageCodec]]).
  */
object GifCodec {

  final case class GifFrame(index: Int, x: Int, y: Int, width: Int,
                            height: Int, delayCs: Int, byteOffset: Int)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Walk a GIF's frames. None on any structural violation. */
  def parseFrames(b: Array[Byte]): Option[Seq[GifFrame]] = {
    if (b == null || b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") return None
    var pos = 6
    pos += 4 // logical screen w/h
    val flags = b(pos) & 0xff
    pos += 3 // flags, background color index, aspect ratio
    if ((flags & 0x80) != 0) pos += 3 * (1 << ((flags & 7) + 1)) // GCT
    var delayCs = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[GifFrame]
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x3b => // trailer
          return Some(out.toSeq)
        case 0x21 => // extension: label, then sub-blocks to a 0 terminator
          if (pos + 2 >= b.length) return None
          val label = b(pos + 1) & 0xff
          var p = pos + 2
          if (label == 0xf9) {
            // graphic control: fixed 4-byte block carries the delay
            if (p + 5 >= b.length || (b(p) & 0xff) != 4) return None
            delayCs = le16(b, p + 2)
          }
          while (p < b.length && (b(p) & 0xff) != 0) {
            p += 1 + (b(p) & 0xff)
            if (p > b.length) return None
          }
          if (p >= b.length) return None
          pos = p + 1
        case 0x2c => // image descriptor
          if (pos + 10 > b.length) return None
          val off = pos
          val x = le16(b, pos + 1); val y = le16(b, pos + 3)
          val w = le16(b, pos + 5); val h = le16(b, pos + 7)
          if (w < 1 || h < 1) return None
          val iflags = b(pos + 9) & 0xff
          var p = pos + 10
          if ((iflags & 0x80) != 0) p += 3 * (1 << ((iflags & 7) + 1))
          if (p >= b.length) return None
          p += 1 // LZW minimum code size
          while (p < b.length && (b(p) & 0xff) != 0) {
            p += 1 + (b(p) & 0xff)
            if (p > b.length) return None
          }
          if (p >= b.length) return None
          out += GifFrame(out.size, x, y, w, h, delayCs, off)
          delayCs = 0
          pos = p + 1
        case _ => return None // unknown block type: malformed
      }
    }
    None // ran off the end without a trailer
  }

  /** Minimal real GIF89a with `frames` image descriptors (geometry +
    * per-frame graphic-control delay). LZW payload per frame is
    * `padOf(i)` filler bytes in one sub-block — structurally valid, not
    * pixel-decodable, exactly what a frame INDEX walk must skip by
    * length. */
  def buildGif(screenW: Int, screenH: Int,
               frames: Seq[(Int, Int, Int, Int, Int)], // x, y, w, h, delayCs
               padOf: Int => Int): Array[Byte] = {
    require(screenW > 0 && screenH > 0 && frames.nonEmpty)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(screenW & 0xff); out.write(screenW >>> 8)
    out.write(screenH & 0xff); out.write(screenH >>> 8)
    out.write(0); out.write(0); out.write(0) // no GCT, bg 0, aspect 0
    frames.zipWithIndex.foreach { case ((x, y, w, h, delayCs), i) =>
      require(w > 0 && h > 0)
      // graphic control extension
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0) // flags
      out.write(delayCs & 0xff); out.write(delayCs >>> 8)
      out.write(0); out.write(0) // transparent index, terminator
      // image descriptor
      out.write(0x2c)
      out.write(x & 0xff); out.write(x >>> 8)
      out.write(y & 0xff); out.write(y >>> 8)
      out.write(w & 0xff); out.write(w >>> 8)
      out.write(h & 0xff); out.write(h >>> 8)
      out.write(0) // no local color table
      out.write(8) // LZW minimum code size
      val pad = padOf(i)
      if (pad > 0) {
        out.write(pad & 0xff)
        (0 until pad).foreach(j => out.write((i * 31 + j) & 0xff))
      }
      out.write(0) // data terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** First frame decoded to color indices + RGB through the active
    * palette. `nColors` is the palette actually used (local wins). */
  final case class GifPixels(width: Int, height: Int, nColors: Int,
                             indices: Array[Byte], rgb: Array[Byte])

  /** GIF-variant LZW decode (GIF89a appendix F): codes are LSB-first
    * across the concatenated sub-block bytes, starting `minCode`+1 bits
    * wide; `clear` = 2^minCode resets the table, `clear`+1 ends the
    * stream; one table entry (previous string + first char of current)
    * is added per code after the first, the code width growing to w+1
    * bits the moment entry 2^w-1 lands (cap 12 bits, table cap 4096 —
    * full tables add nothing until a clear). The `code == nextFree`
    * (KwKwK) case emits previous string + its own first char. Returns
    * exactly `expect` bytes or None — a stream that under- or over-runs
    * the frame is corruption, never a silently padded frame. */
  private[multimodal] def lzwDecode(minCode: Int, data: Array[Byte],
                                    expect: Int): Option[Array[Byte]] = {
    if (minCode < 2 || minCode > 8 || expect < 0) return None
    val clear = 1 << minCode
    val endCode = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }
    var nextFree = clear + 2
    var width = minCode + 1
    val out = new Array[Byte](expect)
    var outN = 0
    val stack = new Array[Byte](4097)
    val nBits = data.length.toLong * 8
    var bitPos = 0L
    var prev = -1
    def readCode(): Int = {
      if (bitPos + width > nBits) return -1
      var v = 0; var k = 0
      while (k < width) {
        val p = bitPos + k
        if (((data((p >> 3).toInt) >> (p & 7).toInt) & 1) != 0) v |= 1 << k
        k += 1
      }
      bitPos += width; v
    }
    while (outN < expect) {
      val code = readCode()
      if (code < 0) return None // bits exhausted mid-frame
      if (code == clear) {
        nextFree = clear + 2; width = minCode + 1; prev = -1
      } else if (code == endCode) {
        return None // ended with outN < expect: short frame
      } else {
        if (code > nextFree || (code == nextFree && prev < 0)) return None
        var stackN = 0
        var cur = code
        if (code == nextFree) {
          // KwKwK: current string = prev string + first char of prev —
          // push that final char first (the stack reverses below)
          stack(stackN) = firstChar(prefix, suffix, prev); stackN += 1
          cur = prev
        }
        while (cur >= 0) {
          stack(stackN) = suffix(cur); stackN += 1; cur = prefix(cur)
        }
        var j = stackN - 1
        while (j >= 0) {
          if (outN >= expect) return None // over-run: corrupt stream
          out(outN) = stack(j); outN += 1; j -= 1
        }
        if (prev >= 0 && nextFree < 4096) {
          prefix(nextFree) = prev
          suffix(nextFree) = stack(stackN - 1) // first char of current
          nextFree += 1
          if (nextFree == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  private def firstChar(prefix: Array[Int], suffix: Array[Byte],
                        code: Int): Byte = {
    var c = code
    while (prefix(c) >= 0) c = prefix(c)
    suffix(c)
  }

  /** GIF-variant LZW encode — the exact mirror of [[lzwDecode]]'s width
    * schedule: the ENCODER's width grows one code later than the
    * decoder's (entry 2^w arrives at the decoder one code behind), i.e.
    * when nextFree reaches 2^w+1; a full table emits a clear and
    * resets. Real dictionary compression, not the single-literal
    * "uncompressed GIF" trick, so round-trip fixtures walk the decoder
    * through genuine multi-byte table strings and width growth. */
  private[multimodal] def lzwEncode(minCode: Int,
                                    indices: Array[Byte]): Array[Byte] = {
    require(minCode >= 2 && minCode <= 8, s"bad LZW min code $minCode")
    require(indices.nonEmpty, "cannot encode an empty frame")
    val clear = 1 << minCode
    val endCode = clear + 1
    val bytes = new java.io.ByteArrayOutputStream()
    var acc = 0; var accBits = 0
    var width = minCode + 1
    def emit(code: Int): Unit = {
      acc |= code << accBits; accBits += width
      while (accBits >= 8) {
        bytes.write(acc & 0xff); acc >>>= 8; accBits -= 8
      }
    }
    var table = new java.util.HashMap[Integer, Integer]()
    var nextFree = clear + 2
    emit(clear)
    var prev = indices(0) & 0xff
    require(prev < clear, s"index $prev exceeds the $clear-code alphabet")
    var k = 1
    while (k < indices.length) {
      val c = indices(k) & 0xff
      require(c < clear, s"index $c exceeds the $clear-code alphabet")
      val key = Integer.valueOf((prev << 8) | c)
      val hit = table.get(key)
      if (hit != null) prev = hit.intValue()
      else {
        emit(prev)
        if (nextFree < 4096) {
          table.put(key, Integer.valueOf(nextFree)); nextFree += 1
          if (nextFree == (1 << width) + 1 && width < 12) width += 1
        } else {
          emit(clear)
          table = new java.util.HashMap[Integer, Integer]()
          nextFree = clear + 2; width = minCode + 1
        }
        prev = c
      }
      k += 1
    }
    emit(prev)
    emit(endCode)
    if (accBits > 0) bytes.write(acc & 0xff)
    bytes.toByteArray
  }

  /** Interlaced row order (GIF89a: every 8th from 0, every 8th from 4,
    * every 4th from 2, every 2nd from 1). */
  private def interlaceRows(h: Int): Array[Int] = {
    val rows = new Array[Int](h)
    var n = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
         r <- start until h by step) { rows(n) = r; n += 1 }
    rows
  }

  /** Real single-frame GIF89a 'WITH PIXELS': global color table
    * (`palette` = 3·2^m RGB bytes), one full-screen image descriptor,
    * and the frame's indices LZW-compressed by [[lzwEncode]] into
    * length-prefixed sub-blocks. `interlaced` stores rows in the 4-pass
    * order (and sets the descriptor flag) so decode must de-interlace. */
  def buildGifPixels(width: Int, height: Int, palette: Array[Byte],
                     indices: Array[Byte],
                     interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(indices.length == width * height,
      s"expected ${width * height} indices, got ${indices.length}")
    val n = palette.length / 3
    require(palette.length == 3 * n && Integer.bitCount(n) == 1 &&
      n >= 4 && n <= 256, s"palette must be 3*2^m bytes (m in 2..8)")
    val m = Integer.numberOfTrailingZeros(n)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xff); out.write(width >>> 8)
    out.write(height & 0xff); out.write(height >>> 8)
    out.write(0x80 | (m - 1)) // GCT present, size 2^m
    out.write(0); out.write(0) // background index, aspect
    out.write(palette)
    out.write(0x2c) // image descriptor at 0,0, screen-sized
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(width & 0xff); out.write(width >>> 8)
    out.write(height & 0xff); out.write(height >>> 8)
    out.write(if (interlaced) 0x40 else 0)
    val stored =
      if (!interlaced) indices
      else {
        val re = new Array[Byte](indices.length)
        val order = interlaceRows(height)
        var s = 0
        while (s < height) {
          System.arraycopy(indices, order(s) * width, re, s * width, width)
          s += 1
        }
        re
      }
    val minCode = math.max(2, m)
    out.write(minCode)
    val lzw = lzwEncode(minCode, stored)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len)
      out.write(lzw, off, len)
      off += len
    }
    out.write(0) // data terminator
    out.write(0x3b)
    out.toByteArray
  }

  /** Decode ONE image-descriptor block (`pos` at its 0x2c): palette
    * selection (local wins over global; neither → None), LZW
    * decompression of the concatenated sub-blocks, de-interlace when
    * flagged, palette→RGB. Returns the frame plus the position just
    * past the block's terminator. Shared by the first-frame and
    * all-frames decoders. */
  private def decodeImageBlock(b: Array[Byte], pos: Int,
      gct: Array[Byte]): Option[(GifPixels, Int)] = {
    if (pos + 10 > b.length) return None
    val w = le16(b, pos + 5); val h = le16(b, pos + 7)
    if (w < 1 || h < 1) return None
    // hostile-geometry bound, as in parsePngPixels
    if (w.toLong * h > (1L << 26)) return None
    val iflags = b(pos + 9) & 0xff
    var p = pos + 10
    var pal = gct
    if ((iflags & 0x80) != 0) {
      val sz = 3 * (1 << ((iflags & 7) + 1))
      if (p + sz > b.length) return None
      pal = java.util.Arrays.copyOfRange(b, p, p + sz)
      p += sz
    }
    if (pal == null) return None // no palette anywhere: undecodable
    if (p >= b.length) return None
    val minCode = b(p) & 0xff
    p += 1
    val data = new java.io.ByteArrayOutputStream()
    while (p < b.length && (b(p) & 0xff) != 0) {
      val len = b(p) & 0xff
      if (p + 1 + len > b.length) return None
      data.write(b, p + 1, len)
      p += 1 + len
    }
    if (p >= b.length) return None
    p += 1 // sub-block terminator
    val nColors = pal.length / 3
    lzwDecode(minCode, data.toByteArray, w * h).flatMap { stored =>
      val idx =
        if ((iflags & 0x40) == 0) stored
        else {
          val de = new Array[Byte](stored.length)
          val order = interlaceRows(h)
          var s = 0
          while (s < h) {
            System.arraycopy(stored, s * w, de, order(s) * w, w)
            s += 1
          }
          de
        }
      val rgb = new Array[Byte](3 * idx.length)
      var k = 0
      var bad = false
      while (k < idx.length && !bad) {
        val v = idx(k) & 0xff
        if (v >= nColors) bad = true // index outside the palette
        else {
          rgb(3 * k) = pal(3 * v)
          rgb(3 * k + 1) = pal(3 * v + 1)
          rgb(3 * k + 2) = pal(3 * v + 2)
          k += 1
        }
      }
      if (bad) None else Some((GifPixels(w, h, nColors, idx, rgb), p))
    }
  }

  /** Decode EVERY frame's pixels (no canvas compositing: each frame is
    * returned as its own rect — full-frame animations, the keyframe
    * detector's input, cover the screen each frame anyway). Strict: a
    * single undecodable frame, or a missing trailer, fails the WHOLE
    * payload — a half-decoded animation is corruption, not data. */
  def parseGifFramesPixels(b: Array[Byte]): Option[Seq[GifPixels]] = {
    if (b == null || b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") return None
    var pos = 6
    pos += 4
    val flags = b(pos) & 0xff
    pos += 3
    var gct: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val sz = 3 * (1 << ((flags & 7) + 1))
      if (pos + sz > b.length) return None
      gct = java.util.Arrays.copyOfRange(b, pos, pos + sz)
      pos += sz
    }
    val out = Seq.newBuilder[GifPixels]
    var n = 0
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x3b =>
          return if (n > 0) Some(out.result()) else None
        case 0x21 =>
          if (pos + 2 >= b.length) return None
          var p = pos + 2
          while (p < b.length && (b(p) & 0xff) != 0) {
            p += 1 + (b(p) & 0xff)
            if (p > b.length) return None
          }
          if (p >= b.length) return None
          pos = p + 1
        case 0x2c =>
          decodeImageBlock(b, pos, gct) match {
            case None => return None
            case Some((frame, next)) =>
              out += frame; n += 1; pos = next
          }
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  /** Real multi-frame GIF89a WITH PIXELS: one global color table, every
    * frame screen-sized at (0,0), indices LZW-compressed per frame —
    * the animation fixture for the keyframe detector. */
  def buildGifAnimPixels(width: Int, height: Int, palette: Array[Byte],
                         frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(frames.nonEmpty, "need at least one frame")
    val n = palette.length / 3
    require(palette.length == 3 * n && Integer.bitCount(n) == 1 &&
      n >= 4 && n <= 256, s"palette must be 3*2^m bytes (m in 2..8)")
    val m = Integer.numberOfTrailingZeros(n)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xff); out.write(width >>> 8)
    out.write(height & 0xff); out.write(height >>> 8)
    out.write(0x80 | (m - 1))
    out.write(0); out.write(0)
    out.write(palette)
    frames.foreach { indices =>
      require(indices.length == width * height,
        s"expected ${width * height} indices, got ${indices.length}")
      out.write(0x2c)
      out.write(0); out.write(0); out.write(0); out.write(0)
      out.write(width & 0xff); out.write(width >>> 8)
      out.write(height & 0xff); out.write(height >>> 8)
      out.write(0)
      val minCode = math.max(2, m)
      out.write(minCode)
      val lzw = lzwEncode(minCode, indices)
      var off = 0
      while (off < lzw.length) {
        val len = math.min(255, lzw.length - off)
        out.write(len)
        out.write(lzw, off, len)
        off += len
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Decode a GIF's FIRST frame to actual pixels: container walk to the
    * first image descriptor, palette selection (local wins over global;
    * neither → None), full LZW decompression of the concatenated data
    * sub-blocks, 4-pass de-interlace when flagged, and palette lookup to
    * RGB. Any structural violation, short/over-long code stream, or
    * index outside the palette returns None — corruption is visible,
    * never fabricated pixels (the [[ImageCodec.parsePngPixels]] policy).
    */
  def parseGifPixels(b: Array[Byte]): Option[GifPixels] = {
    if (b == null || b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") return None
    var pos = 6
    pos += 4
    val flags = b(pos) & 0xff
    pos += 3
    var gct: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val sz = 3 * (1 << ((flags & 7) + 1))
      if (pos + sz > b.length) return None
      gct = java.util.Arrays.copyOfRange(b, pos, pos + sz)
      pos += sz
    }
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x3b => return None // trailer before any image
        case 0x21 =>
          if (pos + 2 >= b.length) return None
          var p = pos + 2
          while (p < b.length && (b(p) & 0xff) != 0) {
            p += 1 + (b(p) & 0xff)
            if (p > b.length) return None
          }
          if (p >= b.length) return None
          pos = p + 1
        case 0x2c =>
          if (pos + 10 > b.length) return None
          val w = le16(b, pos + 5); val h = le16(b, pos + 7)
          if (w < 1 || h < 1) return None
          // hostile-geometry bound, as in parsePngPixels
          if (w.toLong * h > (1L << 26)) return None
          val iflags = b(pos + 9) & 0xff
          var p = pos + 10
          var pal = gct
          if ((iflags & 0x80) != 0) {
            val sz = 3 * (1 << ((iflags & 7) + 1))
            if (p + sz > b.length) return None
            pal = java.util.Arrays.copyOfRange(b, p, p + sz)
            p += sz
          }
          if (pal == null) return None // no palette anywhere: undecodable
          if (p >= b.length) return None
          val minCode = b(p) & 0xff
          p += 1
          val data = new java.io.ByteArrayOutputStream()
          while (p < b.length && (b(p) & 0xff) != 0) {
            val len = b(p) & 0xff
            if (p + 1 + len > b.length) return None
            data.write(b, p + 1, len)
            p += 1 + len
          }
          if (p >= b.length) return None
          val nColors = pal.length / 3
          lzwDecode(minCode, data.toByteArray, w * h) match {
            case None => return None
            case Some(stored) =>
              val idx =
                if ((iflags & 0x40) == 0) stored
                else {
                  val de = new Array[Byte](stored.length)
                  val order = interlaceRows(h)
                  var s = 0
                  while (s < h) {
                    System.arraycopy(stored, s * w, de, order(s) * w, w)
                    s += 1
                  }
                  de
                }
              val rgb = new Array[Byte](3 * idx.length)
              var k = 0
              while (k < idx.length) {
                val v = idx(k) & 0xff
                if (v >= nColors) return None // index outside the palette
                rgb(3 * k) = pal(3 * v)
                rgb(3 * k + 1) = pal(3 * v + 1)
                rgb(3 * k + 2) = pal(3 * v + 2)
                k += 1
              }
              return Some(GifPixels(w, h, nColors, idx, rgb))
          }
        case _ => return None
      }
    }
    None
  }
}
