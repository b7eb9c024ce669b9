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
  * Frame INDEXING is exactly what a 100 TB media pipeline wants from a
  * container scan: per-frame geometry, timing, and byte offsets (so a
  * downstream decoder can seek straight to a sampled frame) at
  * O(container bytes) with no pixel work — LZW payloads are skipped by
  * their sub-block lengths, never inflated. Truncated or malformed
  * streams yield None: corruption propagates as null metadata, never
  * fabricated frames (same policy as [[ImageCodec]]).
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
}
