package graft.multimodal

/** Pure-JVM image header codec — the REAL (non-fake) part of the
  * multimodal decode seam: extracts pixel dimensions from actual encoded
  * bytes for the two formats whose headers are trivially parseable
  * without a pixel codec.
  *
  *   - PNG: 8-byte signature, then the IHDR chunk — width/height as
  *     big-endian uint32 at offsets 16/20 (PNG spec §5.2, §11.2.2).
  *   - BMP: "BM" magic, BITMAPINFOHEADER (DIB size ≥ 40) — width/height
  *     as little-endian int32 at offsets 18/22; negative height means
  *     top-down row order, magnitude is the pixel height.
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

  def parse(b: Array[Byte]): Option[ImageMeta] =
    if (b == null) None else parsePng(b).orElse(parseBmp(b))

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

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  private def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
    b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
  }
}
