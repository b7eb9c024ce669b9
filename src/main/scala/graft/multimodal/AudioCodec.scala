package graft.multimodal

/** Pure-JVM audio header codec — the audio leg of the real (non-fake)
  * multimodal decode seam, same policy as [[ImageCodec]]: parse actual
  * encoded bytes, header-only, allocation-free, and return None for
  * anything unparseable (corruption becomes null metadata, never
  * fabricated parameters).
  *
  * WAV/RIFF (the format whose header carries everything a curation scan
  * wants without a sample decoder): "RIFF" + size + "WAVE", then a chunk
  * walk — each chunk is a 4-byte id, a little-endian uint32 size, and a
  * WORD-ALIGNED payload (odd sizes carry a pad byte, which a naive
  * walker misses). The `fmt ` chunk carries channels / sample rate /
  * bits per sample (little-endian); the `data` chunk's SIZE field gives
  * the payload length, so frame count and duration derive from the
  * header even when the payload itself is truncated or absent — exactly
  * right for a 100 TB metadata scan that reads only byte prefixes.
  */
object AudioCodec {

  /** `nFrames` = sample frames (all channels together);
    * `durationUs` = nFrames · 1e6 / sampleRate, integer µs. */
  final case class AudioMeta(format: String, channels: Int,
                             sampleRate: Int, bitsPerSample: Int,
                             nFrames: Long, durationUs: Long)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  def parseWav(b: Array[Byte]): Option[AudioMeta] = {
    if (b == null || b.length < 36) return None
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var i = 12
    var channels = -1
    var sampleRate = -1L
    var bits = -1
    var blockAlign = -1
    var dataSize = -1L
    while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val id = tag(b, i)
      val size = le32(b, i + 4)
      if (id == "fmt ") {
        // PCM fmt payload: format(2) channels(2) rate(4) byteRate(4)
        // blockAlign(2) bits(2)
        if (size < 16 || i + 8 + 16 > b.length) return None
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
      } else if (id == "data") {
        dataSize = size // header field — payload may be truncated
      }
      // chunks are word-aligned: odd sizes carry one pad byte. Long
      // arithmetic: a hostile LE32 size near 0xFFFFFFF8 truncated to Int
      // would yield a zero (or negative) step and spin forever.
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > b.length) b.length else next.toInt
    }
    if (channels < 1 || sampleRate < 1 || bits < 1 || blockAlign < 1 ||
        dataSize < 0) None
    else {
      val frames = dataSize / blockAlign
      Some(AudioMeta("wav", channels, sampleRate.toInt, bits, frames,
        frames * 1000000L / sampleRate))
    }
  }

  /** Minimal canonical WAV header (44 bytes, no payload bytes emitted —
    * the data SIZE field alone declares `nFrames`), plus an optional
    * odd-sized LIST chunk before `fmt ` so fixtures exercise the
    * word-aligned walk. */
  def buildWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
               nFrames: Long, listPad: Int = 0): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && bitsPerSample > 0 &&
      nFrames >= 0 && listPad >= 0)
    val blockAlign = channels * bitsPerSample / 8
    require(blockAlign > 0, "bitsPerSample must be a byte multiple")
    val listChunk = if (listPad > 0) 8 + listPad + (listPad & 1) else 0
    val out = new Array[Byte](12 + listChunk + 24 + 8)
    def putTag(i: Int, s: String): Unit = {
      var k = 0; while (k < 4) { out(i + k) = s.charAt(k).toByte; k += 1 }
    }
    def putLe16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def putLe32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte
      out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte
      out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    putTag(0, "RIFF"); putLe32(4, out.length - 8L); putTag(8, "WAVE")
    var i = 12
    if (listPad > 0) {
      putTag(i, "LIST"); putLe32(i + 4, listPad.toLong)
      i += 8 + listPad + (listPad & 1) // pad byte on odd sizes
    }
    putTag(i, "fmt "); putLe32(i + 4, 16L)
    putLe16(i + 8, 1) // PCM
    putLe16(i + 10, channels)
    putLe32(i + 12, sampleRate.toLong)
    putLe32(i + 16, sampleRate.toLong * blockAlign)
    putLe16(i + 20, blockAlign)
    putLe16(i + 22, bitsPerSample)
    i += 24
    putTag(i, "data"); putLe32(i + 4, nFrames * blockAlign)
    out
  }

  /** Full WAV with a REAL PCM payload: interleaved `samples`
    * (frames × channels values) encoded per spec — 8-bit as unsigned
    * bytes (0-255), 16-bit as signed little-endian — with the RIFF pad
    * byte on odd data sizes. The sample-decode twin of
    * [[ImageCodec.buildPngPixels]]. */
  def buildWavPcm(channels: Int, sampleRate: Int, bitsPerSample: Int,
                  samples: Array[Int]): Array[Byte] = {
    require(bitsPerSample == 8 || bitsPerSample == 16,
      s"PCM fixture supports 8/16 bits, got $bitsPerSample")
    require(channels > 0 && samples.length % channels == 0,
      s"samples (${samples.length}) must be a multiple of channels")
    val bytesPer = bitsPerSample / 8
    val nFrames = samples.length / channels
    val header = buildWav(channels, sampleRate, bitsPerSample,
      nFrames.toLong)
    val dataSize = samples.length * bytesPer
    val out = new Array[Byte](header.length + dataSize + (dataSize & 1))
    System.arraycopy(header, 0, out, 0, header.length)
    var k = 0
    while (k < samples.length) {
      val v = samples(k)
      if (bitsPerSample == 8) {
        require(v >= 0 && v <= 255, s"8-bit sample out of range: $v")
        out(header.length + k) = v.toByte
      } else {
        require(v >= -32768 && v <= 32767, s"16-bit sample range: $v")
        out(header.length + 2 * k) = (v & 0xff).toByte
        out(header.length + 2 * k + 1) = ((v >> 8) & 0xff).toByte
      }
      k += 1
    }
    out
  }

  /** Decode a WAV's ACTUAL PCM samples (8-bit unsigned / 16-bit signed
    * LE, the shapes [[buildWavPcm]] emits): the chunk walk of
    * [[parseWav]] plus a full-payload read — a data chunk whose declared
    * size exceeds the bytes present is corruption and returns None,
    * never a silently short sample array. */
  def parseWavSamples(b: Array[Byte]): Option[(AudioMeta, Array[Int])] = {
    if (b == null || b.length < 36) return None
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var i = 12
    var channels = -1
    var sampleRate = -1L
    var bits = -1
    var blockAlign = -1
    var dataSize = -1L
    var dataOff = -1
    while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val id = tag(b, i)
      val size = le32(b, i + 4)
      if (id == "fmt ") {
        if (size < 16 || i + 8 + 16 > b.length) return None
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
      } else if (id == "data") {
        dataSize = size
        dataOff = i + 8
      }
      // Long step, clamped to the buffer: see the parseWav walk — an
      // Int-truncated hostile size would otherwise stall the cursor.
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > b.length) b.length else next.toInt
    }
    if (channels < 1 || sampleRate < 1 || blockAlign < 1 || dataSize < 0 ||
        (bits != 8 && bits != 16)) return None
    if (dataOff + dataSize > b.length) return None // truncated payload
    val n = (dataSize / (bits / 8)).toInt
    val samples = new Array[Int](n)
    var k = 0
    if (bits == 8) {
      while (k < n) { samples(k) = b(dataOff + k) & 0xff; k += 1 }
    } else {
      while (k < n) {
        samples(k) =
          ((b(dataOff + 2 * k) & 0xff) |
            (b(dataOff + 2 * k + 1) << 8)).toShort.toInt
        k += 1
      }
    }
    val frames = dataSize / blockAlign
    Some((AudioMeta("wav", channels, sampleRate.toInt, bits, frames,
      frames * 1000000L / sampleRate), samples))
  }

  /** Splice a REAL `LIST`/`INFO` metadata chunk (RIFF spec: fourCC
    * sub-chunks, NUL-terminated Latin-1 text, word-aligned) directly
    * after the RIFF header of an existing WAV — the provenance/tag
    * surface players and taggers read. Keys must be exactly 4 ASCII
    * chars (`IART`, `INAM`, `ICMT`, ...). */
  def addWavInfo(wav: Array[Byte], entries: Seq[(String, String)])
      : Array[Byte] = {
    require(wav.length >= 12 && tag(wav, 0) == "RIFF" &&
      tag(wav, 8) == "WAVE", "not a RIFF/WAVE payload")
    entries.foreach { case (k, _) =>
      require(k.length == 4 && k.forall(c => c >= 0x20 && c < 0x7f),
        s"INFO key must be 4 printable ASCII chars, got '$k'")
    }
    val body = new java.io.ByteArrayOutputStream()
    body.write("INFO".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    entries.foreach { case (k, v) =>
      val vb = v.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      require(!vb.contains(0.toByte), "INFO value must be NUL-free")
      val size = vb.length + 1 // include the terminating NUL
      body.write(k.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      body.write(size & 0xff); body.write((size >> 8) & 0xff)
      body.write((size >> 16) & 0xff); body.write((size >> 24) & 0xff)
      body.write(vb); body.write(0)
      if ((size & 1) == 1) body.write(0) // word alignment pad
    }
    val payload = body.toByteArray
    val out = new Array[Byte](wav.length + 8 + payload.length)
    System.arraycopy(wav, 0, out, 0, 12)
    out(12) = 'L'.toByte; out(13) = 'I'.toByte
    out(14) = 'S'.toByte; out(15) = 'T'.toByte
    val sz = payload.length.toLong
    out(16) = (sz & 0xff).toByte; out(17) = ((sz >> 8) & 0xff).toByte
    out(18) = ((sz >> 16) & 0xff).toByte
    out(19) = ((sz >> 24) & 0xff).toByte
    System.arraycopy(payload, 0, out, 20, payload.length)
    System.arraycopy(wav, 12, out, 20 + payload.length, wav.length - 12)
    // patch the RIFF size to cover the spliced chunk
    val riff = out.length - 8L
    out(4) = (riff & 0xff).toByte; out(5) = ((riff >> 8) & 0xff).toByte
    out(6) = ((riff >> 16) & 0xff).toByte
    out(7) = ((riff >> 24) & 0xff).toByte
    out
  }

  /** Walk the WAV's actual chunk stream back into (key, value) INFO
    * entries. Same clamped-Long cursor discipline as [[parseWav]] —
    * hostile sizes terminate, truncation/malformation returns None, a
    * valid WAV without a LIST/INFO chunk returns Some(empty). */
  def parseWavInfo(b: Array[Byte]): Option[Seq[(String, String)]] = {
    if (b == null || b.length < 12) return None
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    val out = Seq.newBuilder[(String, String)]
    var i = 12
    while (i + 8 <= b.length) {
      val id = tag(b, i)
      val size = le32(b, i + 4)
      if (size > b.length - i - 8) return None // declared past the end
      if (id == "LIST" && size >= 4 && tag(b, i + 8) == "INFO") {
        var j = i + 12
        val end = i + 8 + size.toInt
        while (j + 8 <= end) {
          val key = tag(b, j)
          val vsize = le32(b, j + 4)
          if (vsize < 1 || vsize > end - j - 8) return None
          val vend = j + 8 + vsize.toInt
          if (b(vend - 1) != 0) return None // spec: NUL-terminated
          out += key -> new String(b, j + 8, vsize.toInt - 1,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          val nj = j.toLong + 8L + vsize + (vsize & 1L)
          j = if (nj > end) end else nj.toInt
        }
      }
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > b.length) b.length else next.toInt
    }
    Some(out.result())
  }

  /** Privacy strip: rebuild the WAV keeping ONLY the `fmt ` and `data`
    * chunks (every LIST/INFO/bext/id3-style ancillary chunk — where
    * recorder serials and contact tags live — is dropped), with the
    * RIFF size re-patched and the audio content byte-identical.
    * Corruption returns None, never a half-stripped payload. */
  def stripWavMetadata(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null || b.length < 12) return None
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    val kept = Seq.newBuilder[(Int, Int)] // (offset, byte length incl pad)
    var total = 0
    var i = 12
    while (i + 8 <= b.length) {
      val id = tag(b, i)
      val size = le32(b, i + 4)
      if (size > b.length - i - 8) return None
      // the pad byte on an odd final chunk may be absent at EOF — clamp
      // the copied span to the bytes that exist (the guard above only
      // bounds the DATA, not the pad)
      val span = math.min(8L + size + (size & 1L), b.length - i.toLong)
        .toInt
      if (id == "fmt " || id == "data") {
        kept += ((i, span)); total += span
      }
      val next = i.toLong + span
      i = if (next > b.length) b.length else next.toInt
    }
    val out = new Array[Byte](12 + total)
    System.arraycopy(b, 0, out, 0, 12)
    var o = 12
    kept.result().foreach { case (off, len) =>
      System.arraycopy(b, off, out, o, len); o += len
    }
    val riff = out.length - 8L
    out(4) = (riff & 0xff).toByte; out(5) = ((riff >> 8) & 0xff).toByte
    out(6) = ((riff >> 16) & 0xff).toByte
    out(7) = ((riff >> 24) & 0xff).toByte
    Some(out)
  }
}
