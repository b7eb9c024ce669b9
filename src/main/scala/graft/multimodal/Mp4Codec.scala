package graft.multimodal

/** Pure-JVM ISO-BMFF (MP4) container codec — the video-container leg of
  * the real (non-fake) multimodal decode seam, public spec ISO 14496-12.
  * Same policy as [[ImageCodec]]/[[AudioCodec]]/[[GifCodec]]: parse the
  * actual encoded bytes, metadata-only (no codec payload decode), and
  * return None for anything unparseable — corruption becomes null, never
  * fabricated parameters.
  *
  * What a 100 TB curation scan wants from a video column is exactly what
  * the box tree carries without touching a single codec frame: brand,
  * movie timescale/duration (mvhd), per-track handler + timescale +
  * duration + sample count + pixel geometry (tkhd/mdhd/hdlr/stsz), and —
  * via the sample-table walk stsc × stco × stsz — the absolute BYTE
  * RANGE of every sample, which is all a content-hash near-dup pass
  * needs. The box grammar is uniform (uint32 BE size + 4CC type, size 1
  * → 64-bit largesize, size 0 → to end of container), so one recursive
  * walk covers everything; every offset is bounds-checked and entry
  * counts are sanity-capped so hostile headers can neither spin the
  * cursor nor drive allocation.
  */
object Mp4Codec {

  /** Geometry is tkhd's 16.16 fixed-point, integer part (0 for sound
    * tracks); durations are in the track's own `timescale`. */
  final case class Mp4Track(trackId: Long, handler: String,
                            timescale: Long, duration: Long,
                            sampleCount: Long, width: Int, height: Int)

  final case class Mp4Meta(majorBrand: String, movieTimescale: Long,
                           movieDuration: Long, tracks: Seq[Mp4Track])

  /** Hostile-header allocation cap: no fixture or sane file carries more
    * table entries than this; anything larger parses as corrupt. */
  private val MaxEntries = 1 << 22

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the direct children of `[start, end)`, calling `f(type,
    * boxStart, bodyStart, bodyEnd)` per box — boxStart is the first
    * byte of the box HEADER, which is what tfhd's default-base-is-moof
    * rule anchors to (and differs from bodyStart by 16, not 8, when
    * the box uses a largesize header). Returns false (corrupt) on any
    * header that overruns, shrinks below its own header size, or fails
    * to advance the cursor. */
  private def walkBoxesWithStart(b: Array[Byte], start: Long, end: Long)(
      f: (String, Long, Long, Long) => Boolean): Boolean = {
    var i = start
    while (i < end) {
      if (i + 8 > end) return false
      val size32 = be32(b, i.toInt)
      val typ = fourcc(b, i.toInt + 4)
      var header = 8L
      var size = size32
      if (size32 == 1L) {
        if (i + 16 > end) return false
        size = be64(b, i.toInt + 8)
        header = 16L
      } else if (size32 == 0L) {
        size = end - i // "to end of enclosing container"
      }
      if (size < header || i + size > end) return false
      if (!f(typ, i, i + header, i + size)) return false
      i += size
    }
    true
  }

  private def walkBoxes(b: Array[Byte], start: Long, end: Long)(
      f: (String, Long, Long) => Boolean): Boolean =
    walkBoxesWithStart(b, start, end)((typ, _, s, e) => f(typ, s, e))

  /** Container-level metadata: brand + mvhd + one entry per trak. */
  def parseMp4Meta(b: Array[Byte]): Option[Mp4Meta] = {
    if (b == null || b.length < 16) return None
    var brand: String = null
    var movieTs = -1L
    var movieDur = -1L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]
    var corrupt = false

    def parseTrak(ts: Long, te: Long): Boolean = {
      var trackId = -1L
      var w = 0
      var h = 0
      var mdhdTs = -1L
      var mdhdDur = -1L
      var handler: String = null
      var nSamples = -1L
      val ok = walkBoxes(b, ts, te) { (t2, s2, e2) =>
        t2 match {
          case "tkhd" =>
            if (s2 + 4 > e2) false
            else {
              val v = b(s2.toInt) & 0xff
              val base = s2 + 4
              // v0: cre(4) mod(4) id(4) res(4) dur(4); v1: 8,8,4,4,8.
              // width sits after reserved(8) layer/alt/vol/res(8) and
              // the 36-byte matrix → body offset 72 (v0) / 84 (v1)
              val idOff = base + (if (v == 1) 16 else 8)
              val geoOff = base + (if (v == 1) 84 else 72)
              if (idOff + 4 > e2) false
              else {
                trackId = be32(b, idOff.toInt)
                if (geoOff + 8 <= e2) {
                  w = (be32(b, geoOff.toInt) >> 16).toInt
                  h = (be32(b, geoOff.toInt + 4) >> 16).toInt
                }
                true
              }
            }
          case "mdia" =>
            walkBoxes(b, s2, e2) { (t3, s3, e3) =>
              t3 match {
                case "mdhd" =>
                  if (s3 + 4 > e3) false
                  else {
                    val v = b(s3.toInt) & 0xff
                    val base = s3 + 4
                    if (v == 1) {
                      if (base + 28 > e3) false
                      else {
                        mdhdTs = be32(b, base.toInt + 16)
                        mdhdDur = be64(b, base.toInt + 20)
                        true
                      }
                    } else {
                      if (base + 16 > e3) false
                      else {
                        mdhdTs = be32(b, base.toInt + 8)
                        mdhdDur = be32(b, base.toInt + 12)
                        true
                      }
                    }
                  }
                case "hdlr" =>
                  // version/flags(4) pre_defined(4) handler_type(4)
                  if (s3 + 12 > e3) false
                  else { handler = fourcc(b, s3.toInt + 8); true }
                case "minf" =>
                  walkBoxes(b, s3, e3) { (t4, s4, e4) =>
                    if (t4 != "stbl") true
                    else walkBoxes(b, s4, e4) { (t5, s5, e5) =>
                      if (t5 != "stsz") true
                      else if (s5 + 12 > e5) false
                      else {
                        val fixed = be32(b, s5.toInt + 4)
                        val cnt = be32(b, s5.toInt + 8)
                        if (cnt > MaxEntries) false
                        else if (fixed == 0L &&
                            s5 + 12 + 4L * cnt > e5) false
                        else { nSamples = cnt; true }
                      }
                    }
                  }
                case _ => true
              }
            }
          case _ => true
        }
      }
      if (!ok || trackId < 0 || mdhdTs <= 0 || handler == null ||
          nSamples < 0) false
      else {
        tracks += Mp4Track(trackId, handler, mdhdTs, mdhdDur, nSamples,
          w, h)
        true
      }
    }

    val ok = walkBoxes(b, 0L, b.length.toLong) { (typ, s, e) =>
      typ match {
        case "ftyp" =>
          if (s + 8 > e) false
          else { brand = fourcc(b, s.toInt); true }
        case "moov" =>
          walkBoxes(b, s, e) { (t1, s1, e1) =>
            t1 match {
              case "mvhd" =>
                if (s1 + 4 > e1) false
                else {
                  val v = b(s1.toInt) & 0xff
                  val base = s1 + 4
                  if (v == 1) {
                    if (base + 28 > e1) false
                    else {
                      movieTs = be32(b, base.toInt + 16)
                      movieDur = be64(b, base.toInt + 20)
                      true
                    }
                  } else {
                    if (base + 16 > e1) false
                    else {
                      movieTs = be32(b, base.toInt + 8)
                      movieDur = be32(b, base.toInt + 12)
                      true
                    }
                  }
                }
              case "trak" => if (parseTrak(s1, e1)) true
                else { corrupt = true; false }
              case _ => true
            }
          }
        case _ => true
      }
    }
    if (!ok || corrupt || brand == null || movieTs <= 0 || tracks.isEmpty)
      None
    else Some(Mp4Meta(brand, movieTs, movieDur, tracks.toSeq))
  }

  /** [[parseMp4SampleRangesWithCodec]] without the codec column —
    * kept for call sites that only walk bytes (hashing, counting). */
  def parseMp4SampleRanges(b: Array[Byte])
      : Option[Seq[(Long, String, Seq[(Long, Long)])]] =
    parseMp4SampleRangesWithCodec(b).map(_.map {
      case (id, h, _, rs) => (id, h, rs)
    })

  /** Per-track absolute sample byte ranges: (trackId, handler, codec,
    * ranges) where `codec` is the stsd first-sample-entry fourcc (""
    * when the track carries no parseable stsd) and each range is
    * (offset, size) into the file. Covers BOTH layouts — the flat
    * stsc × stco × stsz walk and fragmented files (moof/traf: tfhd
    * base-data-offset / default-base-is-moof / implicit
    * end-of-previous-traf + default-sample-size, trun data-offset +
    * per-sample sizes), with fragment runs appended to their track in
    * file order. Every range is validated against the byte length — a
    * table pointing outside the file parses as corrupt. */
  def parseMp4SampleRangesWithCodec(b: Array[Byte])
      : Option[Seq[(Long, String, String, Seq[(Long, Long)])]] = {
    if (b == null || b.length < 16) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[
      (Long, String, String,
        scala.collection.mutable.ArrayBuffer[(Long, Long)])]
    var sawMoov = false

    def parseTrak(ts: Long, te: Long): Boolean = {
      var trackId = -1L
      var handler: String = null
      var codec: String = ""
      var sizes: Array[Long] = null
      var chunkOffsets: Array[Long] = null
      var stsc: Array[(Long, Long)] = null // (firstChunk, samplesPerChunk)
      val ok = walkBoxes(b, ts, te) { (t2, s2, e2) =>
        t2 match {
          case "tkhd" =>
            if (s2 + 4 > e2) false
            else {
              val v = b(s2.toInt) & 0xff
              val idOff = s2 + 4 + (if (v == 1) 16 else 8)
              if (idOff + 4 > e2) false
              else { trackId = be32(b, idOff.toInt); true }
            }
          case "mdia" =>
            walkBoxes(b, s2, e2) { (t3, s3, e3) =>
              t3 match {
                case "hdlr" =>
                  if (s3 + 12 > e3) false
                  else { handler = fourcc(b, s3.toInt + 8); true }
                case "minf" =>
                  walkBoxes(b, s3, e3) { (t4, s4, e4) =>
                    if (t4 != "stbl") true
                    else walkBoxes(b, s4, e4) { (t5, s5, e5) =>
                      t5 match {
                        case "stsd" =>
                          // version/flags(4) entry_count(4), then the
                          // first sample-entry box: size(4) fourcc(4)
                          if (s5 + 16 > e5) true // no parseable entry
                          else { codec = fourcc(b, s5.toInt + 12); true }
                        case "stsz" =>
                          if (s5 + 12 > e5) false
                          else {
                            val fixed = be32(b, s5.toInt + 4)
                            val cnt = be32(b, s5.toInt + 8)
                            if (cnt > MaxEntries) false
                            else if (fixed != 0L)
                              { sizes = Array.fill(cnt.toInt)(fixed); true }
                            else if (s5 + 12 + 4L * cnt > e5) false
                            else {
                              sizes = Array.tabulate(cnt.toInt)(k =>
                                be32(b, (s5 + 12 + 4L * k).toInt))
                              true
                            }
                          }
                        case "stsc" =>
                          if (s5 + 8 > e5) false
                          else {
                            val cnt = be32(b, s5.toInt + 4)
                            if (cnt > MaxEntries ||
                                s5 + 8 + 12L * cnt > e5) false
                            else {
                              stsc = Array.tabulate(cnt.toInt) { k =>
                                val o = (s5 + 8 + 12L * k).toInt
                                (be32(b, o), be32(b, o + 4))
                              }
                              true
                            }
                          }
                        case "stco" | "co64" =>
                          if (s5 + 8 > e5) false
                          else {
                            val wide = t5 == "co64"
                            val cnt = be32(b, s5.toInt + 4)
                            val step = if (wide) 8L else 4L
                            if (cnt > MaxEntries ||
                                s5 + 8 + step * cnt > e5) false
                            else {
                              chunkOffsets = Array.tabulate(cnt.toInt) {
                                k =>
                                  val o = (s5 + 8 + step * k).toInt
                                  if (wide) be64(b, o) else be32(b, o)
                              }
                              true
                            }
                          }
                        case _ => true
                      }
                    }
                  }
                case _ => true
              }
            }
          case _ => true
        }
      }
      if (!ok || trackId < 0 || handler == null || sizes == null)
        return false
      if (sizes.isEmpty) { // zero-sample stbl (fragmented layout): the
        out += ((trackId, handler, codec, // track exists, runs come from moofs
          scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]))
        return true
      }
      if (chunkOffsets == null || stsc == null || stsc.isEmpty)
        return false
      // stsc entry k applies to chunks [firstChunk_k, firstChunk_{k+1});
      // expand across stco's chunks, consuming stsz sizes in order
      val ranges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var sample = 0
      var entry = 0
      var chunk = 1L // 1-based per spec
      while (chunk <= chunkOffsets.length && sample < sizes.length) {
        if (entry + 1 < stsc.length && chunk >= stsc(entry + 1)._1)
          entry += 1
        if (stsc(entry)._1 > chunk) return false // gap: corrupt table
        val perChunk = stsc(entry)._2
        if (perChunk < 0 || perChunk > MaxEntries) return false
        var off = chunkOffsets((chunk - 1).toInt)
        var k = 0L
        while (k < perChunk && sample < sizes.length) {
          val sz = sizes(sample)
          if (off < 0 || sz < 0 || off + sz > b.length) return false
          ranges += ((off, sz))
          off += sz
          sample += 1
          k += 1
        }
        chunk += 1
      }
      if (sample != sizes.length) return false // table shortfall
      out += ((trackId, handler, codec, ranges))
      true
    }

    // One movie fragment's traf: tfhd carries the track id, the base
    // offset policy and an optional default sample size; each trun
    // contributes a run of consecutive samples (explicit per-sample
    // sizes when flag 0x200, else the tfhd default), runs without a
    // data offset continuing from the previous run's end. Base policy
    // per ISO 14496-12 §8.8.7: explicit base-data-offset (flag 0x1)
    // wins; else default-base-is-moof (flag 0x020000) anchors at the
    // moof HEADER start; else the first traf anchors at moof start and
    // later trafs at the END OF THE PREVIOUS TRAF'S DATA (prevEnd).
    // Returns Long.MinValue on corrupt, else the end of this traf's
    // data (prevEnd unchanged if the traf defined no samples).
    def parseTraf(ts: Long, te: Long, moofStart: Long,
                  prevEnd: Long): Long = {
      var trackId = -1L
      var baseOffset = moofStart
      var defSize = -1L
      var cursor = -1L
      var dataEnd = -1L
      val ok = walkBoxes(b, ts, te) { (t2, s2, e2) =>
        t2 match {
          case "tfhd" =>
            if (s2 + 8 > e2) false
            else {
              val flags = (be32(b, s2.toInt) & 0xffffffL).toInt
              trackId = be32(b, s2.toInt + 4)
              baseOffset =
                if ((flags & 0x020000) != 0) moofStart
                else if (prevEnd >= 0) prevEnd
                else moofStart
              var p = s2 + 8
              var good = true
              if ((flags & 0x01) != 0) {
                if (p + 8 > e2) good = false
                else { baseOffset = be64(b, p.toInt); p += 8 }
              }
              if (good && (flags & 0x02) != 0) p += 4 // sample-desc idx
              if (good && (flags & 0x08) != 0) p += 4 // default duration
              if (good && (flags & 0x10) != 0) {
                if (p + 4 > e2) good = false
                else { defSize = be32(b, p.toInt); p += 4 }
              }
              good && p <= e2
            }
          case "trun" =>
            if (trackId < 0 || s2 + 8 > e2) false
            else {
              val flags = (be32(b, s2.toInt) & 0xffffffL).toInt
              val n = be32(b, s2.toInt + 4)
              if (n > MaxEntries) false
              else {
                var p = s2 + 8
                var good = true
                if ((flags & 0x01) != 0) {
                  if (p + 4 > e2) good = false
                  else { cursor = baseOffset + be32(b, p.toInt).toInt
                    p += 4 }
                } else if (cursor < 0) good = false // no start anchor
                if (good && (flags & 0x04) != 0) p += 4 // first-flags
                val perSample =
                  (if ((flags & 0x100) != 0) 4 else 0) +
                    (if ((flags & 0x200) != 0) 4 else 0) +
                    (if ((flags & 0x400) != 0) 4 else 0) +
                    (if ((flags & 0x800) != 0) 4 else 0)
                if (good && p + perSample.toLong * n > e2) good = false
                if (good && (flags & 0x200) == 0 && defSize < 0)
                  good = false // no size source at all
                if (!good) false
                else {
                  val track = out.find(_._1 == trackId).orNull
                  if (track == null) false
                  else {
                    val ranges = track._4
                    val sizeOff = if ((flags & 0x100) != 0) 4 else 0
                    var k = 0L
                    var fine = true
                    while (fine && k < n) {
                      val base = p + perSample * k
                      val sz =
                        if ((flags & 0x200) != 0)
                          be32(b, (base + sizeOff).toInt)
                        else defSize
                      if (sz < 0 || cursor < 0 ||
                          cursor + sz > b.length) fine = false
                      else {
                        ranges += ((cursor, sz))
                        cursor += sz
                        k += 1
                      }
                    }
                    // a zero-sample trun defines no data: its cursor is
                    // just the (possibly arbitrary) data-offset anchor,
                    // and letting it move dataEnd would hand a following
                    // implicit-base traf an end-of-nothing anchor
                    if (fine && n > 0 && cursor > dataEnd) dataEnd = cursor
                    fine
                  }
                }
              }
            }
          case _ => true
        }
      }
      if (!ok || trackId < 0) Long.MinValue
      else if (dataEnd >= 0) dataEnd
      else prevEnd
    }

    val ok = walkBoxesWithStart(b, 0L, b.length.toLong) { (typ, bs, s, e) =>
      typ match {
        case "moov" =>
          sawMoov = true
          walkBoxes(b, s, e) { (t1, s1, e1) =>
            if (t1 != "trak") true else parseTrak(s1, e1)
          }
        case "moof" =>
          val moofStart = bs // the box HEADER start, largesize-proof
          var prevEnd = -1L  // implicit-base anchor for trafs after the first
          walkBoxes(b, s, e) { (t1, s1, e1) =>
            if (t1 != "traf") true
            else {
              val r = parseTraf(s1, e1, moofStart, prevEnd)
              if (r == Long.MinValue) false
              else { prevEnd = r; true }
            }
          }
        case _ => true
      }
    }
    if (!ok || !sawMoov || out.isEmpty) None
    else Some(out.toSeq.map { case (id, h, c, rs) => (id, h, c, rs.toSeq) })
  }

  // ------------------------------------------------------------------
  // Builder — real ISO-BMFF fixtures (ftyp + moov + mdat), two chunks
  // per track when the sample count allows so the stsc×stco expansion
  // is genuinely exercised, not just the one-chunk degenerate case.
  // ------------------------------------------------------------------

  /** One media track: `handler` is "vide" or "soun"; every sample lasts
    * `sampleDelta` ticks of `timescale`; geometry only meaningful for
    * video. */
  final case class TrackSpec(handler: String, timescale: Long,
                             sampleDelta: Long,
                             samples: Seq[Array[Byte]],
                             width: Int = 0, height: Int = 0)

  private final class W {
    private val buf = new java.io.ByteArrayOutputStream()
    def bytes: Array[Byte] = buf.toByteArray
    def size: Int = buf.size
    def u8(v: Int): W = { buf.write(v & 0xff); this }
    def u16(v: Int): W = { u8(v >> 8); u8(v) }
    def u32(v: Long): W =
      { u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt)
        u8(v.toInt) }
    def tag(s: String): W = { s.foreach(c => u8(c.toInt)); this }
    def raw(b: Array[Byte]): W = { buf.write(b); this }
    def zeros(n: Int): W = { (0 until n).foreach(_ => u8(0)); this }
  }

  private def box(typ: String, body: Array[Byte]): Array[Byte] = {
    val w = new W
    w.u32(8L + body.length).tag(typ).raw(body)
    w.bytes
  }

  /** Split `n` samples into chunk sizes: two chunks (ceil/floor) when
    * n >= 2, one otherwise — enough to make stsc/stco non-trivial. */
  private def chunkSplit(n: Int): Seq[Int] =
    if (n >= 2) Seq((n + 1) / 2, n / 2) else Seq(n)

  private def ftypBox(majorBrand: String): Array[Byte] = box("ftyp", {
    val w = new W
    w.tag(majorBrand).u32(0L).tag(majorBrand).tag("iso2")
    w.bytes
  })

  /** Assemble a complete MP4. `movieTimescale` defaults to 1000 (ms
    * ticks); chunk offsets are absolute, computed by building moov once
    * with zeroed stco then rebuilding with the real offsets (box sizes
    * are offset-independent). */
  def buildMp4(tracks: Seq[TrackSpec],
               movieTimescale: Long = 1000L,
               majorBrand: String = "isom"): Array[Byte] = {
    require(tracks.nonEmpty, "at least one track")
    require(tracks.forall(t => t.handler.length == 4 &&
      t.timescale > 0 && t.sampleDelta > 0), "bad track spec")
    val ftyp = ftypBox(majorBrand)
    val movieDur = tracks.map(t =>
      t.samples.length * t.sampleDelta * movieTimescale / t.timescale)
      .foldLeft(0L)(math.max)

    def moov(offsets: Seq[Seq[Long]]): Array[Byte] = {
      val mvhd = box("mvhd", {
        val w = new W
        w.u32(0L) // version 0 + flags
        w.u32(0L).u32(0L) // creation, modification
        w.u32(movieTimescale).u32(movieDur)
        w.u32(0x00010000L).u16(0x0100).u16(0) // rate, volume, reserved
        w.zeros(8) // reserved
        // unity matrix
        w.u32(0x00010000L).u32(0L).u32(0L)
        w.u32(0L).u32(0x00010000L).u32(0L)
        w.u32(0L).u32(0L).u32(0x40000000L)
        w.zeros(24) // pre_defined
        w.u32(tracks.length + 1L) // next_track_ID
        w.bytes
      })
      val traks = tracks.zipWithIndex.map { case (t, ti) =>
        val trackDur =
          t.samples.length * t.sampleDelta * movieTimescale / t.timescale
        val tkhd = box("tkhd", {
          val w = new W
          w.u8(0).u8(0).u16(7) // version 0, flags enabled|in-movie
          w.u32(0L).u32(0L) // creation, modification
          w.u32(ti + 1L).u32(0L).u32(trackDur)
          w.zeros(8) // reserved
          w.u16(0).u16(0) // layer, alternate_group
          w.u16(if (t.handler == "soun") 0x0100 else 0).u16(0)
          w.u32(0x00010000L).u32(0L).u32(0L)
          w.u32(0L).u32(0x00010000L).u32(0L)
          w.u32(0L).u32(0L).u32(0x40000000L)
          w.u32(t.width.toLong << 16).u32(t.height.toLong << 16)
          w.bytes
        })
        val mdhd = box("mdhd", {
          val w = new W
          w.u32(0L).u32(0L).u32(0L)
          w.u32(t.timescale)
          w.u32(t.samples.length * t.sampleDelta)
          w.u16(0x55c4).u16(0) // language 'und', pre_defined
          w.bytes
        })
        val hdlr = box("hdlr", {
          val w = new W
          w.u32(0L).u32(0L).tag(t.handler).zeros(12)
          w.tag(if (t.handler == "vide") "Vide" else "Soun").u8(0)
          w.bytes
        })
        val mediaHeader =
          if (t.handler == "vide")
            box("vmhd", { val w = new W
              w.u8(0).u8(0).u16(1).u16(0).u16(0).u16(0).u16(0); w.bytes })
          else
            box("smhd", { val w = new W
              w.u32(0L).u16(0).u16(0); w.bytes })
        val dinf = box("dinf", box("dref", {
          val w = new W
          w.u32(0L).u32(1L)
          w.raw(box("url ", { val nw = new W
            nw.u8(0).u8(0).u16(1); nw.bytes })) // self-contained flag
          w.bytes
        }))
        val stsd = box("stsd", {
          val w = new W
          w.u32(0L).u32(1L)
          if (t.handler == "vide")
            w.raw(box("mp4v", { val sw = new W
              sw.zeros(6).u16(1) // reserved, data_reference_index
              sw.zeros(16) // pre_defined / reserved
              sw.u16(t.width).u16(t.height)
              sw.u32(0x00480000L).u32(0x00480000L) // 72 dpi
              sw.u32(0L).u16(1) // reserved, frame_count
              sw.zeros(32) // compressorname
              sw.u16(24).u16(0xffff) // depth, pre_defined
              sw.bytes }))
          else
            // 'sowt' = 16-bit little-endian uncompressed PCM — the
            // honest fourcc for the raw s16le samples the fixtures
            // carry (an 'mp4a' entry would claim AAC over raw PCM)
            w.raw(box("sowt", { val sw = new W
              sw.zeros(6).u16(1)
              sw.zeros(8) // reserved
              sw.u16(1).u16(16).u32(0L) // channels, samplesize, reserved
              sw.u32(t.timescale << 16) // samplerate 16.16
              sw.bytes }))
          w.bytes
        })
        val stts = box("stts", {
          val w = new W
          w.u32(0L).u32(1L)
          w.u32(t.samples.length.toLong).u32(t.sampleDelta)
          w.bytes
        })
        val stsz = box("stsz", {
          val w = new W
          w.u32(0L).u32(0L).u32(t.samples.length.toLong)
          t.samples.foreach(s => w.u32(s.length.toLong))
          w.bytes
        })
        val chunks = chunkSplit(t.samples.length)
        val stsc = box("stsc", {
          val w = new W
          val entries = chunks.zipWithIndex
            .map { case (c, i) => (i + 1L, c.toLong) }
            .filter(_._2 > 0)
          w.u32(0L).u32(entries.length.toLong)
          entries.foreach { case (first, per) =>
            w.u32(first).u32(per).u32(1L)
          }
          w.bytes
        })
        val stco = box("stco", {
          val w = new W
          val offs = offsets(ti)
          w.u32(0L).u32(offs.length.toLong)
          offs.foreach(w.u32)
          w.bytes
        })
        val stbl = box("stbl",
          stsd ++ stts ++ stsc ++ stsz ++ stco)
        val minf = box("minf", mediaHeader ++ dinf ++ stbl)
        val mdia = box("mdia", mdhd ++ hdlr ++ minf)
        box("trak", tkhd ++ mdia)
      }
      box("moov", traks.foldLeft(mvhd)(_ ++ _))
    }

    // pass 1: zeroed stco to learn moov's size (stco length depends only
    // on chunk COUNT, so pass 2's box sizes are identical)
    val zeroOffsets = tracks.map(t =>
      chunkSplit(t.samples.length).filter(_ > 0).map(_ => 0L))
    val moovLen = moov(zeroOffsets).length
    val mdatPayloadStart = ftyp.length + moovLen + 8L
    var cursor = mdatPayloadStart
    val realOffsets = tracks.map { t =>
      val perChunk = chunkSplit(t.samples.length).filter(_ > 0)
      var s = 0
      perChunk.map { c =>
        val off = cursor
        (0 until c).foreach { _ =>
          cursor += t.samples(s).length; s += 1
        }
        off
      }
    }
    val mdatBody = {
      val w = new W
      tracks.foreach(_.samples.foreach(w.raw))
      w.bytes
    }
    ftyp ++ moov(realOffsets) ++ box("mdat", mdatBody)
  }

  /** Assemble a FRAGMENTED MP4 (CMAF/DASH shape): ftyp + moov whose
    * sample tables are empty (mvex/trex declares the fragment
    * defaults), then one moof+mdat pair per `samplesPerFragment`
    * samples — tfhd with default-base-is-moof, trun with explicit
    * data offset and per-sample sizes. Content-identical to
    * [[buildMp4]] of the same tracks: the sample BYTES and their
    * per-track order are the same, only the container layout differs —
    * which is exactly the property the cross-layout gate pins. */
  def buildFragmentedMp4(tracks: Seq[TrackSpec],
                         samplesPerFragment: Int = 2,
                         movieTimescale: Long = 1000L,
                         majorBrand: String = "isom"): Array[Byte] = {
    require(tracks.nonEmpty, "at least one track")
    require(samplesPerFragment >= 1, "samplesPerFragment must be >= 1")
    // moov with EMPTY sample tables, then splice mvex (trex per track)
    // into its body — box sizes are self-describing, so the rebuild is
    // a size-field recompute
    val empty = buildMp4(tracks.map(_.copy(samples = Nil)),
      movieTimescale, majorBrand)
    val ftypLen = be32(empty, 0).toInt
    val moovLen = be32(empty, ftypLen).toInt
    val moovBody = java.util.Arrays.copyOfRange(empty, ftypLen + 8,
      ftypLen + moovLen)
    val mvex = box("mvex", tracks.indices.map { ti =>
      box("trex", {
        val w = new W
        w.u32(0L) // version/flags
        w.u32(ti + 1L) // track_ID
        w.u32(1L) // default_sample_description_index
        w.u32(tracks(ti).sampleDelta) // default_sample_duration
        w.u32(0L).u32(0L) // default size, default flags
        w.bytes
      })
    }.reduce(_ ++ _))
    val head = java.util.Arrays.copyOfRange(empty, 0, ftypLen) ++
      box("moov", moovBody ++ mvex)

    val nFrags = tracks.map(t => (t.samples.length +
      samplesPerFragment - 1) / samplesPerFragment).foldLeft(1)(math.max)
    val frags = (0 until nFrags).map { f =>
      val runs = tracks.zipWithIndex.flatMap { case (t, ti) =>
        val part = t.samples.slice(f * samplesPerFragment,
          (f + 1) * samplesPerFragment)
        if (part.isEmpty) None else Some((ti + 1L, part))
      }
      def moof(dataOffsets: Seq[Long]): Array[Byte] = {
        val mfhd = box("mfhd", { val w = new W
          w.u32(0L).u32(f + 1L); w.bytes })
        val trafs = runs.zip(dataOffsets).map { case ((tid, part), off) =>
          val tfhd = box("tfhd", { val w = new W
            w.u8(0).u8(2).u16(0) // version 0, flags 0x020000 (base-is-moof)
            w.u32(tid); w.bytes })
          val trun = box("trun", { val w = new W
            w.u8(0).u8(0).u16(0x201) // data-offset + sample-size present
            w.u32(part.length.toLong)
            w.u32(off)
            part.foreach(s => w.u32(s.length.toLong))
            w.bytes })
          box("traf", tfhd ++ trun)
        }
        box("moof", trafs.foldLeft(mfhd)(_ ++ _))
      }
      val moofLen = moof(runs.map(_ => 0L)).length
      var cursor = moofLen + 8L // into the fragment, from moof start
      val offsets = runs.map { case (_, part) =>
        val o = cursor
        part.foreach(s => cursor += s.length)
        o
      }
      val mdatBody = { val w = new W
        runs.foreach(_._2.foreach(w.raw)); w.bytes }
      moof(offsets) ++ box("mdat", mdatBody)
    }
    // drop the empty-moov build's trailing empty mdat (8 bytes)
    frags.foldLeft(head)(_ ++ _)
  }
}
