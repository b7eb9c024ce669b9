package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Tables.t

/** Driver-gated queries over the multimodal seam's REAL byte decoders:
  * perceptual-hash image dedup, windowed PCM audio features, and uniform
  * frame sampling. Fixtures are genuine encoded bytes (PNG zlib IDAT, RIFF
  * PCM, GIF89a block streams) built from doc_id formulas, so the DuckDB
  * oracle replays the FORMULAS while Spark must earn the same numbers by
  * decoding the actual payloads — one slipped bit fails the hash.
  */
object MediaQueries {

  val all: Seq[Q] = Seq(

    // Perceptual block-mean hash over real decoded PNG pixels
    // (Multimodal.imageBlockHash): 8x8 grid, per-block intensity vs the
    // global mean, CROSS-MULTIPLIED so every bit is integer-exact. The
    // oracle rebuilds the grid arithmetic from the pixel formula —
    // including the planted near-duplicate class (id % 5 == 4 re-encodes
    // the previous id's image with every 97th pixel bumped), so the gate
    // also pins that copies hash close to their originals.
    Q("q_multimodal_blockhash",
      """WITH p AS (SELECT doc_id AS id,
        |                  CASE WHEN doc_id % 5 = 4 THEN doc_id - 1
        |                       ELSE doc_id END AS b
        |           FROM documents),
        |d AS (SELECT id, b, CAST(b % 13 + 8 AS INT) AS w,
        |             CAST(b % 11 + 8 AS INT) AS h
        |      FROM p),
        |px AS (SELECT id, b, w, h, unnest(range(0, w * h)) AS k FROM d),
        |v AS (SELECT id, w, h, k,
        |             CASE WHEN id % 5 = 4 AND k % 97 = 0
        |                  THEN ((b * 31 + k * (7 + b % 7) + 13) % 251
        |                        + 1) % 251
        |                  ELSE (b * 31 + k * (7 + b % 7) + 13) % 251
        |             END AS val
        |      FROM px),
        |blk AS (SELECT id, w, h,
        |               ((k // w) * 8 // h) * 8 + (k % w) * 8 // w AS blk,
        |               val
        |        FROM v),
        |bsum AS (SELECT id, blk, sum(val) AS bs, count(*) AS bn
        |         FROM blk GROUP BY 1, 2),
        |tot AS (SELECT id, max(w) AS w, max(h) AS h, sum(val) AS ts,
        |               count(*) AS tn
        |        FROM blk GROUP BY 1),
        |bits AS (SELECT s.id, s.blk,
        |                CASE WHEN s.bs * t.tn > t.ts * s.bn THEN 1
        |                     ELSE 0 END AS bit
        |         FROM bsum s JOIN tot t USING (id))
        |SELECT t.id AS media_id, t.w AS width, t.h AS height,
        |       CAST(coalesce(sum(CASE WHEN x.blk >= 32
        |                 THEN x.bit * (CAST(1 AS BIGINT) << (x.blk - 32))
        |                 ELSE 0 END), 0) AS BIGINT) AS hash_hi,
        |       CAST(coalesce(sum(CASE WHEN x.blk < 32
        |                 THEN x.bit * (CAST(1 AS BIGINT) << x.blk)
        |                 ELSE 0 END), 0) AS BIGINT) AS hash_lo
        |FROM tot t JOIN bits x ON t.id = x.id
        |GROUP BY 1, 2, 3 ORDER BY media_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.imageBlockHash(
          Multimodal.syntheticNearDupImages(t(s, dir, "documents")))
        .select("media_id", "width", "height", "hash_hi", "hash_lo")
        .orderBy("media_id")
    },

    // Image near-dup pairs by banded perceptual hash
    // (Multimodal.imageNearDups): four 16-bit bands gate candidates
    // through an equi-join (never all-pairs — PlanShapeSpec pins the
    // join shape), full 64-bit Hamming <= 6 confirms. The oracle replays
    // the SAME banding semantics, so a pair reachable only through a
    // non-matching band stays out on both sides. The planted id%5==4
    // copies are the expected survivors.
    Q("q_image_neardup",
      """WITH p AS (SELECT doc_id AS id,
        |                  CASE WHEN doc_id % 5 = 4 THEN doc_id - 1
        |                       ELSE doc_id END AS b
        |           FROM documents),
        |d AS (SELECT id, b, CAST(b % 13 + 8 AS INT) AS w,
        |             CAST(b % 11 + 8 AS INT) AS h
        |      FROM p),
        |px AS (SELECT id, b, w, h, unnest(range(0, w * h)) AS k FROM d),
        |v AS (SELECT id, w, h, k,
        |             CASE WHEN id % 5 = 4 AND k % 97 = 0
        |                  THEN ((b * 31 + k * (7 + b % 7) + 13) % 251
        |                        + 1) % 251
        |                  ELSE (b * 31 + k * (7 + b % 7) + 13) % 251
        |             END AS val
        |      FROM px),
        |blk AS (SELECT id,
        |               ((k // w) * 8 // h) * 8 + (k % w) * 8 // w AS blk,
        |               val
        |        FROM v),
        |bsum AS (SELECT id, blk, sum(val) AS bs, count(*) AS bn
        |         FROM blk GROUP BY 1, 2),
        |tot AS (SELECT id, sum(val) AS ts, count(*) AS tn
        |        FROM blk GROUP BY 1),
        |bits AS (SELECT s.id, s.blk,
        |                CASE WHEN s.bs * t.tn > t.ts * s.bn THEN 1
        |                     ELSE 0 END AS bit
        |         FROM bsum s JOIN tot t USING (id)),
        |hs AS (SELECT t.id,
        |              CAST(coalesce(sum(CASE WHEN x.blk >= 32
        |                    THEN x.bit * (CAST(1 AS BIGINT) << (x.blk - 32))
        |                    ELSE 0 END), 0) AS BIGINT) AS hi,
        |              CAST(coalesce(sum(CASE WHEN x.blk < 32
        |                    THEN x.bit * (CAST(1 AS BIGINT) << x.blk)
        |                    ELSE 0 END), 0) AS BIGINT) AS lo
        |       FROM tot t JOIN bits x ON t.id = x.id GROUP BY 1),
        |bands AS (SELECT id, hi, lo, j AS band,
        |                 CASE j WHEN 0 THEN lo % 65536
        |                        WHEN 1 THEN (lo // 65536) % 65536
        |                        WHEN 2 THEN hi % 65536
        |                        ELSE (hi // 65536) % 65536 END AS bv
        |          FROM hs, range(0, 4) AS r(j)),
        |cand AS (SELECT DISTINCT a.id AS id1, b.id AS id2,
        |                a.hi AS hi1, a.lo AS lo1, b.hi AS hi2, b.lo AS lo2
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
        |SELECT id1, id2,
        |       CAST(bit_count(xor(hi1, hi2)) + bit_count(xor(lo1, lo2))
        |            AS INT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(hi1, hi2)) + bit_count(xor(lo1, lo2)) <= 6
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.imageNearDups(
          Multimodal.imageBlockHash(
            Multimodal.syntheticNearDupImages(t(s, dir, "documents"))))
        .orderBy("id1", "id2")
    },

    // Incremental image near-dup (Multimodal.incrementalImageNearDups):
    // a new crawl batch (retouched re-encodes, +2 bump every 89th
    // pixel) lands against the STANDING hash index — only the batch is
    // decoded, only colliding index buckets are touched. The oracle
    // replays both fixture formulas through the shared grid arithmetic
    // and the same band-join semantics, sides tagged in one union.
    Q("q_image_neardup_inc",
      """WITH u AS (
        |  SELECT 0 AS side, doc_id AS mid,
        |         CASE WHEN doc_id % 5 = 4 THEN doc_id - 1
        |              ELSE doc_id END AS b,
        |         doc_id AS oid
        |  FROM documents
        |  UNION ALL
        |  SELECT 1, doc_id + 1000000, doc_id, doc_id
        |  FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT side, mid, b, oid, CAST(b % 13 + 8 AS INT) AS w,
        |             CAST(b % 11 + 8 AS INT) AS h
        |      FROM u),
        |px AS (SELECT side, mid, b, oid, w, h,
        |              unnest(range(0, w * h)) AS k
        |       FROM d),
        |v AS (SELECT side, mid, k,
        |             CASE
        |               WHEN side = 0 AND oid % 5 = 4 AND k % 97 = 0
        |                 THEN ((b * 31 + k * (7 + b % 7) + 13) % 251
        |                       + 1) % 251
        |               WHEN side = 1 AND k % 89 = 0
        |                 THEN ((b * 31 + k * (7 + b % 7) + 13) % 251
        |                       + 2) % 251
        |               ELSE (b * 31 + k * (7 + b % 7) + 13) % 251
        |             END AS val,
        |             ((k // w) * 8 // h) * 8 + (k % w) * 8 // w AS blk
        |      FROM px),
        |bsum AS (SELECT side, mid, blk, sum(val) AS bs, count(*) AS bn
        |         FROM v GROUP BY 1, 2, 3),
        |tot AS (SELECT side, mid, sum(val) AS ts, count(*) AS tn
        |        FROM v GROUP BY 1, 2),
        |bits AS (SELECT s.side, s.mid, s.blk,
        |                CASE WHEN s.bs * t.tn > t.ts * s.bn THEN 1
        |                     ELSE 0 END AS bit
        |         FROM bsum s
        |         JOIN tot t ON s.side = t.side AND s.mid = t.mid),
        |hs AS (SELECT side, mid,
        |              CAST(coalesce(sum(CASE WHEN blk >= 32
        |                    THEN bit * (CAST(1 AS BIGINT) << (blk - 32))
        |                    ELSE 0 END), 0) AS BIGINT) AS hi,
        |              CAST(coalesce(sum(CASE WHEN blk < 32
        |                    THEN bit * (CAST(1 AS BIGINT) << blk)
        |                    ELSE 0 END), 0) AS BIGINT) AS lo
        |       FROM bits GROUP BY 1, 2),
        |bands AS (SELECT side, mid, hi, lo, j AS band,
        |                 CASE j WHEN 0 THEN lo % 65536
        |                        WHEN 1 THEN (lo // 65536) % 65536
        |                        WHEN 2 THEN hi % 65536
        |                        ELSE (hi // 65536) % 65536 END AS bv
        |          FROM hs, range(0, 4) AS r(j)),
        |cand AS (SELECT DISTINCT bb.mid AS batch_id, aa.mid AS index_id,
        |                bb.hi AS bhi, bb.lo AS blo,
        |                aa.hi AS ihi, aa.lo AS ilo
        |         FROM bands aa JOIN bands bb
        |           ON aa.band = bb.band AND aa.bv = bb.bv
        |         WHERE aa.side = 0 AND bb.side = 1)
        |SELECT batch_id, index_id,
        |       CAST(bit_count(xor(bhi, ihi)) + bit_count(xor(blo, ilo))
        |            AS INT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(bhi, ihi)) + bit_count(xor(blo, ilo)) <= 6
        |ORDER BY batch_id, index_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val index = Multimodal.imageBlockHash(
        Multimodal.syntheticNearDupImages(t(s, dir, "documents")))
      Multimodal.incrementalImageNearDups(index,
          Multimodal.syntheticBatchImages(t(s, dir, "documents")))
        .orderBy("batch_id", "index_id")
    },

    // REAL nearest-neighbor pixel resize (Multimodal.resizePixels) over
    // decoded PNGs: integer aspect-fit geometry (w*maxDim/max(w,h),
    // floored, upscale suppressed) + integer NN source mapping
    // (src_x = x*out->in floor). The oracle replays geometry, sampling,
    // AND the pixel formula; the position-weighted sum catches any
    // row-order or channel slip in the resampled buffer. Images already
    // inside the box pass through unscaled (out == in), so both branches
    // sit on the gated path.
    Q("q_multimodal_resize_pixels",
      """WITH p AS (SELECT doc_id AS id, CAST(doc_id % 13 + 4 AS INT) AS w,
        |                  CAST(doc_id % 11 + 4 AS INT) AS h,
        |                  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS ch
        |           FROM documents),
        |g AS (SELECT id, w, h, ch, greatest(w, h) AS m FROM p),
        |o AS (SELECT id, w, h, ch,
        |             CASE WHEN m <= 8 THEN w
        |                  ELSE greatest(1, w * 8 // m) END AS ow,
        |             CASE WHEN m <= 8 THEN h
        |                  ELSE greatest(1, h * 8 // m) END AS oh
        |      FROM g),
        |px AS (SELECT id, w, h, ch, ow, oh,
        |              unnest(range(0, ow * oh * ch)) AS k
        |       FROM o),
        |v AS (SELECT id, w, h, ch, ow, oh, k,
        |             ((((k // ch) // ow) * h // oh) * w
        |              + ((k // ch) % ow) * w // ow) * ch
        |             + k % ch AS ki
        |      FROM px)
        |SELECT id AS media_id, w AS in_w, h AS in_h,
        |       CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
        |       ch AS channels,
        |       CAST(count(*) AS BIGINT) AS n_px,
        |       CAST(sum((id * 31 + ki * 7 + 13) % 251) AS BIGINT)
        |         AS px_sum,
        |       CAST(sum((k + 1) * ((id * 31 + ki * 7 + 13) % 251))
        |            AS BIGINT) AS px_wsum
        |FROM v GROUP BY 1, 2, 3, 4, 5, 6
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.resizePixels(
          Multimodal.syntheticPixelImages(t(s, dir, "documents")), 8)
        .orderBy("media_id")
    },

    // Windowed PCM audio features (Multimodal.audioFrameFeatures) over
    // real decoded RIFF bytes: 16-sample windows, energy proxy (sum of
    // squares), amplitude extremes, zero-crossing count — the cheap
    // silence/clipping filters of a speech pipeline. All-integer; the
    // oracle regenerates the samples and replays the window arithmetic
    // with a lag() for the crossings.
    Q("q_multimodal_audio_frames",
      """WITH p AS (SELECT doc_id AS id,
        |                  CAST(doc_id % 200 + 32 AS BIGINT) AS n
        |           FROM documents),
        |s AS (SELECT id, unnest(range(0, n)) AS k FROM p),
        |v AS (SELECT id, k,
        |             CAST((id * 7 + k * 13) % 65536 - 32768 AS BIGINT) AS s
        |      FROM s),
        |w AS (SELECT id, k, s, CAST(k // 16 AS INT) AS frame_idx,
        |             lag(s) OVER (PARTITION BY id ORDER BY k) AS prev
        |      FROM v)
        |SELECT id AS media_id, frame_idx,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(s) AS BIGINT) AS s_sum,
        |       CAST(sum(s * s) AS BIGINT) AS sq_sum,
        |       CAST(min(s) AS BIGINT) AS s_min,
        |       CAST(max(s) AS BIGINT) AS s_max,
        |       CAST(sum(CASE WHEN k % 16 > 0 AND
        |                          ((prev < 0 AND s >= 0) OR
        |                           (prev >= 0 AND s < 0))
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS zc
        |FROM w GROUP BY 1, 2 ORDER BY media_id, frame_idx""".stripMargin) {
      (s, dir) =>
        import graft.multimodal.Multimodal
        Multimodal.audioFrameFeatures(
            Multimodal.syntheticMonoPcm(t(s, dir, "documents")))
          .orderBy("media_id", "frame_idx")
    },

    // Content-based keyframe detection (Multimodal.gifKeyframes) over
    // REAL all-frame LZW decode: frames pair into scenes (identical
    // within, every pixel shifted across — knife-edge free), and a
    // frame is a keyframe when its index-delta sum against the previous
    // frame is nonzero. The oracle replays the per-frame index formulas
    // and their absolute differences; Spark must decompress every
    // frame's actual code stream to earn the same sums. This is the
    // content-aware upgrade of the uniform-k sampling policy.
    Q("q_multimodal_keyframes",
      """WITH p AS (SELECT doc_id AS id, CAST(doc_id % 9 + 4 AS INT) AS w,
        |                  CAST(doc_id % 7 + 4 AS INT) AS h,
        |                  CAST(1 << CAST(doc_id % 3 + 2 AS INT) AS INT)
        |                    AS nc,
        |                  CAST(doc_id % 4 + 2 AS INT) AS nf
        |           FROM documents),
        |f AS (SELECT id, w, h, nc, unnest(range(0, nf)) AS fi FROM p),
        |px AS (SELECT id, nc, fi, unnest(range(0, w * h)) AS k FROM f),
        |v AS (SELECT id, fi, k,
        |             (id * 17 + k * 23 + (fi // 2) * 37 + 5) % nc AS cur,
        |             CASE WHEN fi = 0 THEN NULL
        |                  ELSE (id * 17 + k * 23 + ((fi - 1) // 2) * 37
        |                        + 5) % nc END AS prev
        |      FROM px)
        |SELECT id AS media_id, CAST(fi AS INT) AS frame_idx,
        |       CAST(count(*) AS BIGINT) AS n_px,
        |       CAST(sum(abs(cur - prev)) AS BIGINT) AS delta_sum,
        |       (fi = 0 OR sum(abs(cur - prev)) > 0) AS is_key
        |FROM v GROUP BY id, fi
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.gifKeyframes(
          Multimodal.syntheticAnimatedPixels(t(s, dir, "documents")))
        .orderBy("media_id", "frame_idx")
    },

    // PNG tEXt metadata extraction (Multimodal.extractImageMetadata):
    // the fixture splices REAL tEXt chunks (keyword NUL Latin-1 value,
    // CRC'd) into real PNGs — provenance on every image, a planted PII
    // contact on every 11th — and the Spark side must walk the actual
    // chunk stream back. The oracle knows only the string formulas.
    Q("q_multimodal_text_meta",
      """WITH k AS (SELECT doc_id AS id FROM documents),
        |t AS (SELECT id, 'source' AS meta_key,
        |             'crawl-' || CAST(id % 7 AS VARCHAR) AS meta_value
        |      FROM k
        |      UNION ALL
        |      SELECT id, 'license',
        |             (['cc0', 'cc-by', 'proprietary'])
        |               [CAST(id % 3 + 1 AS INT)]
        |      FROM k
        |      UNION ALL
        |      SELECT id, 'contact',
        |             'user' || CAST(id AS VARCHAR) || '@mail.example'
        |      FROM k WHERE id % 11 = 0)
        |SELECT id AS media_id, meta_key, meta_value
        |FROM t ORDER BY media_id, meta_key""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.extractImageMetadata(
          Multimodal.syntheticAnnotatedImages(t(s, dir, "documents")))
        .orderBy("media_id", "meta_key")
    },

    // Privacy metadata strip (Multimodal.stripImageMetadata): ancillary
    // chunks dropped, image content kept byte-identical — gated by
    // re-extracting (must find ZERO entries) AND re-decoding pixels
    // (must still match the formula exactly). A strip that touched one
    // IDAT byte or left one tEXt chunk behind fails the hash.
    Q("q_multimodal_meta_strip",
      """WITH p AS (SELECT doc_id AS id FROM documents),
        |px AS (SELECT id, unnest(range(0, 16)) AS k FROM p)
        |SELECT id AS media_id, CAST(0 AS BIGINT) AS n_meta,
        |       CAST(sum((id * 13 + k * 11 + 7) % 251) AS BIGINT) AS px_sum
        |FROM px GROUP BY id ORDER BY media_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val stripped = Multimodal.stripImageMetadata(
        Multimodal.syntheticAnnotatedImages(t(s, dir, "documents")))
      val leftover = Multimodal.extractImageMetadata(stripped)
        .where(col("meta_key").isNotNull)
        .groupBy("media_id").agg(count(lit(1)).as("n_meta"))
      Multimodal.decodePixelStats(stripped)
        .select(col("media_id"), col("px_sum"))
        .join(leftover, Seq("media_id"), "left")
        .select(col("media_id"),
          coalesce(col("n_meta"), lit(0L)).as("n_meta"), col("px_sum"))
        .orderBy("media_id")
    },

    // Silence segmentation (Multimodal.silenceSegments) over real
    // decoded PCM with PLANTED silence blocks: windows 2-3 of every
    // 7-window cycle are near-silent, the rest loud by >=30x margin.
    // Spark does the gaps-and-islands merge inside one scan-local
    // flatMap (no shuffle); the oracle pays the SQL way — energy
    // windows, silent filter, f - row_number() islands — and must land
    // on identical segments.
    Q("q_multimodal_silence",
      """WITH p AS (SELECT doc_id AS id,
        |                  CAST(doc_id % 200 + 48 AS BIGINT) AS n
        |           FROM documents),
        |s AS (SELECT id, unnest(range(0, n)) AS k FROM p),
        |v AS (SELECT id, k,
        |             CAST(CASE WHEN (k // 16) % 7 IN (2, 3)
        |                       THEN (id + k) % 5 - 2
        |                       ELSE (id * 7 + k * 13) % 65536 - 32768
        |                  END AS BIGINT) AS s
        |      FROM s),
        |w AS (SELECT id, CAST(k // 16 AS INT) AS f, sum(s * s) AS sq,
        |             count(*) AS cnt
        |      FROM v GROUP BY 1, 2),
        |sil AS (SELECT id, f FROM w WHERE sq < 100 * cnt),
        |isl AS (SELECT id, f,
        |               f - row_number() OVER (PARTITION BY id ORDER BY f)
        |                 AS g
        |        FROM sil)
        |SELECT id AS media_id, CAST(min(f) AS INT) AS start_frame,
        |       CAST(max(f) AS INT) AS end_frame,
        |       CAST(count(*) AS BIGINT) AS n_frames
        |FROM isl GROUP BY id, g
        |ORDER BY media_id, start_frame""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.silenceSegments(
          Multimodal.syntheticSpeechPcm(t(s, dir, "documents")))
        .orderBy("media_id", "start_frame")
    },

    // Audio near-dup pairs by banded acoustic fingerprint
    // (Multimodal.audioFingerprint + audioNearDups): real RIFF decode,
    // 33 equal-occupancy windows, Haitsma–Kalker sign-of-mean-square-
    // delta bits (cross-multiplied) packed to 32, four 8-bit bands gate
    // candidates through an
    // equi-join (never all-pairs), full Hamming <= 4 confirms. The
    // fixture plants id%5==4 re-records of the previous id's signal
    // (every 97th sample nudged); the oracle replays the sample formula
    // AND the same banding semantics, so both sides miss identically.
    Q("q_audio_neardup",
      """WITH p AS (SELECT doc_id AS id,
        |                  CASE WHEN doc_id % 5 = 4 THEN doc_id - 1
        |                       ELSE doc_id END AS b
        |           FROM documents),
        |d AS (SELECT id, b, CAST(b % 200 + 64 AS BIGINT) AS n FROM p),
        |s AS (SELECT id, b, n, unnest(range(0, n)) AS k FROM d),
        |v AS (SELECT id, n, k,
        |             CAST((b * 31 + (b % 127 + 13) * k * k + k * 7919
        |                   + CASE WHEN id % 5 = 4 AND k % 97 = 0
        |                          THEN 3 ELSE 0 END) % 65536 - 32768
        |                  AS BIGINT) AS s
        |      FROM s),
        |w AS (SELECT id, CAST(k * 33 // n AS INT) AS f, sum(s * s) AS e,
        |             count(*) AS c
        |      FROM v GROUP BY 1, 2),
        |bits AS (SELECT a.id, a.f AS bit,
        |                CASE WHEN b.e * a.c > a.e * b.c THEN 1 ELSE 0 END
        |                  AS bv
        |         FROM w a JOIN w b ON a.id = b.id AND b.f = a.f + 1
        |         WHERE a.f < 32),
        |fp AS (SELECT id,
        |              CAST(coalesce(sum(bv * (CAST(1 AS BIGINT) << bit)),
        |                            0) AS BIGINT) AS fp
        |       FROM bits GROUP BY 1),
        |bands AS (SELECT id, fp, j AS band,
        |                 (fp // (CAST(1 AS BIGINT) << (8 * j))) % 256
        |                   AS bv
        |          FROM fp, range(0, 4) AS r(j)),
        |cand AS (SELECT DISTINCT a.id AS id1, b.id AS id2,
        |                a.fp AS fp1, b.fp AS fp2
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
        |SELECT id1, id2,
        |       CAST(bit_count(xor(fp1, fp2)) AS INT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(fp1, fp2)) <= 4
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.audioNearDups(
          Multimodal.audioFingerprint(
            Multimodal.syntheticNearDupPcm(t(s, dir, "documents"))))
        .orderBy("id1", "id2")
    },

    // WAV LIST/INFO tag extraction (Multimodal.extractAudioMetadata):
    // the fixture splices REAL INFO sub-chunks (fourCC, NUL-terminated
    // Latin-1, word-aligned, RIFF size re-patched) into real PCM WAVs —
    // recorder provenance on every clip, a planted PII contact on every
    // 11th — and Spark must walk the actual chunk stream back. The
    // oracle knows only the string formulas. Audio twin of
    // q_multimodal_text_meta.
    Q("q_audio_meta",
      """WITH k AS (SELECT doc_id AS id FROM documents),
        |t AS (SELECT id, 'IART' AS meta_key,
        |             'crawler-' || CAST(id % 7 AS VARCHAR) AS meta_value
        |      FROM k
        |      UNION ALL
        |      SELECT id, 'INAM', 'clip-' || CAST(id % 5 AS VARCHAR)
        |      FROM k
        |      UNION ALL
        |      SELECT id, 'ICMT',
        |             'user' || CAST(id AS VARCHAR) || '@mail.example'
        |      FROM k WHERE id % 11 = 0)
        |SELECT id AS media_id, meta_key, meta_value
        |FROM t ORDER BY media_id, meta_key""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.extractAudioMetadata(
          Multimodal.syntheticAnnotatedWavs(t(s, dir, "documents")))
        .orderBy("media_id", "meta_key")
    },

    // Audio privacy strip (Multimodal.stripAudioMetadata): ancillary
    // RIFF chunks dropped, PCM content kept byte-identical — gated by
    // re-extracting (must find ZERO entries) AND re-decoding samples
    // (sum + position-weighted sum must still match the formula, so a
    // strip that touched one data byte or reordered samples fails).
    Q("q_audio_meta_strip",
      """WITH p AS (SELECT doc_id AS id,
        |                  CAST(doc_id % 50 + 16 AS BIGINT) AS n
        |           FROM documents),
        |s AS (SELECT id, unnest(range(0, n)) AS k FROM p)
        |SELECT id AS media_id, CAST(0 AS BIGINT) AS n_meta,
        |       CAST(sum((id * 13 + k * 11 + 7) % 251 - 125) AS BIGINT)
        |         AS s_sum,
        |       CAST(sum((k + 1) * ((id * 13 + k * 11 + 7) % 251 - 125))
        |            AS BIGINT) AS s_wsum
        |FROM s GROUP BY id ORDER BY media_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val stripped = Multimodal.stripAudioMetadata(
        Multimodal.syntheticAnnotatedWavs(t(s, dir, "documents")))
      val leftover = Multimodal.extractAudioMetadata(stripped)
        .where(col("meta_key").isNotNull)
        .groupBy("media_id").agg(count(lit(1)).as("n_meta"))
      Multimodal.decodePcmStats(stripped)
        .select(col("media_id"), col("s_sum"), col("s_wsum"))
        .join(leftover, Seq("media_id"), "left")
        .select(col("media_id"),
          coalesce(col("n_meta"), lit(0L)).as("n_meta"),
          col("s_sum"), col("s_wsum"))
        .orderBy("media_id")
    },

    // Incremental audio near-dup (Multimodal.incrementalAudioNearDups):
    // a new recording batch (id%10==0 re-records, +5 every 89th sample)
    // lands against the STANDING fingerprint index — only the batch
    // decodes, only band-colliding buckets are touched. The oracle
    // replays both fixture formulas through the shared window/fingerprint
    // arithmetic and the same band-join semantics, sides tagged in one
    // union. Audio twin of q_image_neardup_inc.
    Q("q_audio_neardup_inc",
      """WITH u AS (
        |  SELECT 0 AS side, doc_id AS mid,
        |         CASE WHEN doc_id % 5 = 4 THEN doc_id - 1
        |              ELSE doc_id END AS b,
        |         doc_id AS oid
        |  FROM documents
        |  UNION ALL
        |  SELECT 1, doc_id + 1000000, doc_id, doc_id
        |  FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT side, mid, b, oid,
        |             CAST(b % 200 + 64 AS BIGINT) AS n
        |      FROM u),
        |s AS (SELECT side, mid, b, oid, n, unnest(range(0, n)) AS k
        |      FROM d),
        |v AS (SELECT side, mid, n, k,
        |             CAST((b * 31 + (b % 127 + 13) * k * k + k * 7919
        |                   + CASE WHEN side = 0 AND oid % 5 = 4
        |                               AND k % 97 = 0 THEN 3
        |                          WHEN side = 1 AND k % 89 = 0 THEN 5
        |                          ELSE 0 END) % 65536 - 32768
        |                  AS BIGINT) AS s
        |      FROM s),
        |w AS (SELECT side, mid, CAST(k * 33 // n AS INT) AS f,
        |             sum(s * s) AS e, count(*) AS c
        |      FROM v GROUP BY 1, 2, 3),
        |bits AS (SELECT a.side, a.mid, a.f AS bit,
        |                CASE WHEN b.e * a.c > a.e * b.c THEN 1 ELSE 0 END
        |                  AS bv
        |         FROM w a JOIN w b
        |           ON a.side = b.side AND a.mid = b.mid
        |              AND b.f = a.f + 1
        |         WHERE a.f < 32),
        |fp AS (SELECT side, mid,
        |              CAST(coalesce(sum(bv * (CAST(1 AS BIGINT) << bit)),
        |                            0) AS BIGINT) AS fp
        |       FROM bits GROUP BY 1, 2),
        |bands AS (SELECT side, mid, fp, j AS band,
        |                 (fp // (CAST(1 AS BIGINT) << (8 * j))) % 256
        |                   AS bv2
        |          FROM fp, range(0, 4) AS r(j)),
        |cand AS (SELECT DISTINCT bb.mid AS batch_id, aa.mid AS index_id,
        |                bb.fp AS bfp, aa.fp AS ifp
        |         FROM bands aa JOIN bands bb
        |           ON aa.band = bb.band AND aa.bv2 = bb.bv2
        |         WHERE aa.side = 0 AND bb.side = 1)
        |SELECT batch_id, index_id,
        |       CAST(bit_count(xor(bfp, ifp)) AS INT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(bfp, ifp)) <= 4
        |ORDER BY batch_id, index_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val index = Multimodal.audioFingerprint(
        Multimodal.syntheticNearDupPcm(t(s, dir, "documents")))
      Multimodal.incrementalAudioNearDups(index,
          Multimodal.audioFingerprint(
            Multimodal.syntheticBatchPcm(t(s, dir, "documents"))))
        .orderBy("batch_id", "index_id")
    },

    // Video near-dup by shared-scene containment
    // (Multimodal.gifFrameContentHashes + videoNearDups): every frame
    // of every GIF is REALLY LZW-decoded, still scenes collapse to one
    // content hash, and videos pair through an inverted-index join on
    // those hashes (never all-pairs) with an integer containment gate.
    // The fixture plants id%7==6 re-cuts of the previous id's animation
    // (first scene nudged, later scenes byte-shared); the oracle replays
    // the frame formulas INCLUDING the md5-over-index-string hashing,
    // so one slipped pixel in any decoded frame fails the hash.
    Q("q_video_neardup",
      """WITH p AS (SELECT doc_id AS id,
        |                  CASE WHEN doc_id % 7 = 6 THEN doc_id - 1
        |                       ELSE doc_id END AS b
        |           FROM documents),
        |g AS (SELECT id, b, CAST(b % 9 + 4 AS INT) AS w,
        |             CAST(b % 7 + 4 AS INT) AS h,
        |             CAST(1 << CAST(b % 3 + 2 AS INT) AS INT) AS nc,
        |             CAST(b % 6 + 4 AS INT) AS nf
        |      FROM p),
        |f AS (SELECT id, b, w, h, nc, unnest(range(0, nf)) AS fi FROM g),
        |px AS (SELECT id, b, nc, fi, fi // 2 AS sc,
        |              unnest(range(0, w * h)) AS k
        |       FROM f),
        |v AS (SELECT id, fi, k,
        |             CASE WHEN id % 7 = 6 AND fi // 2 = 0 AND k = 0
        |                  THEN ((b * 17 + k * 23 + sc * 37 + 5) % nc + 1)
        |                       % nc
        |                  ELSE (b * 17 + k * 23 + sc * 37 + 5) % nc
        |             END AS val
        |      FROM px),
        |fr AS (SELECT id, fi,
        |              md5(string_agg(CAST(val AS VARCHAR), ','
        |                             ORDER BY k)) AS fh
        |       FROM v GROUP BY id, fi),
        |dh AS (SELECT DISTINCT id, fh FROM fr),
        |cnt AS (SELECT id, count(*) AS n FROM dh GROUP BY id),
        |m AS (SELECT a.id AS id1, b.id AS id2, count(*) AS matched
        |      FROM dh a JOIN dh b ON a.fh = b.fh AND a.id < b.id
        |      GROUP BY 1, 2)
        |SELECT id1, id2, CAST(matched AS BIGINT) AS matched,
        |       CAST(c1.n AS BIGINT) AS n1, CAST(c2.n AS BIGINT) AS n2
        |FROM m JOIN cnt c1 ON m.id1 = c1.id JOIN cnt c2 ON m.id2 = c2.id
        |WHERE matched * 100 >= 60 * least(c1.n, c2.n)
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.videoNearDups(
          Multimodal.gifFrameContentHashes(
            Multimodal.syntheticNearDupAnimations(t(s, dir, "documents"))))
        .orderBy("id1", "id2")
    },

    // MEDIA CURATION CAPSTONE: the full image-dedup decision chain in
    // one gate — real PNG decode → perceptual block hash → banded
    // near-dup pairs → connected components → keep-canonical policy
    // (cluster minimum survives, singletons keep themselves). The
    // oracle replays every stage: the pixel/grid arithmetic, the SAME
    // banding semantics, and a recursive-CTE closure over the surviving
    // pairs. The integration twin of q_entity_resolution, on media.
    Q("q_media_curation",
      """WITH RECURSIVE
        |p AS (SELECT doc_id AS id,
        |             CASE WHEN doc_id % 5 = 4 THEN doc_id - 1
        |                  ELSE doc_id END AS b
        |      FROM documents),
        |d AS (SELECT id, b, CAST(b % 13 + 8 AS INT) AS w,
        |             CAST(b % 11 + 8 AS INT) AS h
        |      FROM p),
        |px AS (SELECT id, b, w, h, unnest(range(0, w * h)) AS k FROM d),
        |v AS (SELECT id, w, h, k,
        |             CASE WHEN id % 5 = 4 AND k % 97 = 0
        |                  THEN ((b * 31 + k * (7 + b % 7) + 13) % 251
        |                        + 1) % 251
        |                  ELSE (b * 31 + k * (7 + b % 7) + 13) % 251
        |             END AS val
        |      FROM px),
        |blk AS (SELECT id,
        |               ((k // w) * 8 // h) * 8 + (k % w) * 8 // w AS blk,
        |               val
        |        FROM v),
        |bsum AS (SELECT id, blk, sum(val) AS bs, count(*) AS bn
        |         FROM blk GROUP BY 1, 2),
        |tot AS (SELECT id, sum(val) AS ts, count(*) AS tn
        |        FROM blk GROUP BY 1),
        |bits AS (SELECT s.id, s.blk,
        |                CASE WHEN s.bs * t.tn > t.ts * s.bn THEN 1
        |                     ELSE 0 END AS bit
        |         FROM bsum s JOIN tot t USING (id)),
        |hs AS (SELECT t.id,
        |              CAST(coalesce(sum(CASE WHEN x.blk >= 32
        |                    THEN x.bit * (CAST(1 AS BIGINT) << (x.blk - 32))
        |                    ELSE 0 END), 0) AS BIGINT) AS hi,
        |              CAST(coalesce(sum(CASE WHEN x.blk < 32
        |                    THEN x.bit * (CAST(1 AS BIGINT) << x.blk)
        |                    ELSE 0 END), 0) AS BIGINT) AS lo
        |       FROM tot t JOIN bits x ON t.id = x.id GROUP BY 1),
        |bands AS (SELECT id, hi, lo, j AS band,
        |                 CASE j WHEN 0 THEN lo % 65536
        |                        WHEN 1 THEN (lo // 65536) % 65536
        |                        WHEN 2 THEN hi % 65536
        |                        ELSE (hi // 65536) % 65536 END AS bv
        |          FROM hs, range(0, 4) AS r(j)),
        |prs AS (SELECT DISTINCT a.id AS id1, b.id AS id2
        |        FROM bands a JOIN bands b
        |          ON a.band = b.band AND a.bv = b.bv AND a.id < b.id
        |        WHERE bit_count(xor(a.hi, b.hi))
        |              + bit_count(xor(a.lo, b.lo)) <= 6),
        |nodes AS (SELECT id1 AS id FROM prs UNION SELECT id2 FROM prs),
        |sym AS (SELECT id1 AS a, id2 AS b FROM prs
        |        UNION SELECT id2, id1 FROM prs),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id),
        |lbl AS (SELECT id, min(r) AS canonical FROM reach GROUP BY id)
        |SELECT p.id AS media_id,
        |       CAST(coalesce(l.canonical, p.id) AS BIGINT) AS canonical,
        |       (coalesce(l.canonical, p.id) = p.id) AS keep
        |FROM p LEFT JOIN lbl l ON p.id = l.id
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val docs = t(s, dir, "documents")
      val pairs = Multimodal.imageNearDups(
        Multimodal.imageBlockHash(Multimodal.syntheticNearDupImages(docs)))
      val labels = graft.operators.ConnectedComponents.canonicalize(pairs)
      docs.select(col("doc_id").as("media_id"))
        .join(labels.select(col("id").as("media_id"), col("canonical")),
          Seq("media_id"), "left")
        .select(col("media_id"),
          coalesce(col("canonical"), col("media_id")).as("canonical"),
          (coalesce(col("canonical"), col("media_id")) === col("media_id"))
            .as("keep"))
        .orderBy("media_id")
    },

    // Uniform-k frame sampling over the real GIF container walk
    // (Multimodal.sampleGifFramesUniform): keep frames floor(j*n/4),
    // j < 4, deduplicated — the budgeted sampling policy of a video
    // pipeline. The oracle knows only the frame-count and geometry
    // formulas; byte offsets (decoder seek targets) are pinned
    // separately in MultimodalSpec because SQL can't walk bytes.
    // CROSS-LAYOUT container convergence: the same video carried as a
    // flat MP4 (stsc×stco×stsz) and as a FRAGMENTED MP4 (moof/tfhd/
    // trun, the CMAF/DASH shape) must yield the identical distinct
    // scene-hash set — two different sample-table walks converging on
    // the same bytes. The oracle derives the hash set ONCE from the
    // content formulas and demands it from both columns.
    Q("q_video_mp4_frag_hash",
      """WITH p AS (SELECT doc_id AS id,
        |                  CASE WHEN doc_id % 7 = 6 THEN doc_id - 1
        |                       ELSE doc_id END AS b
        |           FROM documents),
        |g AS (SELECT id, b, CAST(b % 6 + 4 AS INT) AS nf,
        |             CAST(b % 10 + 6 AS INT) AS len
        |      FROM p),
        |f AS (SELECT id, b, len, unnest(range(0, nf)) AS j FROM g),
        |vals AS (SELECT id, b, j, j // 2 AS sc,
        |                unnest(range(0, len)) AS k
        |         FROM f),
        |v AS (SELECT id, j, k,
        |             CASE WHEN id % 7 = 6 AND j // 2 = 0 AND k = 0
        |                  THEN ((b * 19 + k * 29 + sc * 43 + 11) % 256
        |                        + 1) % 256
        |                  ELSE (b * 19 + k * 29 + sc * 43 + 11) % 256
        |             END AS val
        |      FROM vals),
        |fr AS (SELECT id, j,
        |              md5(string_agg(CAST(val AS VARCHAR), ','
        |                             ORDER BY k)) AS fh
        |       FROM v GROUP BY id, j),
        |dh AS (SELECT DISTINCT id, fh FROM fr),
        |agg AS (SELECT id, CAST(count(*) AS BIGINT) AS n_scenes,
        |               string_agg(fh, ',' ORDER BY fh) AS hashes
        |        FROM dh GROUP BY id)
        |SELECT id AS media_id, n_scenes,
        |       hashes AS flat_hashes, hashes AS frag_hashes
        |FROM agg ORDER BY media_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val docs = t(s, dir, "documents")
      def hashSet(hashes: org.apache.spark.sql.DataFrame, out: String) =
        hashes.groupBy("media_id")
          .agg(count(lit(1)).as(s"__n_$out"),
            array_join(array_sort(collect_list(col("frame_hash"))), ",")
              .as(out))
      val flat = hashSet(Multimodal.mp4SampleContentHashes(
        Multimodal.syntheticNearDupMp4s(docs)), "flat_hashes")
      val frag = hashSet(Multimodal.mp4SampleContentHashes(
        Multimodal.syntheticFragmentedMp4s(docs)), "frag_hashes")
      flat.join(frag, "media_id")
        .select(col("media_id"), col("__n_flat_hashes").as("n_scenes"),
          col("flat_hashes"), col("frag_hashes"))
        .orderBy("media_id")
    },

    // Uniform-k sampling over the real MP4 sample table (Multimodal
    // .sampleMp4FramesUniform): the budgeted frame-decode policy for
    // video containers — keep distinct floor(j*n/4) samples with true
    // byte geometry from the stsc×stco×stsz walk. The oracle replays
    // the selection AND each selected sample's SIZE (the fixture's
    // content-string length — sum of the decimal widths of the formula
    // values plus separators); byte offsets are decoder seek targets
    // pinned in spec because SQL cannot walk the box tree.
    Q("q_video_mp4_frame_sample",
      """WITH p AS (SELECT doc_id AS id,
        |                  CASE WHEN doc_id % 7 = 6 THEN doc_id - 1
        |                       ELSE doc_id END AS b
        |           FROM documents),
        |g AS (SELECT id, b, CAST(b % 6 + 4 AS INT) AS nf,
        |             CAST(b % 10 + 6 AS INT) AS len
        |      FROM p),
        |sel AS (SELECT DISTINCT id, b, len,
        |               CAST(j * nf // 4 AS INT) AS si
        |        FROM g, range(0, 4) AS r(j)),
        |vals AS (SELECT id, b, si, si // 2 AS sc, len,
        |                unnest(range(0, len)) AS k
        |         FROM sel),
        |v AS (SELECT id, si, k,
        |             CASE WHEN id % 7 = 6 AND si // 2 = 0 AND k = 0
        |                  THEN ((b * 19 + k * 29 + sc * 43 + 11) % 256
        |                        + 1) % 256
        |                  ELSE (b * 19 + k * 29 + sc * 43 + 11) % 256
        |             END AS val
        |      FROM vals)
        |SELECT id AS media_id, si AS sample_idx,
        |       CAST(sum(length(CAST(val AS VARCHAR))) + count(*) - 1
        |            AS BIGINT) AS size
        |FROM v GROUP BY id, si
        |ORDER BY media_id, sample_idx""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.sampleMp4FramesUniform(
          Multimodal.syntheticNearDupMp4s(t(s, dir, "documents")))
        .select(col("media_id"), col("sample_idx"), col("size"))
        .orderBy("media_id", "sample_idx")
    },

    // FORMAT-BLIND perceptual hashing: the SAME image carried as PNG
    // and as baseline JPEG must land on the SAME 64-bit block hash —
    // two completely different real decoders (zlib/filters vs Huffman/
    // IDCT) converging on identical pixels. The oracle computes the
    // hash ONCE from the block formulas and demands it from both
    // columns; a one-bit divergence in either decoder fails the row.
    Q("q_image_crossformat_hash",
      """WITH d AS (SELECT doc_id AS b,
        |                  CAST(8 * (doc_id % 3 + 2) AS INT) AS w,
        |                  CAST(8 * (doc_id % 2 + 2) AS INT) AS h
        |           FROM documents),
        |px AS (SELECT b, w, h, unnest(range(0, w * h)) AS k FROM d),
        |v AS (SELECT b, w, h, k,
        |             (b * 7 + ((k // w // 8) * (w // 8) + (k % w) // 8)
        |              * 13 + 37) % 256 AS val
        |      FROM px),
        |blk AS (SELECT b, ((k // w) * 8 // h) * 8 + (k % w) * 8 // w
        |                 AS blk, val
        |        FROM v),
        |bsum AS (SELECT b, blk, sum(val) AS bs, count(*) AS bn
        |         FROM blk GROUP BY 1, 2),
        |tot AS (SELECT b, max(w) AS w, max(h) AS h, sum(val) AS ts,
        |               count(*) AS tn
        |        FROM v GROUP BY 1),
        |bits AS (SELECT s.b, s.blk,
        |                CASE WHEN s.bs * t.tn > t.ts * s.bn THEN 1
        |                     ELSE 0 END AS bit
        |         FROM bsum s JOIN tot t USING (b)),
        |hs AS (SELECT t.b, max(t.w) AS width, max(t.h) AS height,
        |              CAST(coalesce(sum(CASE WHEN x.blk >= 32
        |                    THEN x.bit * (CAST(1 AS BIGINT) << (x.blk - 32))
        |                    ELSE 0 END), 0) AS BIGINT) AS hi,
        |              CAST(coalesce(sum(CASE WHEN x.blk < 32
        |                    THEN x.bit * (CAST(1 AS BIGINT) << x.blk)
        |                    ELSE 0 END), 0) AS BIGINT) AS lo
        |       FROM tot t JOIN bits x ON t.b = x.b GROUP BY t.b)
        |SELECT b AS media_id, width, height,
        |       hi AS png_hi, lo AS png_lo, hi AS jpg_hi, lo AS jpg_lo
        |FROM hs ORDER BY media_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val hs = Multimodal.imageBlockHash(
        Multimodal.syntheticCrossFormatImages(t(s, dir, "documents")))
      val png = hs.where(col("media_id") < 1000000L)
        .select(col("media_id"), col("width"), col("height"),
          col("hash_hi").as("png_hi"), col("hash_lo").as("png_lo"))
      val jpg = hs.where(col("media_id") >= 1000000L)
        .select((col("media_id") - 1000000L).as("media_id"),
          col("hash_hi").as("jpg_hi"), col("hash_lo").as("jpg_lo"))
      png.join(jpg, "media_id")
        .select("media_id", "width", "height", "png_hi", "png_lo",
          "jpg_hi", "jpg_lo")
        .orderBy("media_id")
    },

    // CROSS-CONTAINER audio dedup: the same recording delivered as a
    // WAV file and as PCM riding an MP4 sound track (real stsc×stco×
    // stsz walk, 64-byte samples) must fingerprint identically — the
    // batch-vs-standing-index join pairs every MP4 clip with its WAV
    // original at hamming 0, plus the planted re-record cross matches.
    // The oracle computes the fingerprint ONCE per recording and
    // replays the banded incremental join.
    Q("q_audio_mp4_crossdup",
      """WITH p AS (SELECT doc_id AS id,
        |                  CASE WHEN doc_id % 5 = 4 THEN doc_id - 1
        |                       ELSE doc_id END AS b
        |           FROM documents),
        |d AS (SELECT id, b, CAST(b % 200 + 64 AS BIGINT) AS n FROM p),
        |s AS (SELECT id, b, n, unnest(range(0, n)) AS k FROM d),
        |v AS (SELECT id, n, k,
        |             CAST((b * 31 + (b % 127 + 13) * k * k + k * 7919
        |                   + CASE WHEN id % 5 = 4 AND k % 97 = 0
        |                          THEN 3 ELSE 0 END) % 65536 - 32768
        |                  AS BIGINT) AS s
        |      FROM s),
        |w AS (SELECT id, CAST(k * 33 // n AS INT) AS f, sum(s * s) AS e,
        |             count(*) AS c
        |      FROM v GROUP BY 1, 2),
        |bits AS (SELECT a.id, a.f AS bit,
        |                CASE WHEN b.e * a.c > a.e * b.c THEN 1 ELSE 0 END
        |                  AS bv
        |         FROM w a JOIN w b ON a.id = b.id AND b.f = a.f + 1
        |         WHERE a.f < 32),
        |fp AS (SELECT id,
        |              CAST(coalesce(sum(bv * (CAST(1 AS BIGINT) << bit)),
        |                            0) AS BIGINT) AS fp
        |       FROM bits GROUP BY 1),
        |bands AS (SELECT id, fp, j AS band,
        |                 (fp // (CAST(1 AS BIGINT) << (8 * j))) % 256
        |                   AS bv
        |          FROM fp, range(0, 4) AS r(j)),
        |cand AS (SELECT DISTINCT bb.id + 1000000 AS batch_id,
        |                aa.id AS index_id, bb.fp AS bfp, aa.fp AS ifp
        |         FROM bands aa JOIN bands bb
        |           ON aa.band = bb.band AND aa.bv = bb.bv)
        |SELECT batch_id, index_id,
        |       CAST(bit_count(xor(bfp, ifp)) AS INT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(bfp, ifp)) <= 4
        |ORDER BY batch_id, index_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val docs = t(s, dir, "documents")
      Multimodal.incrementalAudioNearDups(
          Multimodal.audioFingerprint(
            Multimodal.syntheticNearDupPcm(docs)),
          Multimodal.mp4AudioFingerprint(
            Multimodal.syntheticPcmMp4s(docs)))
        .orderBy("batch_id", "index_id")
    },

    // Baseline JPEG pixel decode (JpegCodec.decodeJpegPixels, ITU T.81
    // sequential Huffman): fixtures are REAL entropy-coded streams —
    // marker walk, canonical Huffman tables, DC-diff decode, dequant,
    // exact IDCT — whose DC-only blocks reconstruct bit-exactly, so the
    // oracle replays the block-value formulas INCLUDING the md5 over
    // the row-major pixel string. One slipped bit anywhere in the
    // entropy decoder fails the hash on every image it touches.
    // Compressed text-column ingestion (Multimodal.gunzipText): every
    // document's text round-trips through REAL RFC 1952 gzip members —
    // deflate on the fixture side, the zip-bomb-guarded streaming
    // inflate on the decode side — and the recovered text must md5-match
    // the source column directly. The Common-Crawl-shaped path of a
    // compressed 100 TB text lake, as one scan-local mapPartitions.
    Q("q_multimodal_gzip_text",
      """SELECT doc_id AS media_id,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       md5(text) AS text_md5
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.gunzipText(
          Multimodal.gzipTexts(t(s, dir, "documents")))
        .select(col("media_id"),
          length(col("text")).cast("long").as("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("media_id")
    },

    // Mixed-codec lake decode (Multimodal.sniffDecompressText): even
    // doc_ids arrive as RFC 1952 gzip, odd as RFC 8878 zstd frames
    // (the real zstd-jni codec), with NO codec column — the decoder
    // must sniff the frame magic, dispatch, and round-trip the text
    // md5-exactly, reporting which codec it found. Codec generations
    // mix in any lake that has lived through a migration.
    Q("q_multimodal_codec_sniff",
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 2 = 0 THEN 'gzip' ELSE 'zstd' END AS codec,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       md5(text) AS text_md5
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.sniffDecompressText(
          Multimodal.compressedTexts(t(s, dir, "documents")))
        .select(col("media_id"), col("codec"),
          length(col("text")).cast("long").as("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("media_id")
    },

    // WARC crawl-shard ingestion (WarcCodec + Multimodal.warcResponses):
    // documents ride REAL ISO 28500 .warc.gz shards — ~16 records per
    // shard, one gzip member per record, warcinfo + request + response
    // per document — and the parser must skip the non-response records,
    // strip each HTTP/1.1 header block, and hand back the exact UTF-8
    // body; URI and WARC-Date are replayed from doc_id formulas and the
    // body must md5-match the source column. The first job of a real
    // crawl lake, end to end, as one scan-local flatMap. The chunked
    // generation (shard % 3 == 2) also plants two DAMAGED records per
    // shard — a malformed chunk-size line (doc % 16 == 7) and a
    // compressed entity truncated mid-stream inside intact chunk
    // framing (doc % 16 == 11) — and the oracle EXCLUDES exactly those
    // doc_ids: the decoder must drop each damaged record (None, never a
    // throw, never partial text) while every shard-mate survives.
    Q("q_multimodal_warc_records",
      """SELECT doc_id,
        |       'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
        |       '2026-01-01T00:00:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || 'Z' AS warc_date,
        |       CAST(200 AS INTEGER) AS http_status,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       md5(text) AS text_md5
        |FROM documents
        |WHERE NOT ((doc_id // 16) % 3 = 2 AND doc_id % 16 IN (7, 11))
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.warcResponses(
          Multimodal.syntheticWarcFiles(t(s, dir, "documents")))
        .select(
          regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long")
            .as("doc_id"),
          col("url"), col("warc_date"), col("http_status"),
          length(col("text")).cast("long").as("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    },

    // PROGRESSIVE JPEG decode (SOF2, three real scans: DC first at
    // Al=1, DC refinement, one spanning EOB run): the same formula
    // pixels as the sequential gate, but the decoder must walk
    // spectral selection, successive approximation and the EOB-run
    // machinery to earn them — the oracle is byte-identical to the
    // sequential gate's, so the two layouts must converge exactly.
    Q("q_multimodal_jpeg_progressive",
      """WITH d AS (SELECT doc_id AS b,
        |                  CAST(8 * (doc_id % 3 + 2) AS INT) AS w,
        |                  CAST(8 * (doc_id % 2 + 2) AS INT) AS h
        |           FROM documents),
        |px AS (SELECT b, w, h, unnest(range(0, w * h)) AS k FROM d),
        |v AS (SELECT b, w, h, k,
        |             (b * 7 + ((k // w // 8) * (w // 8) + (k % w) // 8)
        |              * 13 + 37) % 256 AS val
        |      FROM px)
        |SELECT b AS media_id, max(w) AS width, max(h) AS height,
        |       md5(string_agg(CAST(val AS VARCHAR), ',' ORDER BY k))
        |         AS px_md5
        |FROM v GROUP BY b ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.multimodal.JpegCodec
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { b =>
          val w = 8 * (b % 3 + 2).toInt
          val h = 8 * (b % 2 + 2).toInt
          val bx = w / 8
          val vals = Array.tabulate(bx * (h / 8))(k =>
            ((b * 7 + k.toLong * 13 + 37) % 256).toInt)
          (b, JpegCodec.buildJpegDcOnlyProgressive(w, h, vals))
        }
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.flatMap { case (id, bytes) =>
            JpegCodec.decodeJpegPixels(bytes).map { d =>
              val sb = new StringBuilder
              var k = 0
              while (k < d.pixels.length) {
                if (k > 0) sb.append(',')
                sb.append(d.pixels(k) & 0xff)
                k += 1
              }
              md.reset()
              val dig = md.digest(sb.toString
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              (id, d.width, d.height,
                dig.map("%02x".format(_)).mkString)
            }
          }
        }
        .toDF("media_id", "width", "height", "px_md5")
        .orderBy("media_id")
    },

    // Restart-interval (DRI/RSTn) JPEG decode through the driver hash —
    // promoted from spec-only: every fixture carries a real DRI segment
    // and RST0-7 markers every 1-3 MCUs (per-doc formula), with the
    // spec-mandated DC-predictor reset and byte alignment at each
    // marker. Restart markers exist so a CORRUPTED scan loses one
    // restart interval instead of the image — and so a decoder can split
    // one image's entropy stream across workers, the intra-file
    // parallelism lever for large scans. They must be INVISIBLE in the
    // decoded output: the oracle is the same pixel formula as
    // q_multimodal_jpeg_pixels, so a missed predictor reset or
    // misaligned resync diverges the hash immediately.
    Q("q_multimodal_jpeg_restart",
      """WITH d AS (SELECT doc_id AS b,
        |                  CAST(8 * (doc_id % 3 + 2) AS INT) AS w,
        |                  CAST(8 * (doc_id % 2 + 2) AS INT) AS h
        |           FROM documents),
        |px AS (SELECT b, w, h, unnest(range(0, w * h)) AS k FROM d),
        |v AS (SELECT b, w, h, k,
        |             (b * 7 + ((k // w // 8) * (w // 8) + (k % w) // 8)
        |              * 13 + 37) % 256 AS val
        |      FROM px)
        |SELECT b AS media_id, max(w) AS width, max(h) AS height,
        |       md5(string_agg(CAST(val AS VARCHAR), ',' ORDER BY k))
        |         AS px_md5
        |FROM v GROUP BY b ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.multimodal.JpegCodec
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { b =>
          val w = 8 * (b % 3 + 2).toInt
          val h = 8 * (b % 2 + 2).toInt
          val bx = w / 8
          val vals = Array.tabulate(bx * (h / 8))(k =>
            ((b * 7 + k.toLong * 13 + 37) % 256).toInt)
          (b, JpegCodec.buildJpegDcOnly(w, h, vals,
            restartInterval = (b % 3 + 1).toInt))
        }
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.flatMap { case (id, bytes) =>
            JpegCodec.decodeJpegPixels(bytes).map { d =>
              val sb = new StringBuilder
              var k = 0
              while (k < d.pixels.length) {
                if (k > 0) sb.append(',')
                sb.append(d.pixels(k) & 0xff)
                k += 1
              }
              md.reset()
              val dig = md.digest(sb.toString
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              (id, d.width, d.height,
                dig.map("%02x".format(_)).mkString)
            }
          }
        }
        .toDF("media_id", "width", "height", "px_md5")
        .orderBy("media_id")
    },

    // AC-REFINED progressive JPEG (the successive-approximation corner
    // the flat fixture can't reach): per doc a coefficient set with
    // history corrections, newly-significant ±1 after a >16 zero run
    // (ZRL inside refinement), EOB runs carrying buffered correction
    // bits, and a mid-stream DHT redefinition — delivered BOTH as a
    // sequential SOF0 stream and as the 3-scan SOF2 script. The gate
    // hashes (a) exact pixel convergence of the two decodes and (b)
    // agreement with the JDK's independent ImageIO decoder within 1
    // IDCT rounding step, per stream. A decoder that drops correction
    // bits, misplaces a newly-significant coefficient, or misreads an
    // EOB run diverges from the sequential twin immediately.
    Q("q_multimodal_jpeg_ac_refine",
      """SELECT doc_id AS media_id,
        |       CAST(8 * (doc_id % 3 + 2) AS INT) AS width,
        |       CAST(8 * (doc_id % 2 + 2) AS INT) AS height,
        |       TRUE AS converged, TRUE AS imageio_ok
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.multimodal.JpegCodec
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { b =>
            val w = 8 * (b % 3 + 2).toInt
            val h = 8 * (b % 2 + 2).toInt
            val blocks = Array.tabulate((w / 8) * (h / 8)) { k =>
              val c = new Array[Int](64)
              c(0) = ((b * 7 + k * 13 + 37) % 256).toInt - 128
              (k % 5) match {
                case 0 => c(1) = 5; c(2) = -3; c(20) = 1
                case 1 => ()
                case 2 => c(1) = -1; c(10) = 4
                case 3 => c(5) = 2; c(40) = -7
                case _ => c(3) = 9; c(63) = 1
              }
              c
            }
            val seq = JpegCodec.buildJpegGrayFromCoefs(w, h, blocks)
            val prog = JpegCodec.buildJpegAcRefineProgressive(w, h, blocks)
            val ds = JpegCodec.decodeJpegPixels(seq)
            val dp = JpegCodec.decodeJpegPixels(prog)
            val converged = ds.nonEmpty && dp.nonEmpty &&
              ds.get.width == w && ds.get.height == h &&
              java.util.Arrays.equals(ds.get.pixels, dp.get.pixels)
            val imageioOk = dp.nonEmpty && Seq(seq, prog).forall { bytes =>
              val ref = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              ref != null && {
                var ok = true
                var y = 0
                while (ok && y < h) {
                  var x = 0
                  while (ok && x < w) {
                    ok = math.abs((dp.get.pixels(y * w + x) & 0xff) -
                      ref.getRaster.getSample(x, y, 0)) <= 1
                    x += 1
                  }
                  y += 1
                }
                ok
              }
            }
            (b, w, h, converged, imageioOk)
          }
        }
        .toDF("media_id", "width", "height", "converged", "imageio_ok")
        .orderBy("media_id")
    },

    Q("q_multimodal_jpeg_pixels",
      """WITH d AS (SELECT doc_id AS b,
        |                  CAST(8 * (doc_id % 3 + 2) AS INT) AS w,
        |                  CAST(8 * (doc_id % 2 + 2) AS INT) AS h
        |           FROM documents),
        |px AS (SELECT b, w, h, unnest(range(0, w * h)) AS k FROM d),
        |v AS (SELECT b, w, h, k,
        |             (b * 7 + ((k // w // 8) * (w // 8) + (k % w) // 8)
        |              * 13 + 37) % 256 AS val
        |      FROM px)
        |SELECT b AS media_id, max(w) AS width, max(h) AS height,
        |       md5(string_agg(CAST(val AS VARCHAR), ',' ORDER BY k))
        |         AS px_md5
        |FROM v GROUP BY b ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.multimodal.{JpegCodec, Multimodal}
      Multimodal.syntheticDcJpegs(t(s, dir, "documents"))
        .select(col("media_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.flatMap { case (id, bytes) =>
            JpegCodec.decodeJpegPixels(bytes).map { d =>
              val sb = new StringBuilder
              var k = 0
              while (k < d.pixels.length) {
                if (k > 0) sb.append(',')
                sb.append(d.pixels(k) & 0xff)
                k += 1
              }
              md.reset()
              val dig = md.digest(sb.toString
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              (id, d.width, d.height,
                dig.map("%02x".format(_)).mkString)
            }
          }
        }
        .toDF("media_id", "width", "height", "px_md5")
        .orderBy("media_id")
    },

    // MP4/ISO-BMFF container walk (Mp4Codec.parseMp4Meta): REAL box
    // trees — ftyp brand, mvhd movie timescale/duration, per-trak
    // tkhd/mdhd/hdlr/stsz — over fixtures whose every field derives
    // from doc_id formulas, so the oracle replays the formulas while
    // Spark must earn them from the bytes. Movie duration is the MAX
    // over tracks in movie ticks (ids % 3 == 0 carry a 25 ms audio
    // track that outlasts the shortest videos — the oracle's GREATEST).
    Q("q_video_mp4_meta",
      """WITH p AS (SELECT doc_id AS id,
        |                  CASE WHEN doc_id % 7 = 6 THEN doc_id - 1
        |                       ELSE doc_id END AS b
        |           FROM documents),
        |g AS (SELECT id, b, CAST(b % 6 + 4 AS BIGINT) AS nf,
        |             CAST(b % 50 + 10 AS BIGINT) AS delta,
        |             CAST(600 * (b % 4 + 1) AS BIGINT) AS ts
        |      FROM p)
        |SELECT id AS media_id, 'isom' AS brand,
        |       CAST(1000 AS BIGINT) AS movie_ts,
        |       CAST(greatest(nf * delta * 1000 // ts,
        |                     CASE WHEN b % 3 = 0 THEN 25 ELSE 0 END)
        |            AS BIGINT) AS movie_dur,
        |       CAST(CASE WHEN b % 3 = 0 THEN 2 ELSE 1 END AS INT)
        |         AS n_tracks,
        |       CAST(b % 320 + 16 AS INT) AS width,
        |       CAST(b % 240 + 16 AS INT) AS height,
        |       ts AS v_ts, nf * delta AS v_dur, nf AS v_samples
        |FROM g ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.multimodal.{Mp4Codec, Multimodal}
      Multimodal.syntheticNearDupMp4s(t(s, dir, "documents"))
        .select(col("media_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) =>
          Mp4Codec.parseMp4Meta(bytes).flatMap { m =>
            m.tracks.find(_.handler == "vide").map { v =>
              (id, m.majorBrand, m.movieTimescale, m.movieDuration,
                m.tracks.length, v.width, v.height, v.timescale,
                v.duration, v.sampleCount)
            }
          }
        }
        .toDF("media_id", "brand", "movie_ts", "movie_dur", "n_tracks",
          "width", "height", "v_ts", "v_dur", "v_samples")
        .orderBy("media_id")
    },

    // Video near-dup over REAL MP4 sample ranges (Mp4Codec
    // .parseMp4SampleRanges + Multimodal.videoNearDups): each video
    // sample's byte range comes from the stsc×stco×stsz walk, its
    // bytes are md5'd, still scenes collapse through the distinct, and
    // videos pair through the same inverted-index containment join as
    // the GIF gate. The fixture plants id%7==6 re-cuts (first scene's
    // first value nudged, later scenes byte-shared); the oracle
    // replays the sample-content formulas INCLUDING the md5 — a
    // one-byte slip in any extracted range fails the hash.
    Q("q_video_mp4_neardup",
      """WITH p AS (SELECT doc_id AS id,
        |                  CASE WHEN doc_id % 7 = 6 THEN doc_id - 1
        |                       ELSE doc_id END AS b
        |           FROM documents),
        |g AS (SELECT id, b, CAST(b % 6 + 4 AS INT) AS nf,
        |             CAST(b % 10 + 6 AS INT) AS len
        |      FROM p),
        |f AS (SELECT id, b, len, unnest(range(0, nf)) AS j FROM g),
        |vals AS (SELECT id, b, j, j // 2 AS sc,
        |                unnest(range(0, len)) AS k
        |         FROM f),
        |v AS (SELECT id, j, k,
        |             CASE WHEN id % 7 = 6 AND j // 2 = 0 AND k = 0
        |                  THEN ((b * 19 + k * 29 + sc * 43 + 11) % 256
        |                        + 1) % 256
        |                  ELSE (b * 19 + k * 29 + sc * 43 + 11) % 256
        |             END AS val
        |      FROM vals),
        |fr AS (SELECT id, j,
        |              md5(string_agg(CAST(val AS VARCHAR), ','
        |                             ORDER BY k)) AS fh
        |       FROM v GROUP BY id, j),
        |dh AS (SELECT DISTINCT id, fh FROM fr),
        |cnt AS (SELECT id, count(*) AS n FROM dh GROUP BY id),
        |m AS (SELECT a.id AS id1, b.id AS id2, count(*) AS matched
        |      FROM dh a JOIN dh b ON a.fh = b.fh AND a.id < b.id
        |      GROUP BY 1, 2)
        |SELECT id1, id2, CAST(matched AS BIGINT) AS matched,
        |       CAST(c1.n AS BIGINT) AS n1, CAST(c2.n AS BIGINT) AS n2
        |FROM m JOIN cnt c1 ON m.id1 = c1.id JOIN cnt c2 ON m.id2 = c2.id
        |WHERE matched * 100 >= 60 * least(c1.n, c2.n)
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.videoNearDups(
          Multimodal.mp4SampleContentHashes(
            Multimodal.syntheticNearDupMp4s(t(s, dir, "documents"))))
        .orderBy("id1", "id2")
    },

    Q("q_multimodal_frame_sample",
      """WITH p AS (SELECT doc_id AS id, CAST(doc_id % 5 + 1 AS INT) AS n
        |           FROM documents),
        |sel AS (SELECT DISTINCT id, n, CAST(j * n // 4 AS INT) AS fi
        |        FROM p, range(0, 4) AS r(j))
        |SELECT id AS media_id, fi AS frame_idx,
        |       CAST((id + fi) % 3 AS INT) AS x,
        |       CAST((id + 2 * fi) % 2 AS INT) AS y,
        |       CAST((id + fi) % 13 + 1 AS INT) AS width,
        |       CAST((id + 2 * fi) % 11 + 1 AS INT) AS height,
        |       CAST((id + fi) % 50 + 2 AS INT) AS delay_cs
        |FROM sel ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      Multimodal.sampleGifFramesUniform(
          Multimodal.syntheticGifs(t(s, dir, "documents")))
        .select("media_id", "frame_idx", "x", "y", "width", "height",
          "delay_cs")
        .orderBy("media_id", "frame_idx")
    })
}
