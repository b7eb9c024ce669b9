package graft.queries

/** DuckDB replays of the two bit-sketch pipelines that were rows-only
  * through round 6 ("Murmur3 isn't available in DuckDB"). It is — the
  * same way xxhash64 was for the IVF fit (IvfReplay): fixed-width modular
  * arithmetic in HUGEINT with rotations as shift-or and 64×64-bit
  * products split at 32 bits. Both oracles were verified row-identical to
  * the Spark output at sf0.01 before being frozen here.
  *
  *   - [[simhashSql]]: Spark's Murmur3_x86_32 over token bytes (4-byte
  *     little-endian blocks, per-byte tail mixes, fmix avalanche — the
  *     hashUnsafeBytes variant, seeds 0x9747b28c / 0x85ebca6b exactly as
  *     SimHashUtil packs them), the ±1 bit vote, pigeonhole banding, and
  *     the hamming filter. Corpus ASCII makes ord(char) == byte (the
  *     rolling-hash gate already pins that equivalence per sf dir).
  *   - [[embedLshSql]]: the splitmix64-style plane generator of
  *     VectorSketchUtil (note the engine's 0x9e3779b97f4b7c15 increment —
  *     4B, not canonical splitmix's 4A; the replay mirrors the engine,
  *     constants copied from the Scala source), sign-bit signatures with
  *     LEFT-FOLD dot products, 11-band LSH, hamming ≤ 10, and the rounded
  *     cosine verify — over the same planted augmented embeddings as
  *     q_dedup_embed.
  */
private[queries] object SketchReplay {

  private val M64 = BigInt(1) << 64
  private val M32 = BigInt(1) << 32

  /** (a*b) mod 2^32 — products of 32-bit values fit HUGEINT directly. */
  private def mul32(a: String, b: Long): String =
    s"(($a) * $b) % $M32"

  /** (a*b) mod 2^64 via a 32-bit split (a HUGEINT square would overflow
    * the signed 128-bit range). */
  private def mul64(a: String, b: BigInt): String =
    s"(((($a) // 4294967296) * $b) % 4294967296 * 4294967296" +
      s" + ((($a) % 4294967296) * $b)) % $M64"

  private def rot32(x: String, r: Int): String =
    s"((($x) * ${1L << r}) % $M32 + ($x) // ${1L << (32 - r)}) % $M32"

  /** Murmur3 mixK1 then mixH1 folded into one lambda body. */
  private def mixStep(h: String, k: String): String = {
    val k1 = s"(($k) * 3432918353) % $M32"                // * 0xcc9e2d51
    val k2 = rot32(k1, 15)
    val k3 = s"(($k2) * 461845907) % $M32"                // * 0x1b873593
    val x = s"xor($h, $k3)"
    s"((${rot32(x, 13)}) * 5 + 3864292196) % $M32"        // + 0xe6546b64
  }

  /** 32-bit Murmur3 of token expression `t` (ASCII string) with `seed`,
    * as Spark's hashUnsafeBytes computes it. Also consumed by the
    * hashed-classifier gate (TextQueries), which buckets by this hash. */
  private[queries] def murmur32(t: String, seed: BigInt): String =
    murmur32E(t, seed.toString)

  /** [[murmur32]] with the seed as a SQL EXPRESSION (unsigned 32-bit
    * HUGEINT domain) — the CMS replay chains h2 = murmur(t, seed = h1),
    * where h1 is a per-row column, not a literal. */
  private[queries] def murmur32E(t: String, seed: String): String = {
    val blocks =
      s"""list_transform(range(0, length($t) // 4), i ->
         |  CAST(ord($t[CAST(4*i+1 AS INT)]) + 256 * ord($t[CAST(4*i+2 AS INT)])
         |       + 65536 * ord($t[CAST(4*i+3 AS INT)])
         |       + 16777216 * ord($t[CAST(4*i+4 AS INT)]) AS HUGEINT))""".stripMargin
    val hb = s"list_reduce(list_prepend(CAST($seed AS HUGEINT), $blocks)," +
      s" (h, k) -> ${mixStep("h", "k")})"
    val tail =
      s"""list_transform(range((length($t) // 4) * 4 + 1, length($t) + 1),
         |  j -> CAST(ord($t[CAST(j AS INT)]) AS HUGEINT))""".stripMargin
    val ht = s"list_reduce(list_prepend($hb, $tail)," +
      s" (h, k) -> ${mixStep("h", "k")})"
    var h = s"xor($ht, CAST(length($t) AS HUGEINT))"
    h = s"xor($h, ($h) // 65536)"
    h = mul32(h, 2246822507L)                             // * 0x85ebca6b
    h = s"xor($h, ($h) // 8192)"
    h = mul32(h, 3266489909L)                             // * 0xc2b2ae35
    s"xor($h, ($h) // 65536)"
  }

  /** Unsigned 64-bit token hash: (h1 << 32) | h2 like SimHashUtil. */
  private def tokenHash64(t: String): String =
    s"(${murmur32(t, BigInt("9747b28c", 16))}) * 4294967296" +
      s" + (${murmur32(t, BigInt("85ebca6b", 16))})"

  /** Band keys over an unsigned HUGEINT signature column `su`:
    * `bands` bands distributed as evenly as possible over 64 bits —
    * exactly Dedup.sigBandPairs' widths/offsets. */
  private def bandList(su: String, bands: Int): String = {
    val widths = Array.tabulate(bands)(b =>
      64 / bands + (if (b < 64 % bands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    (0 until bands).map { b =>
      s"(($su) // ${BigInt(1) << offsets(b)}) % ${BigInt(1) << widths(b)}"
    }.mkString("[", ", ", "]")
  }

  private def toSigned64(u: String): String =
    s"CAST(CASE WHEN ($u) >= ${BigInt(1) << 63} THEN ($u) - $M64" +
      s" ELSE ($u) END AS BIGINT)"

  /** The SimHash signature CTE chain over `src` (a table or subquery
    * with doc_id/text): tokens → 64-bit hashes (distinct-token
    * memoization, then re-joined so duplicates vote once per
    * occurrence) → ±1 bit vote → `sig(doc_id, su)`. Shared by the
    * banded oracle and the brute recall oracle. */
  private def simhashSigCtes(src: String): String =
    s"""tok AS (SELECT doc_id,
       |              unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
       |            FROM $src),
       |dt AS (SELECT DISTINCT t FROM tok),
       |th AS MATERIALIZED (SELECT t, CAST(${tokenHash64("t")} AS HUGEINT) AS hu
       |                    FROM dt),
       |dh AS (SELECT doc_id, list(hu) AS hs
       |       FROM tok JOIN th USING (t) GROUP BY doc_id),
       |sig AS MATERIALIZED (SELECT doc_id,
       |               list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |                 list_transform(range(0, 64), b ->
       |                   CASE WHEN 2 * len(list_filter(hs,
       |                          h -> (h // (CAST(1 AS HUGEINT) << b)) % 2 = 1))
       |                        > len(hs)
       |                        THEN CAST(1 AS HUGEINT) << b
       |                        ELSE CAST(0 AS HUGEINT) END)),
       |                 (a, x) -> a + x) AS su
       |        FROM dh)""".stripMargin

  /** Full q_dedup_simhash_recall oracle (ROW-HASHED since r16): the
    * BRUTE O(n²) hamming-pair frame over the 300-doc subset, every
    * stage independently recomputed — the gate emits Spark's brute
    * pairs and proves banded == brute with a loud in-gate set-equality
    * check, so the banding property has no self-certified flag left. */
  lazy val simhashBruteSql: String =
    s"""WITH ${simhashSigCtes(
           "(SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 300)")},
       |pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
       |                 CAST(bit_count(xor(${toSigned64("a.su")},
       |                                    ${toSigned64("b.su")})) AS BIGINT)
       |                   AS hamming
       |          FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
       |SELECT id1, id2, hamming FROM pairs WHERE hamming <= 6
       |ORDER BY id1, id2""".stripMargin

  /** Full q_dedup_embed_lsh_recall oracle (ROW-HASHED since r16): the
    * EXACT brute cosine-pair frame over the planted augmented corpus
    * (scaled exact copies + first-component perturbations), rounded
    * half-away at 4 decimals like the engine — the gate emits Spark's
    * exact pairs and pins LSH ⊆ exact and planted-recall with loud
    * in-gate checks. */
  lazy val embedBruteSql: String =
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |              FROM embeddings WHERE vec_id < 50),
       |aug AS (SELECT vec_id, v FROM base
       |        UNION ALL
       |        SELECT vec_id + 100000, list_transform(v, x -> x * 2.0)
       |        FROM base WHERE vec_id < 25
       |        UNION ALL
       |        SELECT vec_id + 100000, list_concat([v[1] + 0.1], v[2:64])
       |        FROM base WHERE vec_id >= 25)
       |SELECT a.vec_id AS id1, b.vec_id AS id2,
       |       round(list_cosine_similarity(a.v, b.v), 4) AS cosine
       |FROM aug a JOIN aug b ON a.vec_id < b.vec_id
       |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.99
       |ORDER BY id1, id2""".stripMargin

  /** Full q_dedup_simhash oracle: the factored signature chain over
    * the whole corpus → 7-band LSH → hamming ≤ 6. */
  lazy val simhashSql: String = {
    val bands = 7 // maxHamming 6 + 1
    s"""WITH ${simhashSigCtes("documents")},
       |banded AS (SELECT doc_id, su, unnest(${bandList("su", bands)}) AS key,
       |                  unnest(range(0, $bands)) AS band
       |           FROM sig),
       |pairs AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
       |                 CAST(bit_count(xor(${toSigned64("a.su")},
       |                                    ${toSigned64("b.su")})) AS INT)
       |                   AS hamming
       |          FROM banded a JOIN banded b
       |            ON a.band = b.band AND a.key = b.key
       |               AND a.doc_id < b.doc_id)
       |SELECT id1, id2, hamming FROM pairs WHERE hamming <= 6
       |ORDER BY id1, id2""".stripMargin
  }

  /** splitmix64-style mixer with the ENGINE's constants
    * (VectorSketchUtil.mix). */
  private def mix(z0: String): String = {
    var z = s"(($z0) + ${BigInt("9e3779b97f4b7c15", 16)}) % $M64"
    z = mul64(s"xor($z, ($z) // ${1L << 30})", BigInt("bf58476d1ce4e5b9", 16))
    z = mul64(s"xor($z, ($z) // ${1L << 27})", BigInt("94d049bb133111eb", 16))
    s"xor($z, ($z) // ${1L << 31})"
  }

  /** Full q_dedup_embed_lsh oracle: deterministic hyperplane table
    * (64 planes × 64 dims), sign-bit signatures with left-fold dots,
    * 11-band LSH, hamming ≤ 10, rounded-cosine ≥ 0.99 verify, over the
    * same planted augmented embeddings as q_dedup_embed. */
  lazy val embedLshSql: String = {
    val bands = 11 // maxHamming 10 + 1
    val plane = s"(((${mix("CAST(i AS HUGEINT) * 4294967296 + CAST(j AS HUGEINT)")})" +
      s" // 2048) / 9007199254740992.0) * 2.0 - 1.0"
    val dot = "list_reduce(list_transform(list_zip(v, pl[CAST(i + 1 AS INT)])," +
      " z -> z[1] * z[2]), (x1, y1) -> x1 + y1)"
    s"""WITH pt AS (SELECT i, list(g ORDER BY j) AS gs FROM (
       |              SELECT i, j, $plane AS g
       |              FROM range(0, 64) t1(i), range(0, 64) t2(j)) GROUP BY i),
       |pls AS (SELECT list(gs ORDER BY i) AS pl FROM pt),
       |base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |         FROM embeddings WHERE vec_id < 50),
       |aug AS (SELECT vec_id, v FROM base
       |        UNION ALL
       |        SELECT vec_id + 100000, list_transform(v, x -> x * 2.0)
       |        FROM base WHERE vec_id < 25
       |        UNION ALL
       |        SELECT vec_id + 100000, list_concat([v[1] + 0.1], v[2:64])
       |        FROM base WHERE vec_id >= 25),
       |sig AS (SELECT vec_id, v,
       |               list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |                 list_transform(range(0, 64), i ->
       |                   CASE WHEN $dot >= 0 THEN CAST(1 AS HUGEINT) << i
       |                        ELSE CAST(0 AS HUGEINT) END)),
       |                 (a, x) -> a + x) AS su
       |        FROM aug, pls),
       |banded AS (SELECT vec_id, v, su,
       |                  unnest(${bandList("su", bands)}) AS key,
       |                  unnest(range(0, $bands)) AS band
       |           FROM sig),
       |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2,
       |                a.v AS v1, b.v AS v2,
       |                bit_count(xor(${toSigned64("a.su")},
       |                              ${toSigned64("b.su")})) AS hamming
       |         FROM banded a JOIN banded b
       |           ON a.band = b.band AND a.key = b.key
       |              AND a.vec_id < b.vec_id)
       |SELECT id1, id2, round(list_cosine_similarity(v1, v2), 4) AS cosine
       |FROM cand
       |WHERE hamming <= 10
       |  AND round(list_cosine_similarity(v1, v2), 4) >= 0.99
       |ORDER BY id1, id2""".stripMargin
  }

  /** Full q_text_hash_embed oracle: the feature-hashing embedder
    * replayed per token — Spark murmur3 over token bytes with the
    * SimHash seed pair (the byte-level replay [[simhashSql]] proved),
    * unsigned mod-d scatter, ±1 from the sign hash's low bit, dense
    * d-dim signed-count sum including untouched (zero) dims. Distinct
    * tokens hash once and re-join so duplicates scatter once per
    * occurrence, exactly like the engine's per-row loop. */
  lazy val hashEmbedSql: String = {
    val d = 16
    s"""WITH tok AS (SELECT doc_id,
       |              unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
       |            FROM documents),
       |dt AS (SELECT DISTINCT t FROM tok),
       |th AS (SELECT t,
       |              CAST((${murmur32("t", BigInt("9747b28c", 16))}) % $d
       |                AS BIGINT) AS dim,
       |              CASE WHEN (${murmur32("t", BigInt("85ebca6b", 16))})
       |                     % 2 = 1
       |                   THEN 1 ELSE -1 END AS s
       |       FROM dt),
       |sc AS (SELECT tok.doc_id, th.dim, th.s FROM tok JOIN th USING (t)),
       |agg AS (SELECT doc_id, dim, CAST(sum(s) AS DOUBLE) AS value
       |        FROM sc GROUP BY doc_id, dim),
       |grid AS (SELECT d.doc_id, dims.dim
       |         FROM (SELECT DISTINCT doc_id FROM documents) d
       |         CROSS JOIN (SELECT CAST(unnest(range(0, $d)) AS BIGINT)
       |                       AS dim) dims)
       |SELECT grid.doc_id AS doc_id, grid.dim AS dim,
       |       coalesce(agg.value, 0.0) AS value
       |FROM grid LEFT JOIN agg
       |  ON grid.doc_id = agg.doc_id AND grid.dim = agg.dim
       |ORDER BY grid.doc_id, grid.dim""".stripMargin
  }

  /** Full q_text_ann_e2e oracle: TEXT-to-retrieval end-to-end — the
    * [[hashEmbedSql]] embedder (at d=64) composed with the
    * [[hammingTopKSql]] retrieval stack, replayed as ONE DuckDB query:
    * tokens → murmur scatter → dense 64-dim vectors → plane-table sign
    * signatures → Hamming shortlist → exact rounded-cosine re-rank.
    * Every stage deterministic, so a documents table retrieves over
    * itself with no external embedder and the gate hashes the ROWS. */
  lazy val textAnnE2eSql: String = {
    val d = 64
    val plane = s"(((${mix("CAST(i AS HUGEINT) * 4294967296 + CAST(j AS HUGEINT)")})" +
      s" // 2048) / 9007199254740992.0) * 2.0 - 1.0"
    val dot = "list_reduce(list_transform(list_zip(v, pl[CAST(i + 1 AS INT)])," +
      " z -> z[1] * z[2]), (x1, y1) -> x1 + y1)"
    s"""WITH tok AS (SELECT doc_id,
       |              unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
       |            FROM documents),
       |dt AS (SELECT DISTINCT t FROM tok),
       |th AS (SELECT t,
       |              CAST((${murmur32("t", BigInt("9747b28c", 16))}) % $d
       |                AS BIGINT) AS dim,
       |              CASE WHEN (${murmur32("t", BigInt("85ebca6b", 16))})
       |                     % 2 = 1
       |                   THEN 1 ELSE -1 END AS s
       |       FROM dt),
       |sc AS (SELECT tok.doc_id, th.dim, th.s FROM tok JOIN th USING (t)),
       |agg AS (SELECT doc_id, dim, CAST(sum(s) AS DOUBLE) AS value
       |        FROM sc GROUP BY doc_id, dim),
       |grid AS (SELECT d0.doc_id, dims.dim
       |         FROM (SELECT DISTINCT doc_id FROM documents) d0
       |         CROSS JOIN (SELECT CAST(unnest(range(0, $d)) AS BIGINT)
       |                       AS dim) dims),
       |vecs AS (SELECT grid.doc_id AS vec_id,
       |                list(coalesce(agg.value, 0.0)
       |                     ORDER BY grid.dim) AS v
       |         FROM grid LEFT JOIN agg
       |           ON grid.doc_id = agg.doc_id AND grid.dim = agg.dim
       |         GROUP BY grid.doc_id),
       |pt AS (SELECT i, list(g ORDER BY j) AS gs FROM (
       |         SELECT i, j, $plane AS g
       |         FROM range(0, 64) t1(i), range(0, $d) t2(j)) GROUP BY i),
       |pls AS (SELECT list(gs ORDER BY i) AS pl FROM pt),
       |sig AS (SELECT vec_id, v,
       |               list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |                 list_transform(range(0, 64), i ->
       |                   CASE WHEN $dot >= 0 THEN CAST(1 AS HUGEINT) << i
       |                        ELSE CAST(0 AS HUGEINT) END)),
       |                 (a, x) -> a + x) AS su
       |        FROM vecs, pls),
       |qs AS (SELECT vec_id AS query_id, v AS qv, su AS qsu
       |       FROM sig WHERE vec_id < 3),
       |sh AS (SELECT qs.query_id, s2.vec_id AS cand_id, s2.v, qs.qv,
       |              CAST(bit_count(xor(${toSigned64("s2.su")},
       |                                 ${toSigned64("qs.qsu")})) AS BIGINT)
       |                AS hamming
       |       FROM sig s2 JOIN qs ON qs.query_id <> s2.vec_id),
       |sl AS (SELECT query_id, cand_id, v, qv, hamming,
       |              row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY hamming, cand_id) AS hr
       |       FROM sh),
       |rr AS (SELECT query_id, cand_id, hamming,
       |              round(list_cosine_similarity(v, qv), 4) AS score
       |       FROM sl WHERE hr <= 30),
       |rk AS (SELECT query_id, cand_id, hamming, score,
       |              row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY score DESC, cand_id) AS rank
       |       FROM rr)
       |SELECT query_id, cand_id, hamming, score, rank
       |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Full q_ann_hamming oracle: the binary-quantized RETRIEVAL pipeline
    * (Similarity.hammingTopK) replayed end-to-end — the deterministic
    * hyperplane table and sign-bit signatures of [[embedLshSql]] over
    * the WHOLE embeddings corpus, per-query Hamming shortlist of 50
    * (integer distance, ties by id), exact rounded-cosine re-rank to
    * top-10. Every stage is deterministic, so the gate is hash-exact —
    * an ANN gate the oracle can actually fail, not a recall flag. */
  lazy val hammingTopKSql: String = hammingTopKSqlOver(
    "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings")

  /** [[hammingTopKSql]] parameterized over its corpus: `baseSql` must
    * yield (vec_id, v DOUBLE[]) — the maintenance gate replays the
    * SAME retrieval stack over embeddings ∪ streamed batches ∖ deletes,
    * so the index the cadence pass compacted and vacuumed is held to a
    * hash-exact oracle, not a recall flag. */
  def hammingTopKSqlOver(baseSql: String, phaseSql: String = ""): String = {
    val plane = s"(((${mix("CAST(i AS HUGEINT) * 4294967296 + CAST(j AS HUGEINT)")})" +
      s" // 2048) / 9007199254740992.0) * 2.0 - 1.0"
    val dot = "list_reduce(list_transform(list_zip(v, pl[CAST(i + 1 AS INT)])," +
      " z -> z[1] * z[2]), (x1, y1) -> x1 + y1)"
    s"""WITH pt AS (SELECT i, list(g ORDER BY j) AS gs FROM (
       |              SELECT i, j, $plane AS g
       |              FROM range(0, 64) t1(i), range(0, 64) t2(j)) GROUP BY i),
       |pls AS (SELECT list(gs ORDER BY i) AS pl FROM pt),
       |base AS ($baseSql),
       |sig AS (SELECT vec_id, v,
       |               list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |                 list_transform(range(0, 64), i ->
       |                   CASE WHEN $dot >= 0 THEN CAST(1 AS HUGEINT) << i
       |                        ELSE CAST(0 AS HUGEINT) END)),
       |                 (a, x) -> a + x) AS su
       |        FROM base, pls),
       |qs AS (SELECT vec_id AS query_id, v AS qv, su AS qsu
       |       FROM sig WHERE vec_id < 5),
       |sh AS (SELECT qs.query_id, s.vec_id AS cand_id, s.v, qs.qv,
       |              CAST(bit_count(xor(${toSigned64("s.su")},
       |                                 ${toSigned64("qs.qsu")})) AS BIGINT)
       |                AS hamming
       |       FROM sig s JOIN qs ON qs.query_id <> s.vec_id),
       |sl AS (SELECT query_id, cand_id, v, qv, hamming,
       |              row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY hamming, cand_id) AS hr
       |       FROM sh),
       |rr AS (SELECT query_id, cand_id, hamming,
       |              round(list_cosine_similarity(v, qv), 4) AS score
       |       FROM sl WHERE hr <= 50),
       |rk AS (SELECT query_id, cand_id, hamming, score,
       |              row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY score DESC, cand_id) AS rank
       |       FROM rr)
       |${if (phaseSql.isEmpty)
           "SELECT query_id, cand_id, hamming, score, rank\n" +
           "FROM rk WHERE rank <= 10 ORDER BY query_id, rank"
         else
           s"SELECT pp.phase, query_id, cand_id, hamming, score, rank\n" +
           s"FROM rk CROSS JOIN (SELECT unnest([$phaseSql]) AS phase) pp\n" +
           "WHERE rank <= 10 ORDER BY phase, query_id, rank"}""".stripMargin
  }

  /** Full q_sketch_cms_topk oracle: Spark's CountMinSketch replayed
    * byte-for-byte (decompiled from spark-sketch's CountMinSketchImpl,
    * a public-source Guava-style double-hashing CMS) — per token
    * h1 = Murmur3_x86_32.hashUnsafeBytes(bytes, 0),
    * h2 = hashUnsafeBytes(bytes, h1), bucket_i = |int32(h1 + i·h2)| %
    * width for rows i < depth; counters sum token multiplicities per
    * (row, bucket); the estimate is the min over rows — depth 7 ×
    * width 2000 at the gate's (eps 0.001, confidence 0.99). The int32
    * reinterpretation + Math.abs is exact in unbounded arithmetic:
    * |c - 2^32| for c ≥ 2^31 (the MIN_VALUE edge included). The gate
    * emits the ESTIMATES, so the sketch itself — not a flag derived
    * from it — is what the oracle recomputes and can fail. */
  lazy val cmsTopKSql: String = {
    val toks = "string_split_regex(trim(lower(text)), '\\s+')"
    s"""WITH tok AS (SELECT unnest($toks) AS token FROM documents),
       |cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS true_cnt
       |        FROM tok GROUP BY token),
       |th1 AS MATERIALIZED (SELECT token, true_cnt,
       |              ${murmur32E("token", "0")} AS h1u
       |       FROM cnt),
       |th AS MATERIALIZED (SELECT token, true_cnt, h1u,
       |             ${murmur32E("token", "h1u")} AS h2u
       |      FROM th1),
       |bk AS (SELECT token, true_cnt, i,
       |              CAST((CASE WHEN c >= 2147483648 THEN 4294967296 - c
       |                         ELSE c END) % 2000 AS BIGINT) AS bucket
       |       FROM (SELECT token, true_cnt, i,
       |                    (h1u + CAST(i AS HUGEINT) * h2u) % 4294967296
       |                      AS c
       |             FROM th, range(0, 7) r(i))),
       |ctr AS (SELECT i, bucket, CAST(sum(true_cnt) AS BIGINT) AS w
       |        FROM bk GROUP BY i, bucket),
       |est AS (SELECT b.token, min(c2.w) AS est_cnt
       |        FROM bk b JOIN ctr c2 USING (i, bucket)
       |        GROUP BY b.token),
       |top AS (SELECT token, true_cnt FROM cnt
       |        ORDER BY true_cnt DESC, token LIMIT 20)
       |SELECT t.token, t.true_cnt, e.est_cnt
       |FROM top t JOIN est e USING (token)
       |ORDER BY t.token""".stripMargin
  }
}
