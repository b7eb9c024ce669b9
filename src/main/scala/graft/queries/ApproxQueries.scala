package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Tables.t
import graft.functions.Rounding.round4
import graft.operators.Sketches

/** Driver-gated approximate-analytics queries: mergeable sketches (HLL
  * distinct, count-min heavy hitters), bounded-error quantiles, and
  * percentile-clipped (winsorized) aggregation.
  *
  * Gating pattern: approximate answers cannot be hash-compared across
  * engines, so each gate emits the EXACT companion values (which the
  * DuckDB oracle recomputes) plus booleans certifying the approximation's
  * error contract (which the oracle pins TRUE). The sketches are
  * deterministic — fixed seeds, fixed data, no RNG — so a certified run
  * stays certified.
  */
object ApproxQueries {

  val all: Seq[Q] = Seq(

    // HyperLogLog distinct counting, three contracts at once:
    //   acd_ok   — approx_count_distinct within 3·rsd of exact;
    //   hll_ok   — DataSketches HLL estimate within 5% of exact;
    //   merge_ok — the union of per-shard sketches ALSO lands within the
    //              5% contract. This is the mergeability/incremental-
    //              maintenance property as it actually holds: at 100 TB,
    //              per-partition (or per-day) sketches are built
    //              scan-locally, only fixed-size sketch bytes cross the
    //              exchange, and yesterday's sketch unions with today's
    //              without rescanning history — the union is a valid
    //              estimator, though NOT byte-identical to a monolithic
    //              sketch (DataSketches estimates are path-dependent:
    //              shard sketches still in coupon mode union into
    //              different internal state than one big sketch; measured
    //              here as 1991 vs 2019 on 2000 true distincts).
    Q("q_sketch_hll",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |       TRUE AS acd_ok, TRUE AS hll_ok, TRUE AS merge_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val sharded = li.groupBy(col("l_returnflag"), col("l_linenumber"))
        .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
        .groupBy("l_returnflag")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_union"))
      val direct = li.groupBy("l_returnflag").agg(
        expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("est_direct"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct("l_partkey", 0.02).as("acd"))
      direct.join(sharded, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("acd") - col("exact_parts")) <=
            col("exact_parts") * lit(0.06)).as("acd_ok"),
          (abs(col("est_direct") - col("exact_parts")) <=
            col("exact_parts") * lit(0.05)).as("hll_ok"),
          (abs(col("est_union") - col("exact_parts")) <=
            col("exact_parts") * lit(0.05)).as("merge_ok"))
        .orderBy("l_returnflag")
    },

    // Count-min-sketch heavy hitters over the document token stream: the
    // top-20 tokens by exact count WITH THEIR SKETCH ESTIMATES. FULLY
    // ROW-HASHED since r16: the oracle replays Spark's CountMinSketch
    // itself in DuckDB (double murmur, |int32| bucketing, depth-7 ×
    // width-2000 counters, min over rows — SketchReplay.cmsTopKSql), so
    // the sketch's actual output is what the hash pins; the error
    // contract (estimate ≥ truth, ≤ truth + ⌈eps·N⌉) fails loudly
    // inside the operator. The sketch is the O(1/eps) fixed-size
    // artifact that would ship at 100 TB.
    Q("q_sketch_cms_topk", SketchReplay.cmsTopKSql) { (s, dir) =>
      val toks = t(s, dir, "documents")
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("token"))
      // strictBound: with this FIXED corpus + seed the eps·N bound is
      // deterministic — a trip here is a regression, never tail luck
      Sketches.cmsHeavyHitters(toks, "token", k = 20,
        eps = 0.001, confidence = 0.99, seed = 42, strictBound = true)
    },

    // Bounded-error quantiles: percentile_approx (GK sketch, mergeable,
    // accuracy 1/eps = 10000) certified on its actual RANK contract: the
    // returned element's rank interval [#(x < apx)+1, #(x ≤ apx)] must
    // intersect [(p−eps)·n − 1, (p+eps)·n + 1]. Checked in scaled INTEGER
    // arithmetic (P = p·10⁴, so 10⁴·rank vs (P±1)·n ± 10⁴), which is
    // exact at ANY group size — a value-envelope at p ± 2·eps breaks when
    // eps·n < 1 rank (observed at sf0.001: the envelope spans less than
    // one element). Two passes: the sketch pass computes apx, a broadcast
    // join counts ranks against it. The oracle recomputes the exact
    // interpolated quantiles (DuckDB quantile_cont ≡ Spark percentile)
    // and pins the certificate TRUE.
    Q("q_sketch_quantile", {
      val sel = Seq(25, 50, 75, 95).map(p =>
        s"round(quantile_cont(l_extendedprice, 0.$p), 4) AS q$p")
        .mkString(",\n|       ")
      s"""SELECT l_returnflag, $sel, TRUE AS bounds_ok
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, dir) =>
      val ps = Seq(0.25, 0.50, 0.75, 0.95)
      val scaledP = ps.map(p => math.round(p * 10000))
      def arr(xs: Seq[Double]) = xs.mkString("array(", ", ", ")")
      val names = Seq("q25", "q50", "q75", "q95")
      val li = t(s, dir, "lineitem")
      val agg = li.groupBy("l_returnflag").agg(
        expr(s"percentile_approx(l_extendedprice, ${arr(ps)}, 10000)")
          .as("apx"),
        expr(s"percentile(l_extendedprice, ${arr(ps)})").as("ex"))
      val ranked = li.join(broadcast(agg), "l_returnflag")
        .groupBy("l_returnflag", "apx", "ex")
        .agg(count(lit(1)).as("n"),
          ps.indices.map(i => struct(
            sum(when(col("l_extendedprice") < col("apx")(i), 1L)
              .otherwise(0L)).as("lo"),
            sum(when(col("l_extendedprice") <= col("apx")(i), 1L)
              .otherwise(0L)).as("hi")).as(s"r$i")): _*)
      val boundsOk = ps.indices.map { i =>
        val rLo = col(s"r$i").getField("lo") + 1
        val rHi = col(s"r$i").getField("hi")
        (lit(10000L) * rHi >= (lit(scaledP(i)) - 1) * col("n") - 10000L) &&
          (lit(10000L) * rLo <= (lit(scaledP(i)) + 1) * col("n") + 10000L)
      }.reduce(_ && _)
      ranked.select(col("l_returnflag") +:
        names.zipWithIndex.map { case (n, i) => round4(col("ex")(i)).as(n) } :+
        boundsOk.as("bounds_ok"): _*)
        .orderBy("l_returnflag")
    },

    // Theta sketches — the set-OPERATION sketch family (HLL can only
    // union): distinct customers active in the early AND late periods
    // (intersection), either (union), and early-only (difference), each
    // estimated from two fixed-size sketches and certified against the
    // sketch's actual error model: theta error scales with the UNION
    // cardinality (a set-difference of 1 can be estimated as 0 — observed
    // at sf0.1 — so "5% of the difference" would be a false contract),
    // hence every margin is 5% of n_union. The oracle recomputes exact
    // counts and pins the flags. At the default lgK the sketches hold
    // sub-4096 cardinalities in exact mode (sf0.01 margins are zero); at
    // 100 TB the same query exchanges two 32 KB sketches instead of
    // re-scanning both periods for every set combination.
    Q("q_sketch_theta",
      """WITH e AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderdate < TIMESTAMP '1996-01-01'),
        |l AS (SELECT DISTINCT o_custkey FROM orders
        |      WHERE o_orderdate >= TIMESTAMP '1996-01-01')
        |SELECT (SELECT count(*) FROM e) AS n_early,
        |       (SELECT count(*) FROM l) AS n_late,
        |       (SELECT count(*) FROM (SELECT * FROM e
        |                              INTERSECT SELECT * FROM l)) AS n_both,
        |       (SELECT count(*) FROM (SELECT * FROM e
        |                              UNION SELECT * FROM l)) AS n_union,
        |       TRUE AS union_ok, TRUE AS inter_ok, TRUE AS diff_ok
        |""".stripMargin) { (s, dir) =>
      val ord = t(s, dir, "orders")
      val early = col("o_orderdate") < lit("1996-01-01").cast("timestamp")
      val per = ord.groupBy("o_custkey").agg(
        max(when(early, 1).otherwise(0)).as("e"),
        max(when(!early, 1).otherwise(0)).as("l"))
      val exact = per.agg(
        sum("e").cast("long").as("n_early"),
        sum("l").cast("long").as("n_late"),
        sum(col("e") * col("l")).cast("long").as("n_both"),
        count(lit(1)).as("n_union"))
      val est = ord.agg(
        expr("theta_sketch_agg(CASE WHEN o_orderdate < TIMESTAMP " +
          "'1996-01-01' THEN o_custkey END)").as("ske"),
        expr("theta_sketch_agg(CASE WHEN o_orderdate >= TIMESTAMP " +
          "'1996-01-01' THEN o_custkey END)").as("skl"))
        .select(
          expr("theta_sketch_estimate(theta_union(ske, skl))").as("eu"),
          expr("theta_sketch_estimate(theta_intersection(ske, skl))")
            .as("ei"),
          expr("theta_sketch_estimate(theta_difference(ske, skl))").as("ed"))
      exact.crossJoin(broadcast(est))
        .select(col("n_early"), col("n_late"), col("n_both"), col("n_union"),
          (abs(col("eu") - col("n_union")) <= col("n_union") * lit(0.05))
            .as("union_ok"),
          (abs(col("ei") - col("n_both")) <= col("n_union") * lit(0.05))
            .as("inter_ok"),
          (abs(col("ed") - (col("n_early") - col("n_both"))) <=
            col("n_union") * lit(0.05)).as("diff_ok"))
    },

    // Linear-regression aggregates (regr_slope/intercept/r2/count) — the
    // moment-sketch statistics a profiler fits scan-side; rounded like
    // corr/covar (q_agg_stats) so both engines' summation orders agree.
    Q("q_agg_regression",
      """SELECT l_returnflag,
        |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 4)
        |         AS icept,
        |       round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
        |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        round4(expr("regr_slope(l_extendedprice, l_quantity)")).as("slope"),
        round4(expr("regr_intercept(l_extendedprice, l_quantity)"))
          .as("icept"),
        round4(expr("regr_r2(l_extendedprice, l_quantity)")).as("r2"),
        expr("regr_count(l_extendedprice, l_quantity)").as("n"))
        .orderBy("l_returnflag")
    },

    // Winsorized aggregation — percentile-clipped sums, the robust-stats
    // step a curation pipeline applies before fitting thresholds (extreme
    // outliers saturate at p05/p95 instead of dominating the total). The
    // clip bounds are rounded to 4 dp BEFORE clipping and the clipped
    // values are summed as DECIMAL(18,4), so both engines add exact
    // decimals in any order — bit-identical across partitionings. The
    // exact sum converts to DOUBLE only at the very end (one rounding,
    // same on both engines; a double SUM would be partial-order-dependent
    // and pyarrow types a parquet decimal as object, not float64).
    Q("q_stats_winsorize",
      """WITH b AS (SELECT l_returnflag,
        |                  round(quantile_cont(l_extendedprice, 0.05), 4) AS lo,
        |                  round(quantile_cont(l_extendedprice, 0.95), 4) AS hi
        |           FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, b.lo, b.hi,
        |       CAST(sum(CAST(least(greatest(l.l_extendedprice, b.lo), b.hi)
        |                AS DECIMAL(18,4))) AS DOUBLE) AS wsum
        |FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val bounds = li.groupBy("l_returnflag").agg(
        round4(expr("percentile(l_extendedprice, 0.05)")).as("lo"),
        round4(expr("percentile(l_extendedprice, 0.95)")).as("hi"))
      li.join(broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag", "lo", "hi")
        .agg(sum(least(greatest(col("l_extendedprice"), col("lo")), col("hi"))
          .cast("decimal(18,4)")).cast("double").as("wsum"))
        .orderBy("l_returnflag")
    },

    // ANALYZE-style column statistics (operators.Analyze): per-column
    // rows/nulls/NDV/min/max in ONE aggregation pass, long-form output.
    // The gate runs the exact-NDV mode (multi-count-distinct through one
    // Expand — oracle-able); AnalyzeSpec pins the HLL mode (the 100 TB
    // plan: no Expand, fixed-size sketch buffers) within error of exact.
    // Engine-portable stringification: doubles pre-cast to BIGINT (the
    // synthetic quantities are integral), timestamps to DATE — native
    // double/timestamp string forms differ across engines.
    Q("q_stats_analyze",
      """WITH p AS (SELECT l_orderkey, l_suppkey, l_returnflag,
        |                  CAST(l_quantity AS BIGINT) AS l_quantity_int,
        |                  CAST(l_shipdate AS DATE) AS l_shipdate_day
        |           FROM lineitem)
        |SELECT 'l_orderkey' AS "column", count(*) AS n_rows,
        |       count(*) - count(l_orderkey) AS n_nulls,
        |       count(DISTINCT l_orderkey) AS ndv,
        |       CAST(min(l_orderkey) AS VARCHAR) AS min_str,
        |       CAST(max(l_orderkey) AS VARCHAR) AS max_str FROM p
        |UNION ALL
        |SELECT 'l_quantity_int', count(*), count(*) - count(l_quantity_int),
        |       count(DISTINCT l_quantity_int),
        |       CAST(min(l_quantity_int) AS VARCHAR),
        |       CAST(max(l_quantity_int) AS VARCHAR) FROM p
        |UNION ALL
        |SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
        |       count(DISTINCT l_returnflag),
        |       CAST(min(l_returnflag) AS VARCHAR),
        |       CAST(max(l_returnflag) AS VARCHAR) FROM p
        |UNION ALL
        |SELECT 'l_shipdate_day', count(*), count(*) - count(l_shipdate_day),
        |       count(DISTINCT l_shipdate_day),
        |       CAST(min(l_shipdate_day) AS VARCHAR),
        |       CAST(max(l_shipdate_day) AS VARCHAR) FROM p
        |UNION ALL
        |SELECT 'l_suppkey', count(*), count(*) - count(l_suppkey),
        |       count(DISTINCT l_suppkey),
        |       CAST(min(l_suppkey) AS VARCHAR),
        |       CAST(max(l_suppkey) AS VARCHAR) FROM p
        |ORDER BY "column"""".stripMargin) { (s, dir) =>
      graft.operators.Analyze.columnStats(
        t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_suppkey"), col("l_returnflag"),
          col("l_quantity").cast("bigint").as("l_quantity_int"),
          col("l_shipdate").cast("date").as("l_shipdate_day")),
        Seq("l_orderkey", "l_quantity_int", "l_returnflag",
          "l_shipdate_day", "l_suppkey"))
    },

    // Bloom filter over the English vocabulary (Sketches.bloomBuild):
    // m = 16384 bits as 512 32-bit words, 4 Kirsch–Mitzenmacher double
    // hashes derived from the replayable Rabin–Karp Horner fold (second
    // hash = same fold over a salted key). The gate hash-compares the
    // FILTER ITSELF bit for bit — build is a distributive bit_or
    // aggregate, so at 100 TB only m/32 partial words cross the
    // exchange regardless of key count.
    Q("q_sketch_bloom", {
      val (m, mw, kh) = (16384, 16383, 4)
      s"""WITH vocab AS (SELECT DISTINCT unnest(${TextQueries.sqlToks})
         |                 AS key
         |               FROM documents WHERE lang = 'en'),
         |kk AS (SELECT key, 'g2:' || key AS key2 FROM vocab),
         |h AS (SELECT key, ${sqlHorner("key")} % $m AS h1,
         |             1 + ${sqlHorner("key2")} % $mw AS step
         |      FROM kk),
         |pos AS (SELECT unnest(list_transform(range(0, $kh),
         |                 j -> (h1 + j * step) % $m)) AS pos
         |        FROM h)
         |SELECT pos // 32 AS word_idx,
         |       CAST(bit_or(CAST(1 AS BIGINT)
         |         << CAST(pos % 32 AS INTEGER)) AS BIGINT) AS bits
         |FROM pos GROUP BY 1 ORDER BY word_idx""".stripMargin
    }) { (s, dir) =>
      import graft.functions.TextFunctions.tokens
      val en = t(s, dir, "documents").where(col("lang") === "en")
        .select(explode(tokens(col("text"))).as("key"))
      Sketches.bloomBuild(en, "key", mBits = 16384, kHashes = 4)
        .orderBy("word_idx")
    },

    // Probe the q_sketch_bloom filter with the NON-English vocabulary and
    // cross-tabulate maybe_present against actual membership: the
    // (false, true) row CANNOT exist — a Bloom filter has no false
    // negatives — so the hash gate pins the no-false-negative contract
    // plus the exact false-positive count. Probe is a broadcast join on
    // word_idx: the map-side pre-filter shape that drops fact rows
    // before any fact-sized exchange in a bloom-join.
    Q("q_sketch_bloom_probe", {
      val (m, mw, kh) = (16384, 16383, 4)
      s"""WITH vocab AS (SELECT DISTINCT unnest(${TextQueries.sqlToks})
         |                 AS key
         |               FROM documents WHERE lang = 'en'),
         |kk AS (SELECT key, 'g2:' || key AS key2 FROM vocab),
         |h AS (SELECT key, ${sqlHorner("key")} % $m AS h1,
         |             1 + ${sqlHorner("key2")} % $mw AS step
         |      FROM kk),
         |pos AS (SELECT unnest(list_transform(range(0, $kh),
         |                 j -> (h1 + j * step) % $m)) AS pos
         |        FROM h),
         |words AS (SELECT pos // 32 AS word_idx,
         |                 CAST(bit_or(CAST(1 AS BIGINT)
         |                   << CAST(pos % 32 AS INTEGER)) AS BIGINT)
         |                   AS bits
         |          FROM pos GROUP BY 1),
         |probe AS (SELECT DISTINCT unnest(${TextQueries.sqlToks}) AS key
         |          FROM documents WHERE lang <> 'en'),
         |pk AS (SELECT key, 'g2:' || key AS key2 FROM probe),
         |ph AS (SELECT key, ${sqlHorner("key")} % $m AS h1,
         |              1 + ${sqlHorner("key2")} % $mw AS step
         |       FROM pk),
         |pp AS (SELECT key, unnest(list_transform(range(0, $kh),
         |                j -> (h1 + j * step) % $m)) AS pos
         |       FROM ph),
         |mb AS (SELECT pp.key,
         |              min((coalesce(w.bits, 0)
         |                >> CAST(pp.pos % 32 AS INTEGER)) & 1) AS b
         |       FROM pp LEFT JOIN words w ON w.word_idx = pp.pos // 32
         |       GROUP BY pp.key)
         |SELECT (b = 1) AS maybe_present,
         |       (key IN (SELECT key FROM vocab)) AS actual_present,
         |       count(*) AS n
         |FROM mb GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }) { (s, dir) =>
      import graft.functions.TextFunctions.tokens
      val docs = t(s, dir, "documents")
      val en = docs.where(col("lang") === "en")
        .select(explode(tokens(col("text"))).as("key"))
      val filter = Sketches.bloomBuild(en, "key", mBits = 16384, kHashes = 4)
      val probes = docs.where(col("lang") =!= "en")
        .select(explode(tokens(col("text"))).as("key"))
      Sketches.bloomMightContain(filter, probes, "key",
          mBits = 16384, kHashes = 4)
        .join(en.distinct().withColumn("__in", lit(true)), Seq("key"), "left")
        .groupBy(col("maybe_present"),
          col("__in").isNotNull.as("actual_present"))
        .agg(count(lit(1)).as("n"))
        .orderBy("maybe_present", "actual_present")
    },

    // Bloom-pre-filtered join (Sketches.bloomJoin): lineitem joins the
    // nation-5 suppliers through a broadcast Bloom filter that kills
    // ~96% of fact rows map-side before the exact join settles the false
    // positives. The oracle is the PLAIN join — the gate hash-pins that
    // the bloom path is row-identical to the join it accelerates (false
    // negatives impossible, false positives joined away), which is the
    // entire correctness contract of a semi-join pushdown at 100 TB.
    Q("q_join_bloom",
      """SELECT s.s_suppkey, count(*) AS n_items,
        |       CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |WHERE s.s_nationkey = 5
        |GROUP BY s.s_suppkey ORDER BY s.s_suppkey""".stripMargin) {
      (s, dir) =>
        val dim = t(s, dir, "supplier").where(col("s_nationkey") === 5)
          .select("s_suppkey")
        val fact = t(s, dir, "lineitem").select("l_suppkey", "l_quantity")
        Sketches.bloomJoin(fact, dim, "l_suppkey", "s_suppkey")
          .groupBy("s_suppkey")
          .agg(count(lit(1)).as("n_items"),
            sum("l_quantity").cast("long").as("sum_qty"))
          .orderBy("s_suppkey")
    },

    // Key-skew diagnosis (operators.Analyze.keySkew): the measurement
    // that decides whether to salt and how hard. The fixture plants one
    // hot key holding a third of lineitem (the adversarial join input);
    // the report buckets keys the way a hash shuffle would (replayable
    // rolling_hash64 mod 16) and pins, per bucket, its row load, its
    // distinct keys, and its heaviest key — so the hot bucket's
    // top_key_rows ≈ n_rows reads "salt THIS key", not "more
    // partitions". Integer-exact end to end.
    Q("q_stats_skew", {
      val k = "CASE WHEN l_orderkey % 3 = 0 THEN CAST(0 AS VARCHAR) " +
        "ELSE CAST(l_suppkey AS VARCHAR) END"
      s"""WITH pk AS (SELECT key, count(*) AS cnt FROM (
         |  SELECT $k AS key FROM lineitem) WHERE key IS NOT NULL
         |  GROUP BY key),
         |b AS (SELECT key, cnt, ${sqlHorner("key")} % 16 AS bucket
         |      FROM pk),
         |tk AS (SELECT bucket, key, cnt FROM (
         |  SELECT bucket, key, cnt, row_number() OVER (PARTITION BY bucket
         |    ORDER BY cnt DESC, key) AS rn FROM b) WHERE rn = 1)
         |SELECT b.bucket, CAST(sum(b.cnt) AS BIGINT) AS n_rows,
         |       count(*) AS n_keys,
         |       min(tk.key) AS top_key,
         |       CAST(min(tk.cnt) AS BIGINT) AS top_key_rows
         |FROM b JOIN tk ON b.bucket = tk.bucket
         |GROUP BY b.bucket ORDER BY b.bucket""".stripMargin
    }) { (s, dir) =>
      val fixture = t(s, dir, "lineitem")
        .select(when(col("l_orderkey") % 3 === 0, lit("0"))
          .otherwise(col("l_suppkey").cast("string")).as("k"))
      graft.operators.Analyze.keySkew(fixture, "k", nBuckets = 16)
    },

    // Join-cardinality pre-flight (operators.Analyze.joinCardinality):
    // the exact output size of the lineitem⋈lineitem self-join on
    // l_suppkey — ~36M rows from 60k inputs at sf0.01 — computed WITHOUT
    // running the join: per-key counts on each side (map-side combined),
    // one key-sized merge, Σ cnt·cnt. The report names the worst key, so
    // the blowup is diagnosed before a cluster-melting shuffle, not
    // after. The oracle computes the same arithmetic; neither engine
    // materializes a single joined row.
    Q("q_stats_join_size",
      """WITH pk AS (SELECT l_suppkey AS k, count(*) AS c FROM lineitem
        |            WHERE l_suppkey IS NOT NULL GROUP BY 1),
        |j AS (SELECT k, c * c AS pairs FROM pk)
        |SELECT CAST(sum(pairs) AS BIGINT) AS join_rows,
        |       count(*) AS n_join_keys,
        |       CAST(max(pairs) AS BIGINT) AS max_key_pairs,
        |       (SELECT k FROM j WHERE pairs = (SELECT max(pairs) FROM j)
        |        ORDER BY k DESC LIMIT 1) AS max_key
        |FROM j""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      graft.operators.Analyze.joinCardinality(li, "l_suppkey",
        li, "l_suppkey")
    }
  )

  /** DuckDB Rabin–Karp Horner fold over an ASCII varchar column `c`:
    * h = fold(h*257 + codepoint) mod 2^61−1 — byte-identical to the
    * codegen'd rolling_hash64 on the ASCII corpus (same contract as the
    * winnowing gates). */
  private def sqlHorner(c: String): String =
    s"""CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
       |       list_transform(range(1, length($c) + 1),
       |         i -> CAST(ord($c[i]) AS HUGEINT))),
       |     (h, x) -> (h * 257 + x) % 2305843009213693951) AS BIGINT)"""
      .stripMargin
}
