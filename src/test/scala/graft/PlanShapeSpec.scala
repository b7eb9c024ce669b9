package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Tables.t
import graft.operators.{Dedup, GlobalRank}

/** Physical-plan shape assertions — the 100 TB contract, checked in CI:
  * filters and projections must reach the parquet scan, dimension joins
  * must broadcast, per-row signature work must stay scan-local (no
  * exchange), rankings must never collapse to one partition, and custom
  * expressions must not break whole-stage codegen. A regression in any of
  * these is invisible at sf0.001 wall-clock but fatal at cluster scale.
  */
class PlanShapeSpec extends SparkSpec {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter and projection push down to the parquet scan") {
    val df = t(spark, sf001, "lineitem")
      .where(col("l_partkey") === 5L)
      .select("l_partkey", "l_quantity")
    val plan = physical(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_partkey), EqualTo(l_partkey,5)"),
      s"filter not pushed:\n$plan")
    // column pruning: the scan must read 2 columns, not all 16
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_partkey") &&
      readSchema.contains("l_quantity") && !readSchema.contains("l_comment"),
      s"projection not pruned: $readSchema")
  }

  test("dimension-side joins broadcast instead of shuffling the fact side") {
    val plan = physical(SparkEntry.queries("q_join_inner")(spark, sf001))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("minhash signatures are a scan-local projection (no exchange)") {
    graft.expressions.MinHash.register(spark)
    val sigs = t(spark, sf001, "documents")
      .selectExpr("doc_id", "minhash_sig(word_shingles(text, 5), 8) AS sig")
    val plan = physical(sigs)
    assert(!plan.contains("Exchange"),
      s"signature computation must not shuffle:\n$plan")
    // whole-stage codegen renders as a "*(n)" stage prefix in plan text
    assert(plan.contains("*("),
      s"signature expressions fell out of codegen:\n$plan")
  }

  test("hyperplane sketch is scan-local and codegen'd") {
    graft.expressions.HyperplaneSig64.register(spark)
    val sigs = t(spark, sf001, "embeddings")
      .selectExpr("vec_id",
        "hyperplane_sig64(CAST(embedding AS ARRAY<DOUBLE>)) AS sig")
    val plan = physical(sigs)
    assert(!plan.contains("Exchange"), s"sketch must not shuffle:\n$plan")
    assert(plan.contains("*("),
      s"sketch fell out of codegen:\n$plan")
  }

  test("GlobalRank never collapses a LARGE frame to a single partition") {
    // r20: the rank-shuffle width is size-ADAPTIVE (derived from the
    // optimizer's byte estimate, capped at the session shuffle width),
    // so the 100 TB contract is now conditional on size — a frame whose
    // estimate spans many target-size partitions must stay distributed
    // (this pin), while a leaderboard-sized frame may legitimately rank
    // in one partition (pinned below). spark.range carries an exact
    // 8-byte/row estimate, so 100M rows ≈ 800 MB >> the 32 MB target.
    val df = spark.range(0, 100000000L).selectExpr("id", "id % 97 AS v")
    val ranked = GlobalRank.withRowNumber(df.where(col("id") < 20000),
      "r", Seq(desc("v"), asc("id")),
      numPartitions = Some(GlobalRank.adaptiveParts(df)))
    assert(ranked.rdd.getNumPartitions > 1,
      "global ranking of a large frame must stay distributed")
    assert(GlobalRank.adaptiveParts(df) ==
      spark.sessionState.conf.numShufflePartitions,
      "a multi-hundred-MB estimate must derive the full session width")
  }

  test("GlobalRank width adapts DOWN for tiny frames and honors an " +
      "explicit override") {
    val tiny = spark.range(0, 10000).selectExpr("id", "id % 97 AS v")
    assert(GlobalRank.adaptiveParts(tiny) == 1,
      "a KB-sized estimate should rank in one partition, not pay " +
        "session-width tiny tasks")
    val ranked = GlobalRank.withRowNumber(tiny, "r",
      Seq(desc("v"), asc("id")), numPartitions = Some(3))
    assert(ranked.rdd.getNumPartitions >= 3,
      "an explicit numPartitions override must be honored")
    // identical ranks at any width — the total order defines the result
    val r1 = GlobalRank.withRowNumber(tiny, "r", Seq(desc("v"), asc("id")))
      .orderBy("r").collect().map(_.toSeq)
    val r3 = ranked.orderBy("r").collect().map(_.toSeq)
    assert(r1.sameElements(r3), "ranks must be width-independent")
  }

  test("load-date partitioned layout prunes partitions at the scan") {
    import graft.sources.Formats
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = spark.range(0, 1000)
      .selectExpr("id", "CAST(id % 7 AS STRING) AS load_date")
    Formats.overwrite(df, dir, partitionBy = Seq("load_date"))
    val read = spark.read.parquet(dir).where(col("load_date") === "3")
    val plan = physical(read)
    // the filter must be a PartitionFilter (directory pruning), not a
    // post-scan DataFilter over all 7 partitions
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("load_date"),
      s"partition filter not pushed to the scan:\n$plan")
    assert(read.count() == 1000 / 7 + (if (3 < 1000 % 7) 1 else 0))
  }

  test("exact dedup aggregates with map-side partials (no raw-row shuffle)") {
    val plan = physical(Dedup.exactDuplicates(
      t(spark, sf001, "documents"), "doc_id", "text"))
    // partial_min before the exchange proves the canonical-id agg combines
    // map-side; the shuffle carries one row per (fingerprint, partition)
    assert(plan.contains("partial_min") || plan.contains("partial_first"),
      s"no map-side partial aggregation:\n$plan")
  }

  test("zorder key is scan-local and codegen'd") {
    graft.expressions.ZOrder62.register(spark)
    val keyed = t(spark, sf001, "lineitem")
      .selectExpr("l_orderkey", "zorder62(l_partkey, l_suppkey) AS zkey")
    val plan = physical(keyed)
    assert(!plan.contains("Exchange"), s"zorder key must not shuffle:\n$plan")
    assert(plan.contains("*("), s"zorder62 fell out of codegen:\n$plan")
  }

  test("range join plans as an equi join on the bucket, not a nested loop") {
    val plan = physical(SparkEntry.queries("q_join_range")(spark, sf001))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to an O(n*m) join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi join on the manufactured bucket key:\n$plan")
  }

  test("EXISTS / NOT EXISTS rewrite to semi and anti joins") {
    val plan = physical(SparkEntry.queries("q_filter_exists")(spark, sf001))
    assert(plan.contains("LeftSemi"), s"EXISTS not a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n$plan")
  }

  test("minhash_union aggregates partially before the exchange") {
    val plan = physical(Dedup.groupMinhashSimilarity(
      t(spark, sf001, "documents"), "source", "text", k = 3, m = 16))
    // the custom TypedImperativeAggregate must combine map-side: one
    // m-wide partial per (group, task) crosses the wire, not per-doc sigs
    assert(plan.contains("partial_minhash_union"),
      s"no map-side partial for the union sketch:\n$plan")
  }

  test("per-group top-k filters push a partial group limit below the shuffle") {
    val plan = physical(
      SparkEntry.queries("q_sample_stratified")(spark, sf001))
    val limits = plan.sliding("WindowGroupLimit".length)
      .count(_ == "WindowGroupLimit")
    // one partial (map-side, before the exchange) + one final: only ~k rows
    // per group per partition ever shuffle, not the whole stratum
    assert(limits >= 2,
      s"rank<=k filter did not push a partial WindowGroupLimit:\n$plan")
  }

  test("hammingTopK shortlist pushes a partial WindowGroupLimit and " +
      "broadcasts the query side") {
    import graft.operators.Similarity
    val emb = t(spark, sf001, "embeddings")
    val plan = physical(Similarity.hammingTopK(emb,
      emb.where(col("vec_id") < 5), k = 10, shortlist = 50))
    val limits = plan.sliding("WindowGroupLimit".length)
      .count(_ == "WindowGroupLimit")
    // partial (map-side, pre-exchange) + final: each task forwards at
    // most `shortlist` sketch rows per query — the corpus never shuffles
    assert(limits >= 2,
      s"hamming shortlist did not push a partial WindowGroupLimit:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"query side not broadcast:\n$plan")
  }

  test("validation report reads the table once, whatever the rule count") {
    import graft.operators.Validate
    val plan = physical(Validate.report(t(spark, sf001, "orders"), Seq(
      "a" -> col("o_totalprice").gt(0),
      "b" -> col("o_orderstatus").isin("O", "F", "P"),
      "c" -> col("o_orderkey").isNotNull)))
    val scans = plan.sliding("Scan parquet".length)
      .count(_ == "Scan parquet")
    assert(scans == 1, s"expected one scan for 3 rules, saw $scans:\n$plan")
    assert(plan.contains("partial_sum"),
      s"rule counters must combine map-side:\n$plan")
  }

  test("sessionization is one exchange per key (lag and sum share it)") {
    import graft.operators.Sessionize
    val plan = physical(Sessionize.assign(t(spark, sf001, "events"),
      Seq("user_id"), "ts", 21600L, Seq(col("event_id"))))
    val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges == 1,
      s"expected exactly one exchange, saw $exchanges:\n$plan")
  }

  test("drift top-k plans as TakeOrdered over partial aggs (no full sort)") {
    val plan = physical(SparkEntry.queries("q_drift_tokens")(spark, sf001))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k drift must not materialize a global sort:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"token counts must combine map-side:\n$plan")
  }

  test("novelty joins the shingle-frequency table, never a cartesian") {
    val plan = physical(SparkEntry.queries("q_text_novelty")(spark, sf001))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"novelty fell to an O(n*m) join:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"shingle frequencies must hash-aggregate:\n$plan")
    graft.operators.OperatorCaches.releaseAll(spark)
  }

  test("novelty derives the shingle explode ONCE (staged), feeding both " +
      "join sides from the cache") {
    // the staging persist turns the double tokenize+explode (one per
    // join side — two full corpus scans at 100 TB) into a single
    // Generate inside the cached plan, read back via InMemoryTableScan
    // on BOTH sides
    val df = SparkEntry.queries("q_text_novelty")(spark, sf001)
    val plan = physical(df)
    // a Generate is fine INSIDE the InMemoryRelation's cached-plan
    // rendering (that's the one staged derivation); any Generate in the
    // live tree means a join side re-derives the explode from source
    def indent(l: String): Int = l.indexWhere(_.isLetter)
    var cachedDepth = -1
    var outerGenerates = 0
    for (l <- plan.linesIterator; i = indent(l); if i >= 0) {
      if (cachedDepth >= 0 && i <= cachedDepth) cachedDepth = -1
      if (l.contains("Generate") && cachedDepth < 0) outerGenerates += 1
      if (l.contains("InMemoryRelation") && cachedDepth < 0) cachedDepth = i
    }
    assert(plan.contains("InMemoryTableScan"),
      s"shingle frame is not staged:\n$plan")
    assert(outerGenerates == 0,
      s"explode re-derived outside the staged frame:\n$plan")
    graft.operators.OperatorCaches.releaseAll(spark)
  }

  test("MMR shortlist broadcasts the queries onto one corpus pass, " +
      "window partitioned per query") {
    val emb = t(spark, sf001, "embeddings")
    val plan = physical(graft.operators.Similarity.mmrShortlist(
      emb, emb.where(col("vec_id") < 3), shortlist = 10))
    assert(plan.contains("BroadcastExchange"),
      s"queries must broadcast onto the corpus scan:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"shortlist cut must partition by qid, not globally:\n$plan")
  }

  test("exact jaccard join derives the staged postings ONCE, feeding " +
      "both self-join sides from the cache") {
    import graft.operators.{Dedup, StagingCaches}
    val docs = t(spark, sf001, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
    val plan = physical(
      Dedup.jaccardJoinExact(docs, "doc_id", "toks"))
    // both the posting self-join sides and both verify sides must read
    // InMemoryTableScan; any Generate OUTSIDE a cached plan means a
    // side re-derives the explode chain from source (two full corpus
    // scans at 100 TB)
    def indent(l: String): Int = l.indexWhere(_.isLetter)
    var cachedDepth = -1
    var outerGenerates = 0
    for (l <- plan.linesIterator; i = indent(l); if i >= 0) {
      if (cachedDepth >= 0 && i <= cachedDepth) cachedDepth = -1
      if (l.contains("Generate") && cachedDepth < 0) outerGenerates += 1
      if (l.contains("InMemoryRelation") && cachedDepth < 0) cachedDepth = i
    }
    val imtsCount = plan.linesIterator
      .count(_.contains("InMemoryTableScan"))
    assert(imtsCount >= 2,
      s"staged postings must feed both join sides ($imtsCount):\n$plan")
    assert(outerGenerates == 0,
      s"posting derivation re-derived outside the cache:\n$plan")
    StagingCaches.releaseCaches(spark)
  }

  test("suffix-array distributed build stays multi-partition for a " +
      "wide rank width; the LCP descent plans no single-partition " +
      "exchange beyond it") {
    import graft.operators.SuffixArray
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"abcab${i % 7}xy${i % 3}"))
      .toDF("doc_id", "text").repartition(8)
    // r20: the rank shuffle inherits GlobalRank's size-ADAPTIVE width,
    // so this 40-doc fixture legitimately ranks in ONE partition (the
    // adaptive derivation itself — tiny shrinks, large hits the session
    // cap — is pinned in the GlobalRank tests above). The suffix
    // contract pinned here is that build honors a WIDE width when the
    // data (or caller) demands one: forced to 6 partitions, ranks stay
    // at 6 and the LCP descent introduces no single-partition funnel.
    val b = SuffixArray.build(docs, localThreshold = 0,
      rankPartitions = Some(6))
    assert(b.ranks.rdd.getNumPartitions > 1,
      "suffix ranks must honor a distributed rank width")
    val lcp = SuffixArray.adjacentLcp(b, rankPartitions = Some(6))
    assert(!physical(lcp).contains("SinglePartition"),
      s"LCP binary descent collapsed to one partition:\n${physical(lcp)}")
  }

  test("cross-format hash gate: two scan-local decode pipelines meet in " +
      "one broadcast equi-join, no decode re-derivation") {
    val df = SparkEntry.queries("q_image_crossformat_hash")(spark, sf001)
    val plan = physical(df)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin"),
      s"twin sides must meet in an equi join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"cross-format comparison must never go all-pairs:\n$plan")
    // each side decodes once: exactly two MapPartitions decode stages
    val decodes = plan.linesIterator.count(_.contains("MapPartitions"))
    assert(decodes <= 4, // 2 decode + 2 fixture-build object stages
      s"decode pipelines re-derived ($decodes MapPartitions):\n$plan")
  }

  test("export manifest never plans a window (prefix sum is distributed)") {
    val plan = physical(SparkEntry.queries("q_export_manifest")(spark, sf001))
    assert(!plan.contains("Window"),
      s"manifest must ride the packer's distributed prefix sum, " +
        s"not a window:\n$plan")
  }

  test("math/expression gates stay inside whole-stage codegen") {
    // IEEE-exact math (q_expr_math) and the simhash signature path must
    // plan as a codegen'd projection over the scan — an interpreted
    // Expression here would be a per-row virtual call at 100 TB.
    for (name <- Seq("q_expr_math", "q_expr_cleanse", "q_expr_digits")) {
      val df = SparkEntry.queries(name)(spark, sf001)
      df.collect() // AQE prints codegen stars only on the executed final plan
      val plan = physical(df).split("== Initial Plan ==").head
      assert(plan.contains("*("),
        s"$name fell out of whole-stage codegen:\n$plan")
      assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"),
        s"$name routed through a UDF:\n$plan")
    }
  }

  test("incremental dedup prunes corpus bands with a broadcast semi join") {
    // the O(batch + matching buckets) bound requires the corpus band
    // table to be filtered map-side against the (small, broadcast) batch
    // band keys BEFORE the hot-bucket window shuffles anything
    val docs = t(spark, sf001, "documents")
    val index = Dedup.signatureIndex(docs.limit(100), "doc_id", "text")
    val batch = docs.where(col("doc_id") >= 400).limit(5)
    val plan = physical(
      Dedup.incrementalLshPairs(index, batch, "doc_id", "text"))
    // pin the LeftSemi NODE itself to a broadcast join — a shuffled
    // SortMergeJoin LeftSemi would satisfy two independent substring
    // checks (other broadcast joins always exist in this plan)
    val semiLines = plan.linesIterator.filter(_.contains("LeftSemi")).toSeq
    assert(semiLines.nonEmpty &&
      semiLines.forall(_.contains("BroadcastHashJoin")),
      s"corpus bands are not broadcast-semi-pruned:\n$plan")
  }

  test("simhash recall gate's brute leg is bounded, banded leg shuffles once on (band, key)") {
    val subset = t(spark, sf001, "documents").orderBy("doc_id").limit(50)
    val plan = physical(Dedup.simhashBrutePairs(subset, "doc_id", "text",
      maxHamming = 6, maxDocs = 50))
    // the O(n²) leg must carry the row-cap limit — never a free cross join
    assert(plan.contains("GlobalLimit") || plan.contains("TakeOrdered"),
      s"brute leg lost its bound:\n$plan")
  }

  test("HLL sketches aggregate partially below every exchange") {
    // the mergeable-sketch contract physically: executors fold rows into
    // sketch buffers scan-side (partial_hll_sketch_agg) and only sketch
    // bytes cross the wire — for both the build and the union levels
    val li = t(spark, sf001, "lineitem")
    val plan = physical(li
      .groupBy(col("l_returnflag"), col("l_linenumber"))
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est")))
    assert(plan.contains("partial_hll_sketch_agg"),
      s"sketch build does not combine map-side:\n$plan")
    assert(plan.contains("partial_hll_union_agg"),
      s"sketch union does not combine map-side:\n$plan")
  }

  test("temperature sampling broadcasts the rate table onto the corpus scan") {
    import graft.operators.Sampling
    val docs = t(spark, sf001, "documents")
    val plan = physical(Sampling.temperatureSample(docs, "lang", "doc_id",
      "n_chars", 2.0, 60000L))
    // the corpus-side join must be broadcast — a shuffled join here would
    // re-exchange the full corpus to sample it
    val joinLines = plan.linesIterator
      .filter(l => l.contains("Join") && l.contains("lang")).toSeq
    assert(joinLines.nonEmpty &&
      joinLines.forall(_.contains("BroadcastHashJoin")),
      s"rate table not broadcast:\n$plan")
  }

  test("delete cascade probes with broadcast joins only") {
    val df = SparkEntry.queries("q_delete_cascade")(spark, sf001)
    df.collect() // resolve AQE so the final join strategies are pinned
    val plan = physical(df).split("== Initial Plan ==").head
    assert(!plan.contains("SortMergeJoin"),
      s"forget-set propagation must broadcast, not shuffle the facts:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("segment ownership aggregates partially — no window funnel, no rank") {
    // min(struct(id, pos)) per segment must combine map-side: a
    // boilerplate segment repeated everywhere forwards one candidate per
    // map task. A window-rank formulation would shuffle every copy to
    // one reducer per segment — assert it is absent.
    val plan = physical(Dedup.dedupCorpusSegments(
      t(spark, sf001, "documents"), "doc_id", "text", segWords = 10))
    assert(plan.contains("partial_min"),
      s"segment ownership does not combine map-side:\n$plan")
    assert(!plan.contains("Window"),
      s"segment ownership must not use a window:\n$plan")
  }

  test("winnowed fingerprints are a scan-local codegen'd projection") {
    graft.expressions.Winnow.register(spark)
    val plan = physical(t(spark, sf001, "documents")
      .selectExpr("doc_id", "winnow_fingerprints(text, 12, 8) AS fps"))
    assert(!plan.contains("Exchange"),
      s"fingerprinting must not shuffle:\n$plan")
    // whole-stage codegen stages print as "*(n)" in the physical plan
    assert(plan.contains("*(1)"),
      s"winnow_fingerprints fell out of codegen:\n$plan")
  }

  test("bpe_encode is a scan-local codegen'd projection") {
    graft.expressions.Bpe.register(spark)
    val mp = java.nio.file.Files.createTempFile("plan_merges", ".txt")
    java.nio.file.Files.writeString(mp, "t h\nth e\n")
    val vp = java.nio.file.Files.createTempFile("plan_vocab", ".txt")
    java.nio.file.Files.writeString(vp, "t\nh\ne\nth\nthe\n")
    val ids = t(spark, sf001, "documents")
      .selectExpr("doc_id", s"bpe_encode(text, '$mp', '$vp') AS ids")
    val plan = physical(ids)
    assert(!plan.contains("Exchange"),
      s"token-id encoding must not shuffle:\n$plan")
    assert(plan.contains("*("),
      s"bpe_encode fell out of whole-stage codegen:\n$plan")
  }

  test("fingerprint-replay dedup pushes a partial WindowGroupLimit " +
      "below the fingerprint exchange") {
    val plan = physical(
      SparkEntry.queries("q_stream_dedup_replay")(spark, sf001))
    val limits = plan.sliding("WindowGroupLimit".length)
      .count(_ == "WindowGroupLimit")
    assert(limits >= 2,
      s"first-arrival filter did not push a partial WindowGroupLimit:\n$plan")
  }

  test("multi-interval span removal windows stay partitioned by document") {
    val plan = physical(
      SparkEntry.queries("q_dedup_span_removal_multi")(spark, sf001))
    // gaps-and-islands + segment windows must ride doc-id partitions —
    // a global (single-partition) window here would funnel the corpus
    // through one task at 100 TB
    assert(!plan.contains("SinglePartition"),
      s"span-removal window collapsed to a single partition:\n$plan")
  }

  test("vec_mean aggregates partially below the exchange") {
    graft.expressions.VecMean.register(spark)
    val plan = physical(t(spark, sf001, "embeddings")
      .groupBy("label").agg(expr("vec_mean(embedding)").as("c")))
    assert(plan.contains("partial_vec_mean"),
      s"vector mean does not combine map-side:\n$plan")
  }

  test("deterministic shuffle keeps many partitions and uses no window") {
    import graft.operators.Sampling
    val out = Sampling.deterministicShuffle(
      t(spark, sf001, "documents").select("doc_id"), "doc_id", "epoch1")
    // the result is materialized through GlobalRank — the scale contract
    // is no Window operator and a size-ADAPTIVE width (r20): this
    // KB-scale fixture legitimately lands in one partition; the
    // width derivation (tiny shrinks, large hits the session cap) and
    // width-independence of ranks are pinned in the GlobalRank tests.
    assert(!physical(out).contains("Window"),
      s"epoch shuffle must not plan a window:\n${physical(out)}")
  }

  test("BM25 prunes postings with a broadcast of the query terms") {
    import graft.operators.Bm25
    import spark.implicits._
    val queries = Seq((1L, "spark"), (2L, "table")).toDF("query_id", "term")
    val plan = physical(
      Bm25.topK(t(spark, sf001, "documents"), queries, k = 10))
    // the posting explode must meet the query terms in a BroadcastHashJoin
    // BEFORE any aggregation exchange — the corpus vocabulary never shuffles
    assert(plan.contains("BroadcastHashJoin"),
      s"query terms did not broadcast onto the posting stream:\n$plan")
    val gen = plan.indexOf("Generate explode")
    val bhj = plan.indexOf("BroadcastHashJoin")
    assert(gen >= 0 && bhj >= 0 && bhj < gen,
      s"pruning join is not directly above the scan-side explode:\n$plan")
  }

  test("domain cap anti-joins the blocklist broadcast and caps map-side") {
    import graft.operators.Curation
    val kept = Curation.domainCap(
      t(spark, sf001, "documents").select("source", "doc_id", "n_chars"),
      "source", cap = 12,
      order = Seq(col("n_chars").desc, col("doc_id").asc),
      blocklist = Seq("src0", "src13"))
    val plan = physical(kept)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"blocklist did not broadcast anti-join:\n$plan")
    val limits = plan.sliding("WindowGroupLimit".length)
      .count(_ == "WindowGroupLimit")
    assert(limits >= 2,
      s"domain cap did not push a partial WindowGroupLimit:\n$plan")
  }

  test("url canonicalization is a scan-local codegen'd projection") {
    val plan = physical(t(spark, sf001, "documents")
      .select(col("doc_id"),
        graft.operators.Curation.canonicalUrl(
          concat(lit("http://Example.com/a/"),
            col("doc_id").cast("string"))).as("canon")))
    assert(!plan.contains("Exchange"),
      s"url canonicalization must not shuffle:\n$plan")
    assert(plan.contains("*("),
      s"canonicalUrl fell out of whole-stage codegen:\n$plan")
  }

  test("html strip is a scan-local codegen'd projection") {
    val plan = physical(t(spark, sf001, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.stripHtml(col("text")).as("s")))
    assert(!plan.contains("Exchange"),
      s"html strip must not shuffle:\n$plan")
    assert(plan.contains("*("),
      s"stripHtml fell out of whole-stage codegen:\n$plan")
  }

  test("packed-export boundary offsets never use a single-partition window") {
    val plan = physical(
      SparkEntry.queries("q_export_tokens_mask")(spark, sf001))
    // the only windows are partitioned by bin — a window whose spec does
    // not lead with the bin key would funnel the corpus through one task
    val winLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, s"no window found in packed export:\n$plan")
    winLines.foreach { ln =>
      assert(ln.contains("windowspecdefinition(bin"),
        s"window not partitioned by bin:\n$ln")
    }
  }

  test("bloom join probes the fact scan-side: broadcast words, no fact " +
      "exchange before the bit filter") {
    import graft.operators.Sketches
    val fact = t(spark, sf001, "lineitem").select("l_suppkey", "l_quantity")
    val dim = t(spark, sf001, "supplier").where(col("s_nationkey") === 5)
      .select("s_suppkey")
    val plan = physical(Sketches.bloomJoin(fact, dim,
      "l_suppkey", "s_suppkey"))
    // the filter words reach the fact rows via broadcast (nested-loop on
    // the one-row words frame + broadcast hash for the exact join)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"words not broadcast:\n$plan")
    // the fact side must NOT shuffle: every non-broadcast exchange in the
    // plan belongs to the KB-sized words build (the distinct-keys and
    // word-densify aggregations) — none may partition on the fact key
    val exchanges = plan.linesIterator
      .filter(ln => ln.contains("Exchange") &&
        !ln.contains("BroadcastExchange")).toSeq
    assert(exchanges.forall(!_.contains("l_suppkey")),
      s"fact side shuffled before the bloom filter:\n${exchanges.mkString("\n")}")
  }

  test("sorted-neighborhood pairing is rank-to-rank equi joins, never a " +
      "cross product") {
    import graft.operators.FuzzyJoin
    val recs = t(spark, sf001, "customer")
      .select(col("c_custkey").as("rid"), col("c_name").as("name"))
    val plan = physical(FuzzyJoin.sortedNeighborhood(recs, "rid", "name",
      window = 3, maxDist = 1))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"SNM fell back to a cross product:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"no equi join on the neighbor rank:\n$plan")
  }

  test("join-cardinality pre-flight aggregates map-side and never " +
      "materializes the join") {
    val li = t(spark, sf001, "lineitem")
    val plan = physical(graft.operators.Analyze.joinCardinality(
      li, "l_suppkey", li, "l_suppkey"))
    // partial aggregation below the exchange on both sides
    assert(plan.contains("partial_count"),
      s"per-key counts not map-side combined:\n$plan")
    // the only join is key-sized (per-key counts), after both aggregations
    assert(!plan.contains("CartesianProduct"),
      s"cardinality estimate planned a cross product:\n$plan")
  }

  test("CDC apply shuffles the changelog once for the argmax and anti-joins " +
      "the snapshot on the same key") {
    val plan = physical(
      SparkEntry.queries("q_cdc_apply")(spark, sf001))
    // the per-key latest-change argmax must be a pk-partitioned window
    val winLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains(
      "windowspecdefinition(k")),
      s"changelog argmax not partitioned by pk:\n${winLines.mkString("\n")}")
  }

  test("exact jaccard join meets through prefix postings, never all-pairs") {
    val plan = physical(
      SparkEntry.queries("q_dedup_jaccard_exact")(spark, sf001))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"prefix-filtered set-similarity join fell back to O(n^2):\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi join on the posting token:\n$plan")
  }

  test("image near-dup pairs meet through the band equi-join, never " +
      "all-pairs") {
    val plan = physical(
      SparkEntry.queries("q_image_neardup")(spark, sf001))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"perceptual-hash pairing fell back to O(n^2):\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi join on the (band, value) key:\n$plan")
  }

  test("audio near-dup pairs meet through the band equi-join, never " +
      "all-pairs") {
    val plan = physical(
      SparkEntry.queries("q_audio_neardup")(spark, sf001))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"acoustic-fingerprint pairing fell back to O(n^2):\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi join on the (band, value) key:\n$plan")
  }

  test("video near-dup pairs meet through the frame-hash posting join, " +
      "never all-pairs") {
    val plan = physical(
      SparkEntry.queries("q_video_neardup")(spark, sf001))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"shared-scene pairing fell back to O(n^2):\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi join on the frame hash:\n$plan")
  }

  test("suffix-array distributed path (doubling + LCP descent) never " +
      "plans a window or cross join") {
    import spark.implicits._
    val docs = Seq((1L, "banana"), (2L, "bandana"), (3L, "anab"))
      .toDF("doc_id", "text")
    // localThreshold = 0 pins the distributed loop (the gate's default
    // elects the bounded driver-local sort at these sizes)
    val b = graft.operators.SuffixArray.build(docs, localThreshold = 0)
    val plan = physical(graft.operators.SuffixArray.adjacentLcp(b))
    assert(!plan.contains("Window"),
      s"doubling/descent must rank via GlobalRank, not a window:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"descent join fell back to O(n^2):\n$plan")
  }

  test("pareto frontier joins back on the x key, never a self cross") {
    val plan = physical(
      SparkEntry.queries("q_curate_pareto")(spark, sf001))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"skyline fell back to the all-pairs domination test:\n$plan")
  }

  test("ROC-AUC aggregates per distinct score with no window and no " +
      "row-level rank") {
    val plan = physical(SparkEntry.queries("q_eval_auc")(spark, sf001))
    assert(!plan.contains("Window"),
      s"rank-sum AUC must use the bounded prefix scan, not a window:\n$plan")
  }

  test("IVFADC shortlist joins the codes scan against BROADCAST probe " +
      "tables, never a cartesian; hilbert key stays scan-local codegen") {
    import graft.operators.IvfPq
    val emb = t(spark, sf001, "embeddings")
    val plan = physical(IvfPq.ivfpqTopK(emb,
      emb.where(col("vec_id") < 3), k = 5, nClusters = 8, nProbe = 2))
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("CartesianProduct"),
      s"ADC pass must be a broadcast equi-join on the cell id:\n$plan")
    graft.expressions.Hilbert62.register(spark)
    val hp = physical(t(spark, sf001, "lineitem")
      .selectExpr("hilbert62(l_partkey, l_suppkey) AS h"))
    assert(!hp.contains("Exchange") && hp.contains("*("),
      s"hilbert62 must be a scan-local codegen'd projection:\n$hp")
  }

  test("MaxSim is one corpus pass + two partial-aggregations — no " +
      "self-join, no corpus-side window before the final rank") {
    import graft.operators.MaxSim
    val emb = t(spark, sf001, "embeddings")
    val docToks = MaxSim.subvectorTokens(emb, "vec_id", "embedding", 8)
      .withColumnRenamed("vec_id", "doc_id")
    val qToks = MaxSim.subvectorTokens(
        emb.where(col("vec_id") < 2), "vec_id", "embedding", 8)
      .withColumnRenamed("vec_id", "query_id")
    val plan = physical(MaxSim.maxSimTopK(docToks, qToks, k = 5))
    // the query side is tiny and rides a broadcast nested-loop on the
    // self-exclusion predicate; the doc-token frame appears once
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"query tokens must broadcast onto one doc-token pass:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      s"MaxSim must never shuffle-join or cross the corpus:\n$plan")
    // exactly the two aggregations (partial+final each) and ONE window
    assert(plan.split("HashAggregate").length - 1 == 4,
      s"expected 2 aggregations (partial+final):\n$plan")
  }

  test("native session_window sessionization shuffles once on the key") {
    val plan = physical(
      SparkEntry.queries("q_events_session_window")(spark, sf001))
    // one hash exchange for the session aggregation (plus the
    // presentation sort's range exchange)
    val hashEx = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashEx == 1,
      s"expected one hash exchange for session_window, got $hashEx:\n$plan")
  }

  test("bloom-layout point lookup pushes the IN predicate to the " +
      "parquet scan") {
    // the reader-side bloom row-group skip only engages for predicates
    // that reach the scan — an unpushed IN filters post-read and the
    // bloom bytes are dead weight
    val plan = physical(
      SparkEntry.queries("q_layout_parquet_bloom")(spark, sf001))
    assert(plan.contains("PushedFilters: [In(o_custkey"),
      s"IN predicate not pushed to the bloom-enabled scan:\n$plan")
    val readSchema = plan.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(!readSchema.contains("o_orderkey"),
      s"projection not pruned on the bloom-enabled scan: $readSchema")
  }

  test("maxsim index fetch prunes candidates with a broadcast SEMI join, " +
      "never an isin literal list, and partition-filters on doc_bucket") {
    import graft.operators.MaxSim
    val emb = t(spark, sf001, "embeddings")
    val docToks = MaxSim.subvectorTokens(emb, "vec_id", "embedding", 8)
      .withColumnRenamed("vec_id", "doc_id")
    val qToks = MaxSim.subvectorTokens(
        emb.where(col("vec_id") < 3), "vec_id", "embedding", 8)
      .withColumnRenamed("vec_id", "query_id")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_plan_maxsim").toString
    MaxSim.writeTokenIndex(docToks, dir, nClusters = 8)
    val plan = physical(MaxSim.searchTokenIndex(spark, dir, qToks,
      k = 5, nProbe = 2, tokenTopT = 8))
    // the r15 ADVICE hazard: an isin over candIds embeds up to
    // |q|·tokenTopT literals into the plan — the prune must be a
    // broadcast LeftSemi against the local candidate relation instead
    assert(plan.contains("LeftSemi"),
      s"candidate prune lost its broadcast semi join:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("doc_bucket"),
      s"fetch lost the doc_bucket partition filter:\n$plan")
    // doc_id appears in join keys; an INSET/IN over it at the scan's
    // row-filter line would be the literal-list regression
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(!pushed.contains("In(doc_id"),
      s"candidate ids leaked back into a pushed literal list: $pushed")
  }
}
