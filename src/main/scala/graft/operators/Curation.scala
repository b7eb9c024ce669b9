package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-level corpus curation: the per-source controls a web-scale
  * training pipeline applies BEFORE document-level filtering — drop
  * blocklisted domains entirely, then cap each surviving domain's
  * contribution so no single crawl host dominates the mixture.
  *
  * Scale shape: the blocklist is a literal broadcast anti-join (never a
  * shuffle of the corpus), and the cap is a per-domain top-k window whose
  * k stays at or below `spark.sql.optimizer.windowGroupLimitThreshold`,
  * so it plans a PARTIAL WindowGroupLimit under the exchange — a hot
  * domain with a billion pages forwards at most k rows per map task
  * (the q_dedup_skew_cap lesson, applied to curation).
  */
object Curation {

  /** Embedding-space decontamination — the semantic complement of the
    * n-gram overlap check (`q_text_decontaminate`): flag every training
    * vector whose cosine against ANY test/benchmark vector reaches
    * `threshold`, catching paraphrases and format-shifted copies that
    * share no 8-gram. Returns every train row as (vec_id, contaminated,
    * n_hits, best_tid) with `best_tid` the lowest matching test id —
    * keep `WHERE NOT contaminated`, audit the rest.
    *
    * Scale shape: benchmarks are small and corpora are not, so the TEST
    * side broadcasts and the train side is ONE scan with scan-local
    * cosine scoring + map-side-combinable aggregation — no shuffle of
    * the corpus, no LSH recall risk (this check must not miss; exact
    * scoring over a broadcast test set is both exact and the cheap
    * direction). Scores round to 4 dp before the threshold compare so
    * the decision replays bit-identically cross-engine. */
  def decontaminateByEmbedding(train: DataFrame, test: DataFrame,
                               threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.{asDouble, cosine}
    val tr = train.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val te = test.select(col("vec_id").as("tid"),
      asDouble(col("embedding")).as("tv"))
    tr.join(broadcast(te), expr("true"))
      .withColumn("cs",
        graft.functions.Rounding.round4(cosine(col("v"), col("tv"))))
      .groupBy("vec_id")
      .agg(sum(when(col("cs") >= threshold, 1L).otherwise(0L))
          .as("n_hits"),
        min(when(col("cs") >= threshold, col("tid"))).as("best_tid"))
      .select(col("vec_id"), (col("n_hits") > 0).as("contaminated"),
        col("n_hits"), col("best_tid"))
  }

  /** Quality-constrained selection under a token budget — the decision a
    * pretraining data team actually makes: fill `totalBudget` weight
    * (tokens/chars) with the best-`order` rows while no domain exceeds
    * `perDomainCap`. Two-stage greedy with DEFINED semantics: stage 1
    * walks each domain in `order` and keeps rows while the domain's
    * inclusive running weight stays ≤ cap; stage 2 walks the survivors
    * in the same global order and keeps rows while the global running
    * weight stays ≤ budget. Deterministic given a total `order` (pass
    * quality desc + id); both stages replay exactly in SQL windows, so
    * the kept SET hash-gates.
    *
    * Scale shape: stage 1 is a domain-partitioned window — fine while
    * single domains fit a task's window (the lengthBucketBatches
    * contract: more/finer domains, not bigger windows); a mega-domain
    * upgrade runs stage 1 as one [[Packing.runningTotal]] per oversized
    * domain. Stage 2 IS [[Packing.runningTotal]] — range exchange, one
    * scalar per partition, never a single-task window over the corpus. */
  def selectUnderBudget(df: DataFrame, domainCol: String, weightCol: String,
                        order: Seq[Column], perDomainCap: Long,
                        totalBudget: Long): DataFrame = {
    require(perDomainCap > 0 && totalBudget > 0,
      s"cap/budget must be positive: $perDomainCap/$totalBudget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(domainCol).orderBy(order: _*)
    val surv = df.withColumn("__dcum", sum(col(weightCol)).over(w))
      .where(col("__dcum") <= perDomainCap)
      .drop("__dcum")
    Packing.runningTotal(surv, order, weightCol)
      .where(col("cum") <= totalBudget)
      .drop("cum")
  }

  /** Rows of `df` minus blocklisted domains, keeping the top `cap` rows
    * per domain by `order` (callers pass a total order — quality desc
    * with an id tiebreak — so the kept set is deterministic). */
  def domainCap(df: DataFrame, domainCol: String, cap: Int,
                order: Seq[Column], blocklist: Seq[String]): DataFrame = {
    require(cap > 0 && cap <= 1000,
      s"cap must be in (0, 1000] to keep the partial WindowGroupLimit, got $cap")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val blocked = blocklist.toDF(domainCol)
    val w = Window.partitionBy(col(domainCol)).orderBy(order: _*)
    df.join(broadcast(blocked), Seq(domainCol), "left_anti")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap).drop("__rn")
  }

  /** Tracking-parameter keys stripped by [[canonicalUrl]] (exact-match;
    * `utm_*` is matched as a prefix). */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "msclkid", "ref")

  /** URL canonicalization — the key-normalization step of web-corpus
    * dedup: crawls see the same page under scheme/host case variants,
    * default ports, tracking parameters, permuted query strings, trailing
    * slashes, and fragments, and deduping on the RAW url misses all of
    * them. Rules (the common subset of the canonical-URL literature):
    * lowercase scheme and host; drop the port when it is the scheme
    * default (http:80 / https:443), keep it otherwise; strip the
    * fragment; strip tracking parameters (`utm_*` prefix plus
    * [[TrackingParams]]); SORT the surviving query parameters (byte
    * order) so permutations collide; trim trailing path slashes (bare
    * authority → "/").
    *
    * Scale shape: entirely scan-local over Spark builtins (`parse_url`,
    * `regexp_extract`, array `filter`/`array_sort`) — no UDF, no
    * shuffle; the canonical key then feeds the ordinary exact-dedup hash
    * shuffle. */
  /** k-anonymity audit: how re-identifiable is each row through its
    * quasi-identifier combination? Rows whose (quasi-id tuple) group
    * holds fewer than `k` records fail the audit — the standard check a
    * pipeline runs before releasing per-record data (suppress or
    * generalize the failing rows downstream). One aggregation on the
    * quasi-id tuple (map-side combinable) joined back — the tf-idf
    * shape; AQE broadcasts the group table when it fits. Returns the
    * input plus (group_n, k_ok). */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    val groups = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .select(quasiCols.map(c => col(c).as(s"__g_$c")) :+ col("group_n"): _*)
    // Null-safe equi-join (<=>): groupBy already counts a NULL quasi-id
    // tuple as a group, and a plain equi-join would silently DROP those
    // rows from the audit — the one population a privacy audit most
    // needs to keep visible. <=> is still an extractable hash-join key.
    val cond = quasiCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(groups, cond)
      .drop(quasiCols.map(c => s"__g_$c"): _*)
      .withColumn("k_ok", col("group_n") >= k)
  }

  /** 2-D Pareto frontier (skyline): keep exactly the rows no other row
    * dominates — dominated = some row with `x' >= x AND y' >= y` and at
    * least one strictly greater. The curation shape: "keep docs where
    * nothing both higher-quality AND longer exists" prunes a corpus to
    * its quality/length skyline; equal points are mutually
    * non-dominating and all kept; rows with a NULL coordinate are
    * dropped (dominance is undefined on them).
    *
    * Distributed sweep, never all-pairs: (1) one shuffle aggregation to
    * per-distinct-x max-y; (2) the strict above-max
    * `M(x) = max{ymax(x') : x' > x}` via the repo's bounded prefix-scan
    * shape (Packing's): range-repartition the DISTINCT-x frame on x
    * desc, one partial max per partition to the driver (bounded by the
    * partition count, never the data), partition-local rescan; (3) one
    * join back on x: keep `y == ymax(x)` (within-x domination) and
    * `ymax(x) > M(x)` or no x above (cross-x domination). Integral
    * coordinates only — the decisions stay integer-exact and
    * cross-engine replayable. */
  def paretoFrontier(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val in = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val xa = in.groupBy(col(xCol).cast(LongType).as("__x"))
      .agg(max(col(yCol).cast(LongType)).as("__ymax"))
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = xa.repartitionByRange(parts, col("__x").desc)
      .sortWithinPartitions(col("__x").desc)
    val sortedRdd = sorted.rdd
    sortedRdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one partial max per partition to the driver
    val partMax = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var m = Long.MinValue
      it.foreach(r => m = math.max(m, r.getLong(1)))
      Iterator((pid, m))
    }.collect().sortBy(_._1).map(_._2)
    val carryIn = partMax.scanLeft(Long.MinValue)(math.max)
    val schema = StructType(sorted.schema.fields :+
      StructField("__above", LongType, nullable = false))
    val swept = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var run = carryIn(pid) // max ymax over every strictly-greater x
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ run)
        run = math.max(run, r.getLong(1))
        out
      }
    }
    val frontierX = spark.createDataFrame(swept, schema)
      .where(col("__ymax") > col("__above")) // MinValue = nothing above
    in.join(frontierX,
        in(xCol).cast(LongType) === col("__x") &&
          in(yCol).cast(LongType) === col("__ymax"))
      .drop("__x", "__ymax", "__above")
  }

  /** Waterfilling token-budget allocation across domains — the mixture
    * computation behind "cap every source at the same level and spend
    * exactly the budget": θ* is the largest integral per-domain cap with
    * `Σ_d min(w_d, θ*) <= budget`, and each domain gets
    * `alloc = min(w_d, θ*)`. Small domains keep everything; the level θ*
    * splits the rest evenly — the fair-cap allocation the epoch-capped
    * mixture literature converges to.
    *
    * Scale shape: one map-side-combinable aggregation to per-domain
    * weights, then everything runs on the DOMAIN frame (bounded by
    * domain cardinality): [[Packing.runningTotal]]'s bounded prefix scan
    * for the sorted cumulative weights, [[GlobalRank]] for the sorted
    * index, one self-join for the predecessor weight, one scalar max.
    * θ* candidates: with domains sorted by weight ascending, row i
    * (1-based, prefix-before p, remaining r = n−i+1) proposes
    * `θ_i = (budget − p) div r`, valid iff `θ_i >= w_{i−1}` (every
    * smaller domain is genuinely saturated below the level); f(θ) is
    * monotone so the max valid candidate IS θ*. Integral weights only —
    * every decision replays exactly cross-engine. */
  def waterfill(df: DataFrame, domainCol: String, weightCol: String,
                budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val dom = df.groupBy(domainCol)
      .agg(sum(col(weightCol).cast("long")).as("w"))
    val order = Seq(asc("w"), asc(domainCol))
    val rn = GlobalRank.withRowNumber(
      Packing.runningTotal(dom, order, "w"), "rn", order)
    val nDf = dom.agg(count(lit(1)).as("__n"))
    val cand = rn.crossJoin(broadcast(nDf))
      // FLOOR division (pmod form), not `div`'s truncation: negative
      // numerators happen past the budget, and a trunc-vs-floor slip of
      // 1 on a candidate that then passes validity (possible only with
      // zero-weight domains) would diverge from the floor-div oracle
      .withColumn("theta",
        expr(s"(${budget}L - (cum - w)" +
          s" - pmod(${budget}L - (cum - w), __n - rn + 1))" +
          " div (__n - rn + 1)"))
    val prev = cand.select((col("rn") + 1).as("rn"), col("w").as("prev_w"))
    val theta = cand.join(prev, Seq("rn"), "left")
      .where(col("prev_w").isNull || col("theta") >= col("prev_w"))
      .agg(max("theta").as("theta"))
    dom.crossJoin(broadcast(theta))
      .select(col(domainCol), col("w"),
        least(col("w"), col("theta")).as("alloc"))
  }

  /** Top-p% per domain by a caller-supplied total order — the fair
    * cross-domain quality threshold: a single global score cutoff lets
    * one domain's score distribution crowd out every other, a per-domain
    * PERCENTILE keeps the same fraction of each. Integer-gated
    * (`rn·100 <= p·count`), window partitioned BY DOMAIN (shuffle on the
    * domain key, no single-task window; the finer-domains contract
    * applies if one domain outgrows a task). */
  def topPercentPerDomain(df: DataFrame, domainCol: String, p: Int,
                          order: Seq[Column]): DataFrame = {
    require(p > 0 && p <= 100, s"p must be in (0,100], got $p")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(domainCol).orderBy(order: _*)
    val cw = Window.partitionBy(domainCol)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(cw))
      .where(col("__rn") * 100 <= lit(p) * col("__cnt"))
      .drop("__rn", "__cnt")
  }

  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(parse_url(noFrag, lit("HOST")))
    val port = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path0 = regexp_replace(
      coalesce(parse_url(noFrag, lit("PATH")), lit("")), "/+$", "")
    val path = when(path0 === "", "/").otherwise(path0)
    val query = coalesce(parse_url(noFrag, lit("QUERY")), lit(""))
    val key = (p: Column) => element_at(split(p, "="), 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !key(p).rlike("^utm_") &&
        !key(p).isInCollection(TrackingParams))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(""),
      path,
      when(q === "", "").otherwise(concat(lit("?"), q)))
  }
}
