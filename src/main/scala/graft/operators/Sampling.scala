package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Rounding.roundCompat

/** Temperature-scaled corpus sampling — the language-balancing step of a
  * multilingual training-data pipeline (the UniMax / mC4 recipe: raw web
  * corpora are dominated by one language, so groups are sampled with
  * probability proportional to `mass^(1/T)` instead of `mass`, boosting
  * low-resource languages as T grows; T=1 is natural sampling, T→∞ is
  * uniform over groups).
  *
  * Everything is deterministic and engine-portable by construction:
  *
  *   - group masses are LONG sums (exact, order-independent);
  *   - acceptance rates are rounded to 6 decimals with the
  *     DuckDB-compatible scaled-binary rounding (Rounding.roundCompat),
  *     so the oracle reproduces them bit-for-bit;
  *   - per-row selection is HASH-based, never RNG-based: a document is
  *     kept iff the first 24 bits of md5(id) — a uniform integer in
  *     [0, 2^24) — fall below `floor(rate · 2^24)`. The same row is
  *     kept on any engine, any partitioning, any run (`rand(seed)` is
  *     partition-order-dependent and would make splits irreproducible).
  *
  * Scale shape: one groupBy over the group column (a handful of rows —
  * languages, domains), a broadcast join of the rate table back onto the
  * corpus, and a scan-local filter. Sampling 100 TB is one shuffle-free
  * pass after a tiny aggregate; the rate table is the only exchanged
  * state, so the same rates can be persisted and reused across
  * incremental batches.
  */
object Sampling {

  /** Uniform integer in [0, 2^24) from the row id — the portable
    * sampling coordinate (md5 hex prefix, identical in DuckDB). */
  def hashU24(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 6), 16, 10).cast("long")

  /** Per-group acceptance rates: weight w_g = mass_g^(1/T), share
    * s_g = w_g / Σw, rate_g = min(1, budget · s_g / mass_g), rounded to
    * 6 decimals. Output: (group, mass, rate).
    *
    * The Σw total is folded over the per-group frame (#groups rows —
    * languages/domains number in the dozens) in SORTED group order:
    * collect_list → array_sort → aggregate pins the double-summation
    * order, so `tw` is bit-identical across runs/partitionings and the
    * 6-dp rounding can never land on a run-dependent tie.
    */
  def temperatureRates(df: DataFrame, groupCol: String, massCol: String,
                       temperature: Double, budget: Long): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    require(budget > 0, s"budget must be positive, got $budget")
    val byGroup = df.groupBy(col(groupCol))
      .agg(sum(col(massCol)).as("mass"))
      .withColumn("w", pow(col("mass").cast("double"), lit(1.0 / temperature)))
    val totals = byGroup
      .agg(aggregate(
        array_sort(collect_list(struct(col(groupCol).as("g"), col("w")))),
        lit(0.0),
        (acc, x) => acc + x.getField("w")).as("tw"))
    byGroup.crossJoin(broadcast(totals))
      .select(col(groupCol), col("mass"),
        roundCompat(least(lit(1.0),
          lit(budget.toDouble) * col("w") / col("tw") / col("mass")), 6)
          .as("rate"))
  }

  /** Filter `df` down to the temperature sample: compute rates from the
    * corpus itself, broadcast them back, and keep rows whose hash
    * coordinate clears the group's rate. Appends the group's `rate`
    * column; row set and row content are fully hash-reproducible. */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
                        massCol: String, temperature: Double,
                        budget: Long): DataFrame =
    applyRates(df,
      temperatureRates(df, groupCol, massCol, temperature, budget),
      groupCol, idCol)

  /** Explicit-share mixture rates: the caller names each group's share of
    * the budget directly (the DoReMi-style "domain weights fixed upstream"
    * case — temperature sampling DERIVES shares from masses, this applies
    * given ones). rate_g = min(1, budget·w_g / mass_g), rounded to 6 dp.
    * Groups absent from `weights` get no rate row and are dropped by the
    * sampling join — an explicit mixture is also an explicit exclusion. */
  def mixtureRates(df: DataFrame, groupCol: String, massCol: String,
                   weights: Map[String, Double], budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toSeq.sortBy(_._1).toDF(groupCol, "w")
    df.groupBy(col(groupCol)).agg(sum(col(massCol)).as("mass"))
      .join(broadcast(w), groupCol)
      .select(col(groupCol), col("mass"),
        roundCompat(least(lit(1.0),
          lit(budget.toDouble) * col("w") / col("mass")), 6).as("rate"))
  }

  /** Filter `df` down to the explicit mixture sample (see mixtureRates). */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
                    massCol: String, weights: Map[String, Double],
                    budget: Long): DataFrame =
    applyRates(df, mixtureRates(df, groupCol, massCol, weights, budget),
      groupCol, idCol)

  /** Deterministic training-order shuffle: global position = rank of the
    * md5 coin `md5(seed || ':' || id)`, id tiebreak making the order
    * total. Same corpus + seed → the same order on any engine, any
    * partitioning, any run (`rand(seed)`/`shuffle()` are partition-order-
    * dependent and would make training runs irreproducible); the next
    * epoch is just the next seed string. Scale: one range exchange via
    * GlobalRank — never a single-task global window. */
  def deterministicShuffle(df: DataFrame, idCol: String,
                           seed: String): DataFrame =
    graft.operators.GlobalRank.withRowNumber(
        df.withColumn("__coin",
          md5(concat_ws(":", lit(seed), col(idCol).cast("string")))),
        "shuffle_pos", Seq(col("__coin"), col(idCol)))
      .drop("__coin")

  /** Fixed-n per-group sampling: up to `n` rows per group, chosen by the
    * md5 hash order of the id (deterministic reservoir semantics — no
    * RNG, partition-order-independent). With semantic clusters as the
    * groups this is the SemDeDup/diversity-preserving shape: equal
    * representation per embedding cluster instead of per raw frequency,
    * so boilerplate-heavy regions of the corpus can't dominate the
    * sample. One window pass; the `rn <= n` filter pushes a partial
    * WindowGroupLimit below the exchange, so each map task forwards at
    * most n rows per group. */
  def perGroupSample(df: DataFrame, groupCol: String, idCol: String,
                     n: Int): DataFrame = {
    require(n > 0, s"per-group sample size must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n).drop("__rn")
  }

  /** Weighted per-group sampling, deterministic and engine-replayable:
    * priority = hashU24(id) / weight, keep the bottom `n` per group.
    * Heavier rows draw smaller priorities in expectation, so selection
    * probability grows with weight (the hash plays the role of the RNG
    * draw in weighted reservoir sampling; like the rest of this module,
    * no `rand()` — a partition-order-dependent sample can't be oracled
    * and isn't reproducible at 100 TB). The priority is a DOUBLE division
    * of two exact integers: IEEE division is correctly rounded, so both
    * engines derive the bit-identical sort key — ties (same hash/weight
    * ratio) fall to the id. One window pass per group, n <= 1000 keeps
    * the partial WindowGroupLimit. Weights must be positive. */
  def weightedPerGroupSample(df: DataFrame, groupCol: String, idCol: String,
                             weightCol: String, n: Int): DataFrame = {
    require(n > 0 && n <= 1000, s"sample size out of (0, 1000]: $n")
    import org.apache.spark.sql.expressions.Window
    val pri = hashU24(col(idCol)).cast("double")
      ./(col(weightCol).cast("double"))
    val w = Window.partitionBy(col(groupCol)).orderBy(pri.asc, col(idCol))
    df.where(col(weightCol) > 0)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .withColumnRenamed("__rn", "rn")
  }

  /** Deterministic hash-ring negative mining for contrastive training:
    * every anchor draws `k` negatives from the corpus WITHOUT a cross
    * join, an RNG, or a similarity search — lay the corpus on a ring
    * (the [[deterministicShuffle]] position), then each (anchor, j)
    * jumps a hash-chosen offset in [1, n-1] around the ring. The offset
    * can never be 0 mod n, so an anchor never draws itself; uniform
    * offsets give negatives that are uniform over the corpus
    * (random-negative semantics, reproducible on any engine or
    * partitioning — the property batch-hard miners give up).
    *
    * Scale shape: one global-rank pass for the ring (range exchange +
    * zipWithIndex, never a single-task window), a scan-local k-way
    * explode, and ONE equi join on the ring position. The only driver
    * scalar is the corpus count. */
  def hashNegatives(docs: DataFrame, idCol: String, k: Int,
                    seed: String): DataFrame = {
    require(k > 0 && k <= 64, s"negatives per anchor out of (0, 64]: $k")
    val ring = deterministicShuffle(docs.select(col(idCol)), idCol, seed)
    val n = ring.count()
    require(n > 1, s"need at least 2 rows to draw negatives, got $n")
    val off = lit(1L) + hashU24(concat_ws(":", lit(seed + ":off"),
      col(idCol).cast("string"), col("j").cast("string"))) % lit(n - 1L)
    val anchors = ring
      .withColumn("j", explode(array((1 to k).map(lit): _*)))
      .withColumn("neg_pos",
        (col("shuffle_pos") - 1L + off) % lit(n) + 1L)
    anchors.join(
        ring.select(col("shuffle_pos").as("neg_pos"),
          col(idCol).as("neg_id")),
        "neg_pos")
      .select(col(idCol), col("j"), col("neg_id"))
  }

  /** Leakage-safe train/val/test split: near-duplicates must land in the
    * SAME split, or the test set contaminates training (the dedup-aware
    * twin of [[q_sample_split]]'s per-document hash split — a document
    * split independently of its near-copies leaks test content into
    * train verbatim). The split coin is thrown on the dup-cluster
    * CANONICAL id ([[ConnectedComponents.canonicalize]] over the pair
    * graph), so every member of a cluster draws the same coin; documents
    * in no pair split on their own id (canonical = id), unchanged from
    * the per-document split.
    *
    * Deterministic and engine-replayable: the coin is the first md5
    * nibble of the canonical id (16 buckets — `trainNibbles` to train,
    * `valNibbles` to val, rest to test), no RNG. Scale shape: components
    * is the bounded-round label propagation (one join + one agg per
    * round); the split itself is a broadcast-sized left join of the
    * id universe against the component labeling (only ids that appear in
    * a pair carry a label; the label frame is |dup nodes|, not |corpus|)
    * and a scan-local hash — no extra shuffle beyond components.
    *
    * @param ids   one row per corpus member, `idCol` must be total
    * @param pairs near-dup edges (id1, id2), any orientation
    * @return (id, canonical, split) for every row of `ids` */
  def leakageSafeSplit(ids: DataFrame, pairs: DataFrame,
                       idCol: String = "id", id1Col: String = "id1",
                       id2Col: String = "id2", trainNibbles: Int = 10,
                       valNibbles: Int = 3): DataFrame = {
    require(trainNibbles > 0 && valNibbles >= 0 &&
      trainNibbles + valNibbles <= 16,
      s"nibble budgets out of range: train=$trainNibbles val=$valNibbles")
    val canon = ConnectedComponents.canonicalize(pairs, id1Col, id2Col)
    val labeled = ids.select(col(idCol).as("id"))
      .join(canon, Seq("id"), "left")
      .withColumn("canonical", coalesce(col("canonical"), col("id")))
    val bucket = (expr(
      "instr('0123456789abcdef', substring(md5(CAST(canonical AS STRING)), 1, 1))")
      - 1).cast("long")
    labeled.select(col("id"), col("canonical"),
      when(bucket < trainNibbles, "train")
        .when(bucket < trainNibbles + valNibbles, "val")
        .otherwise("test").as("split"))
  }

  /** Leakage-safe k-fold assignment — [[leakageSafeSplit]]'s
    * cross-validation sibling: the fold coin is thrown on the duplicate-
    * cluster CANONICAL id, so near-duplicates always share a fold and no
    * fold's validation half ever contains a paraphrase of another fold's
    * training half. Fold = first md5 byte of the canonical id mod k —
    * deterministic, engine-replayable, uniform. Returns
    * (id, canonical, fold). Same scale shape as the split: components
    * run over the pair graph (not the corpus), the corpus pays one left
    * join + a scan-local hash. */
  def kFold(ids: DataFrame, pairs: DataFrame, k: Int,
            idCol: String = "id", id1Col: String = "id1",
            id2Col: String = "id2"): DataFrame = {
    require(k >= 2 && k <= 256, s"fold count out of range: $k")
    val canon = ConnectedComponents.canonicalize(pairs, id1Col, id2Col)
    ids.select(col(idCol).as("id"))
      .join(canon, Seq("id"), "left")
      .withColumn("canonical", coalesce(col("canonical"), col("id")))
      .withColumn("fold", (expr(
        "(instr('0123456789abcdef', substring(md5(CAST(canonical AS STRING)), 1, 1)) - 1) * 16" +
          " + instr('0123456789abcdef', substring(md5(CAST(canonical AS STRING)), 2, 1)) - 1")
        .cast("long") % k).cast("int"))
  }

  /** The shared selection step: broadcast the (group, rate) table onto the
    * corpus scan and keep rows whose u24 hash clears `floor(rate·2^24)` —
    * integer compare, shuffle-free on the corpus side. */
  /** Deterministic weighted interleave — the SCHEDULE for mixing corpora
    * into one training stream, complementing [[mixtureSample]] (which
    * decides WHAT to keep, this decides in WHICH ORDER it streams).
    * Stride scheduling (Waldspurger & Weihl): a source of weight w emits
    * its r-th row at virtual time (2r−1)·(L/w) with L = lcm(weights), so
    * any prefix of the merged stream holds each source in proportion w/ΣW
    * to within one row — the property that keeps a data mixture stable
    * under checkpoint/resume at any step, with no RNG anywhere.
    *
    * Per-source order comes from `orderBy` (give a total order); virtual
    *-time ties break by source name then rank, so the merge is a total
    * order too. Scale shape: one [[GlobalRank]] range exchange per source
    * plus one over the union — no windows over a single partition, no
    * driver materialization; at 100 TB the stream is written out
    * partitioned by `pos` ranges exactly like any packed export.
    *
    * @param sources (name, frame, weight) — frames must share a schema
    * @return the union schema plus (src, pos) with pos the 1-based global
    *         interleave position */
  def interleave(sources: Seq[(String, DataFrame, Long)],
                 orderBy: Seq[Column]): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    require(sources.forall(_._3 > 0), "weights must be positive")
    require(sources.map(_._1).distinct.size == sources.size,
      "source names must be unique")
    def lcm(a: Long, b: Long): Long = a / gcd(a, b) * b
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val l = sources.map(_._3).reduce(lcm)
    require(l <= 1000000L, s"lcm(weights) too large for exact strides: $l")
    val staged = sources.map { case (name, df, w) =>
      GlobalRank.withRowNumber(df, "__r", orderBy)
        .withColumn("src", lit(name))
        .withColumn("__vt", (lit(2L) * col("__r") - 1L) * lit(l / w))
    }
    val merged = staged.reduce(_ unionByName _)
    GlobalRank.withRowNumber(merged, "pos",
        Seq(col("__vt"), col("src"), col("__r")))
      .drop("__vt", "__r")
  }

  private def applyRates(df: DataFrame, rates: DataFrame, groupCol: String,
                         idCol: String): DataFrame =
    df.join(broadcast(rates.select(col(groupCol), col("rate"))), groupCol)
      .where(hashU24(col(idCol)) <
        floor(col("rate") * lit(16777216.0)).cast("long"))
}
