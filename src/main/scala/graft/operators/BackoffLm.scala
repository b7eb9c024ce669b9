package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram stupid-backoff language-model scoring — the CCNet-shape
  * perplexity filter (train a cheap n-gram LM on a trusted slice, score
  * every document, drop the worst). Stupid backoff (Brants et al. 2007,
  * "Large Language Models in Machine Translation") replaces discounted
  * smoothing with a fixed backoff factor, which is exactly what makes it
  * the web-scale choice: counts stay raw integers, no held-out tuning
  * pass, and the model is two aggregate frames.
  *
  * Reference anchor: the reference's text-quality handling is rule-based
  * noise cleansing (`imdb parser.py:139` '...'→NaN, `:241` apostrophe
  * strip); an LM perplexity filter is the standard scale-up of that idea
  * for training-data curation (builder-prompt mandate), so it ships as a
  * first-class operator here.
  *
  * Score of token w_i given previous token w_{i-1}:
  *   S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c-ctx(w_{i-1})   if bigram seen
  *                    = 0.4 * S(w_i)                       otherwise
  *   S(w)             = c(w) / N                           if w seen
  *                    = 0.4 / N                            otherwise
  * (the first token of a document scores S(w_1) with no 0.4 factor —
  * there is no context to back off FROM). The bigram denominator is the
  * sum of bigram counts for the context (so each conditional sums to 1
  * over the vocabulary), not the raw unigram count.
  *
  * Determinism contract: every per-token cost is quantized to integer
  * MICRO-NATS (floor(-1e6·ln S + 0.5)) before any aggregation, so the
  * per-document totals are exact integer sums — no float-summation-order
  * exposure between Spark's partial aggregation and a columnar oracle.
  *
  * Scale shape: the model IS two count frames (vocab-sized and
  * bigram-vocab-sized) — never driver-collected (the only scalar is N).
  * Scoring is the token stream left-joined to those frames on the token
  * keys; at corpus scale the optimizer broadcasts the model frames while
  * they fit and falls back to shuffle joins (with AQE skew splitting for
  * the Zipf head) beyond that. The (i, w, prev) triples are derived
  * scan-locally inside one explode — the token array is never duplicated
  * per token position.
  */
object BackoffLm {

  /** Brants et al.'s recommended backoff factor. */
  val Alpha = 0.4

  /** A trained model: `uni(w, c)`, `bi(w1, w2, c12)`, `ctx(w1, c1)` with
    * c1 = Σ_w2 c12, and the total training token count. */
  final case class Model(uni: DataFrame, bi: DataFrame, ctx: DataFrame,
                         nTokens: Long)

  /** Count unigrams and bigrams over `train` (one `ts: array<string>`
    * column). One explode + aggregation per n-gram order; the context
    * frame derives from the bigram counts (no third pass). */
  def train(train: DataFrame): Model = {
    val uni = train.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // one-row scalar aggregate — the only driver-side value in the model
    val nRow = uni.agg(sum("c")).collect().head
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    val bi = train.where(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1), " +
          "i -> struct(ts[i-1] AS w1, ts[i] AS w2))")).as("b"))
      .select(col("b.w1"), col("b.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctx = bi.groupBy("w1").agg(sum("c12").as("c1"))
    Model(uni, bi, ctx, n)
  }

  /** Score `docs` (doc_id, ts: array<string>) against `m` →
    * (doc_id, n_tokens, total_unats, avg_unats): total and per-token
    * average cost in integer micro-nats (avg by exact integer division).
    * Zero-token documents are dropped (no tokens to score). */
  def score(docs: DataFrame, m: Model): DataFrame = {
    // empty-model guard: max(N,1) keeps the unseen-token cost finite
    // (an empty model scores everything at the same flat unseen cost)
    val n = math.max(m.nTokens, 1L).toDouble
    val stream = docs.where(size(col("ts")) >= 1)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ts)), i -> struct(i AS i, " +
          "ts[i-1] AS w, IF(i > 1, ts[i-2], NULL) AS pw))")).as("x"))
      .select(col("doc_id"), col("x.i"), col("x.w"), col("x.pw"))
    val st = stream
      .join(m.uni.select(col("w").as("uw"), col("c")),
        col("w") === col("uw"), "left")
      .join(m.bi, col("pw") === col("w1") && col("w") === col("w2"), "left")
      .join(m.ctx.select(col("w1").as("cw1"), col("c1")),
        col("pw") === col("cw1"), "left")
    val s = when(col("c12").isNotNull,
        col("c12").cast("double") / col("c1"))
      .otherwise(
        when(col("i") === 1, lit(1.0)).otherwise(lit(Alpha)) *
          coalesce(col("c").cast("double"), lit(Alpha)) / lit(n))
    // floor(x + 0.5) == DuckDB round() for the always-positive costs —
    // the roundCompat convention, landing directly on an integer
    val unats = floor(-lit(1e6) * log(s) + 0.5)
    st.select(col("doc_id"), unats.as("unats"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("unats").as("total_unats"))
      .withColumn("avg_unats", expr("total_unats div n_tokens"))
  }
}
