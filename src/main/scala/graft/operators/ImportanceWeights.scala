package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling", simplified to unigram
  * features): score every document by how much more likely its tokens are
  * under a TARGET distribution (e.g. curated in-domain text) than under
  * the SOURCE (the raw corpus) — the standard lever for tilting a 100 TB
  * crawl toward a quality domain without training a classifier.
  *
  *   score(d) = (1/|d|) Σ_t [ ln p_tgt(t) − ln p_src(t) ]
  *
  * with add-one smoothing over the corpus vocabulary V:
  * p(t) = (c(t)+1)/(N+V). Documents with score > 0 look more target-like
  * than source-like.
  *
  * Scale shape: ONE token-stats table (token, c_tgt, c_src) built in a
  * single aggregation over the exploded corpus (target counts are a
  * conditional count in the same pass — no second scan); the per-token
  * join is vocabulary×corpus-tokens, the same shape as tf-idf (AQE
  * broadcasts the stats side when it fits, shuffles when it doesn't).
  *
  * Determinism: each per-token log contribution is quantized to integer
  * MILLI-NATS (round(w·1e3) as long) at the vocabulary table, so the
  * per-document Σ is exact integer arithmetic — commutative (no fold
  * order to pin). Milli (not micro) keeps the `round` boundary density
  * negligible against libm `ln()` ulp differences across engines, and
  * the gate-facing columns avoid floating-point decimal rounding
  * entirely: `score_milli = floor(raw_milli / n_tok)` is bit-exact on
  * every IEEE engine (correctly-rounded division + exact floor), and
  * `keep` tests the integer sum's sign. The convenience `score` double
  * is raw_milli/(n_tok·1000) unrounded — API surface, not gated.
  */
object ImportanceWeights {

  /** Per-document DSIR scores. `targetPred` selects the target slice of
    * `docs` (its tokens define p_tgt); every document is scored. Returns
    * (doc_id, n_tok, score_milli, score, keep). */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 targetPred: Column): DataFrame = {
    val tok = docs
      .select(col(idCol).as("id"), targetPred.as("is_tgt"),
        explode(tokens(col(textCol))).as("token"))
    // one pass: source count = all rows, target count = conditional
    val stats = tok.groupBy("token").agg(
      count(lit(1)).as("c_src"),
      count(when(col("is_tgt"), 1)).as("c_tgt"))
    val totals = stats.agg(
      coalesce(sum("c_src"), lit(0L)).as("n_src"),
      coalesce(sum("c_tgt"), lit(0L)).as("n_tgt"),
      count(lit(1)).as("v")).collect().head
    val (nSrc, nTgt, v) =
      (totals.getLong(0), totals.getLong(1), totals.getLong(2))
    val contrib =
      log((col("c_tgt") + 1.0) / lit((nTgt + v).toDouble)) -
        log((col("c_src") + 1.0) / lit((nSrc + v).toDouble))
    // quantize at the vocabulary table (one ln pair per DISTINCT token),
    // then the per-doc Σ is an exact integer sum — no fold order to pin
    val perToken = tok.join(stats, "token")
      .select(col("id"),
        round(contrib * lit(1000.0), 0).cast("long").as("milli"))
    perToken.groupBy("id")
      .agg(count(lit(1)).as("n_tok"), sum("milli").as("raw_milli"))
      .select(col("id").as("doc_id"), col("n_tok"),
        floor(col("raw_milli") / col("n_tok")).as("score_milli"),
        (col("raw_milli") / (col("n_tok") * lit(1000.0))).as("score"),
        (col("raw_milli") > 0L).as("keep"))
  }
}
