package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Corpus drift monitor: how far apart are two slices of a corpus
  * (yesterday's crawl vs today's, source A vs source B, train vs
  * incoming batch) in unigram token distribution? The standing guardrail
  * of a 100 TB ingestion pipeline: a scraper regression or an upstream
  * format change shows up as token-distribution drift long before it
  * shows up in model metrics.
  *
  * Two readouts over ONE shared stats pass (explode → single
  * aggregation with conditional counts — the ImportanceWeights shape):
  *
  *  - [[topDrift]]: the tokens that moved most. Ranked by the EXACT
  *    integer cross-product score `|c_a·n_b − c_b·n_a|` (the unnormalized
  *    probability gap — no floating point in the ranking or the gate).
  *  - [[jsDivergence]]: Jensen-Shannon divergence in nats. Per-token
  *    terms are quantized to integer MICRO-NATS before summation, so the
  *    total is an exact commutative integer sum (no double-fold order to
  *    pin); JS terms are ≤ ln2/vocab in magnitude, so micro-nat `round`
  *    boundaries sit ~6 orders of magnitude above libm ln() ulp noise.
  *
  * Scale: one token-stats aggregation (map-side combinable), one
  * 2-scalar collect for the totals, then scan-local arithmetic over the
  * vocabulary frame. Never materializes a doc×token matrix.
  */
object DriftMonitor {

  /** Token counts of a corpus (batch): (token, c_a, c_b) with slice A =
    * rows matching `slicePred`, B = the rest. The INCREMENTAL unit: a
    * nightly batch's counts merge into the standing table with
    * [[mergeCounts]] and every readout below works off the merged frame
    * — drift against a 100 TB reference corpus costs one aggregation of
    * the NEW batch, never a rescan of the reference. */
  def tokenCounts(docs: DataFrame, textCol: String, slicePred: Column)
      : DataFrame =
    docs
      .select(slicePred.as("in_a"), explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(
        count(when(col("in_a"), 1)).as("c_a"),
        count(when(!col("in_a"), 1)).as("c_b"))

  /** Merge two counts tables (token-keyed sum — associative and
    * commutative, so batches fold in any order). */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("token").agg(
      sum("c_a").as("c_a"), sum("c_b").as("c_b"))

  private def stats(docs: DataFrame, textCol: String, slicePred: Column)
      : (DataFrame, Long, Long) = {
    val counts = tokenCounts(docs, textCol, slicePred)
    val tot = counts.agg(
      coalesce(sum("c_a"), lit(0L)).as("n_a"),
      coalesce(sum("c_b"), lit(0L)).as("n_b")).collect().head
    (counts, tot.getLong(0), tot.getLong(1))
  }

  /** Top-k drifted tokens: (token, c_a, c_b, drift_x) with
    * drift_x = |c_a·n_b − c_b·n_a| — exact BIGINT arithmetic end to end,
    * ties broken by token for a total order. */
  def topDrift(docs: DataFrame, textCol: String, slicePred: Column,
               k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val (counts, nA, nB) = stats(docs, textCol, slicePred)
    require(nA > 0 && nB > 0,
      s"both slices need tokens to compare (n_a=$nA, n_b=$nB)")
    counts
      .withColumn("drift_x",
        abs(col("c_a") * lit(nB) - col("c_b") * lit(nA)))
      .orderBy(col("drift_x").desc, col("token"))
      .limit(k)
  }

  /** Jensen-Shannon divergence between the slices' unigram
    * distributions: ONE row (n_a, n_b, vocab, js_micro) with js_micro =
    * Σ round(term·1e6) over the vocabulary — exact integer sum of
    * micro-nat-quantized per-token terms; ranges 0 (identical) to
    * ~693147 (disjoint, ln 2). */
  def jsDivergence(docs: DataFrame, textCol: String, slicePred: Column)
      : DataFrame =
    jsFromCounts(tokenCounts(docs, textCol, slicePred))

  /** The JS readout off a (possibly merged) counts table — see
    * [[jsDivergence]] for semantics and determinism. */
  def jsFromCounts(counts: DataFrame): DataFrame = {
    val tot = counts.agg(
      coalesce(sum("c_a"), lit(0L)).as("n_a"),
      coalesce(sum("c_b"), lit(0L)).as("n_b")).collect().head
    val (nA, nB) = (tot.getLong(0), tot.getLong(1))
    require(nA > 0 && nB > 0,
      s"both slices need tokens to compare (n_a=$nA, n_b=$nB)")
    val pa = col("c_a") / lit(nA.toDouble)
    val pb = col("c_b") / lit(nB.toDouble)
    val m = (pa + pb) / 2.0
    val term =
      (when(col("c_a") > 0, pa * log(pa / m)).otherwise(lit(0.0)) +
        when(col("c_b") > 0, pb * log(pb / m)).otherwise(lit(0.0))) * 0.5
    counts
      .select(round(term * lit(1000000.0), 0).cast("long").as("micro"))
      .agg(
        lit(nA).as("n_a"), lit(nB).as("n_b"),
        count(lit(1)).as("vocab"),
        coalesce(sum("micro"), lit(0L)).as("js_micro"))
  }

  /** Population stability index off a (possibly merged) counts table —
    * the industry-standard drift score next to [[jsFromCounts]]' JS
    * divergence (PSI is what model-monitoring runbooks threshold on:
    * < 0.1 stable, > 0.25 investigate):
    *
    *   PSI = Σ_tokens (p_a − p_b) · ln(p_a / p_b)
    *
    * with add-one (Laplace) smoothing over the JOINT vocabulary, so a
    * token seen in only one slice contributes a finite term — the
    * textbook ε-substitution made deterministic and engine-replayable
    * (ε becomes 1/(n + V), a value both engines derive from integers).
    * Same micro-nat quantization discipline as the JS readout: every
    * per-token term is non-negative ((p_a − p_b) and ln(p_a/p_b) share
    * a sign) and rounds to integer micro-nats BEFORE the sum, so
    * partial-aggregation order can't flip a bit. One aggregation over
    * the counts table — O(vocab), never O(corpus). */
  def psiFromCounts(counts: DataFrame): DataFrame = {
    val tot = counts.agg(
      coalesce(sum("c_a"), lit(0L)).as("n_a"),
      coalesce(sum("c_b"), lit(0L)).as("n_b"),
      count(lit(1)).as("v")).collect().head
    val (nA, nB, v) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    require(nA > 0 && nB > 0,
      s"both slices need tokens to compare (n_a=$nA, n_b=$nB)")
    val pa = (col("c_a") + lit(1.0)) / lit((nA + v).toDouble)
    val pb = (col("c_b") + lit(1.0)) / lit((nB + v).toDouble)
    val term = (pa - pb) * log(pa / pb)
    counts
      .select(round(term * lit(1000000.0), 0).cast("long").as("micro"))
      .agg(
        lit(nA).as("n_a"), lit(nB).as("n_b"),
        lit(v).as("vocab"),
        coalesce(sum("micro"), lit(0L)).as("psi_micro"))
  }
}
