package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-evaluation aggregates for the classifier/quality-filter loop of a
  * training-data pipeline (train → score corpus → audit the scorer). All
  * rank arithmetic is integer-exact so the results replay bit-identically
  * cross-engine; only the final ratios are doubles (rounded by callers'
  * gates per the repo determinism contract).
  */
object Eval {

  /** ROC-AUC by the Mann–Whitney rank-sum identity, with exact average-
    * rank tie handling: `AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻)` where `R⁺`
    * sums positives' average ranks by ascending score. Works on integral
    * scores (the repo's deterministic-score contract; cast upstream).
    *
    * Scale shape: one aggregation to per-distinct-score (count, positive
    * count) — map-side combinable, the corpus never ranks row-by-row —
    * then [[Packing.runningTotal]]'s bounded prefix scan over the
    * DISTINCT-score frame (range exchange + one partial sum per
    * partition to the driver), one final scalar aggregation. No window,
    * no self-join, nothing driver-side beyond the partition offsets.
    * Doubled-rank units (`2·rank`) keep average ranks integral.
    *
    * Returns one row: (n_pos, n_neg, u2, auc) with `u2 = 2·U` exact and
    * `auc` rounded to 4 dp. */
  def rocAuc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val byScore = df.groupBy(col(scoreCol).cast("long").as("score"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L))
          .as("pos"))
    val cum = Packing.runningTotal(byScore, Seq(asc("score")), "cnt")
    // average rank of a tied score group, in doubled units:
    // 2·avgRank = 2·(cumBefore) + cnt + 1
    cum.select(col("pos"), col("cnt"), col("cum"))
      .agg(
        sum("pos").as("n_pos"),
        (sum("cnt") - sum("pos")).as("n_neg"),
        sum(col("pos") * (lit(2) * (col("cum") - col("cnt"))
          + col("cnt") + 1)).as("r2"))
      .select(col("n_pos"), col("n_neg"),
        (col("r2") - col("n_pos") * (col("n_pos") + 1)).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        round(col("u2") / (lit(2.0) * col("n_pos") * col("n_neg")), 4)
          .as("auc"))
  }

  /** Precision/recall operating points at fixed integral thresholds —
    * the table a pipeline reads to choose its quality-filter cutoff.
    * ONE corpus aggregation (per-distinct-score counts, map-side
    * combinable); the threshold sweep runs on that bounded frame against
    * a broadcast literal, so adding operating points costs nothing at
    * corpus scale. Ratios are null when undefined (no predicted
    * positives), rounded to 4 dp. */
  def prAtThresholds(df: DataFrame, labelCol: String, scoreCol: String,
                     thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val byScore = df.groupBy(col(scoreCol).cast("long").as("score"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L))
          .as("pos"))
    val th = thresholds.toDF("threshold")
    byScore.crossJoin(broadcast(th))
      .groupBy("threshold")
      .agg(
        sum(when(col("score") >= col("threshold"), col("pos"))
          .otherwise(0L)).as("tp"),
        sum(when(col("score") >= col("threshold"),
          col("cnt") - col("pos")).otherwise(0L)).as("fp"),
        sum(when(col("score") < col("threshold"), col("pos"))
          .otherwise(0L)).as("fn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          round(col("tp") / (col("tp") + col("fp")), 4)).as("precision"),
        when(col("tp") + col("fn") > 0,
          round(col("tp") / (col("tp") + col("fn")), 4)).as("recall"))
  }

  /** Expected calibration error with an EXACT INTEGER numerator:
    * `ECE = Σ_b (n_b/N)·|pos_rate_b − mean_score_b/scoreMax|` algebraically
    * reduces to `Σ_b |n_pos_b·scoreMax − s_sum_b| / (N·scoreMax)` — every
    * per-bin term is an integer, so the cross-engine result is exact up
    * to one final rounded division (no order-dependent double summation
    * anywhere). One map-side-combinable aggregation. */
  def expectedCalibrationError(df: DataFrame, labelCol: String,
                               scoreCol: String, scoreMax: Long,
                               nBins: Int): DataFrame = {
    require(nBins > 0 && scoreMax > 0, "nBins and scoreMax must be positive")
    df.groupBy(binCol(scoreCol, scoreMax, nBins).as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L))
          .as("n_pos"),
        sum(col(scoreCol).cast("long")).as("s_sum"))
      .agg(sum("n").as("n"),
        sum(abs(col("n_pos") * scoreMax - col("s_sum"))).as("ece_num"))
      .select(col("n"), col("ece_num"),
        round(col("ece_num") / (col("n") * lit(scoreMax.toDouble)), 4)
          .as("ece"))
  }

  /** Calibration table (reliability diagram): bucket predictions by
    * integral score into `nBins` equal-width bins over [0, scoreMax],
    * report per-bin count, positive count, and observed positive rate —
    * one map-side-combinable aggregation, no shuffle beyond it. */
  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
                      scoreMax: Long, nBins: Int): DataFrame = {
    require(nBins > 0 && scoreMax > 0, "nBins and scoreMax must be positive")
    df.groupBy(binCol(scoreCol, scoreMax, nBins).as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L))
          .as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos") / col("n").cast("double"), 4).as("pos_rate"))
  }

  /** Equal-width integral bin — FLOOR division (pmod form) so negative
    * scores bin the same way the SQL oracle's `//` floors them (`div`
    * truncates toward zero and would disagree one bin below zero);
    * integer throughout (Spark's `/` on longs is a double divide). */
  private def binCol(scoreCol: String, scoreMax: Long, nBins: Int)
      : org.apache.spark.sql.Column = {
    val num = s"cast($scoreCol as bigint) * $nBins"
    least(expr(s"($num - pmod($num, ${scoreMax}L)) div ${scoreMax}L"),
      lit(nBins - 1)).cast("int")
  }
}
