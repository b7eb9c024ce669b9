package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding.round4

/** Rank fusion for hybrid retrieval — combining a lexical ranking
  * ([[Bm25]]) with a vector ranking ([[Similarity]]) is the standard
  * retrieval stack for training-data curation (mine hard negatives,
  * find decontamination candidates a single modality misses). The
  * fusion operates on RANKS, not scores, so the two lists need no score
  * calibration against each other.
  *
  * Reciprocal rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009):
  * `score(d) = Σ_lists 1 / (rrfK + rank_list(d))`, missing entries
  * contribute nothing. rrfK = 60 is the paper's (and the industry)
  * default — it damps the head so one list's top hit cannot dominate
  * two mid-list agreements.
  *
  * Scale shape: inputs are ALREADY top-k ranking lists (queries ×
  * bounded k rows — tiny relative to any corpus), so fusion is one
  * aggregation and one per-query rank window over list-sized data; the
  * corpus is never touched. Determinism: each fused score sums at most
  * one reciprocal per input list (2-list sums are IEEE order-exact),
  * rounds to 4 dp BEFORE ranking, candidate id breaks ties.
  */
object Fusion {

  /** Fuse ranking lists of shape (query_id, id, rank) into
    * (query_id, id, score, rank), top `k` per query. */
  def reciprocalRankFusion(rankings: Seq[DataFrame], k: Int,
                           rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking list")
    require(k > 0, s"k must be positive, got $k")
    require(rrfK >= 0, s"rrfK must be non-negative, got $rrfK")
    val contribs = rankings
      .map(_.select(col("query_id"), col("id"),
        (lit(1.0) / (lit(rrfK).cast("double") + col("rank")))
          .as("contrib")))
      .reduce(_ union _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id").asc)
    contribs.groupBy("query_id", "id")
      .agg(round4(sum(col("contrib"))).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "id", "score", "rank")
  }
}
