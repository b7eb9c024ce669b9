package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-key entity matching: join two tables on a string key
  * allowing up to `maxDist` edit operations — the conflation step the
  * reference performs by EXACT `movie_name` equality across the IMDb and
  * Metacritic sources (core/movie_hub.sql), which silently drops every
  * variantly-spelled title. (Cited as semantics only; implementation is
  * original Spark.)
  *
  * Scale design: never the n² `levenshtein` cross product. Candidates come
  * from TWO equi-join blocking passes — normalized prefix equality and
  * normalized suffix equality — each an ordinary hash-shuffle join on a
  * short key; `levenshtein` runs on candidates only. For a key of length
  * ≥ 2·blockLen the prefix and suffix blocks are disjoint, so (enforced
  * `maxDist < blockLen`) an edit run can break at most one of the two and
  * recall is total for single-cluster edits; the miss mode (edits
  * spanning BOTH ends) is explicit and documented rather than
  * probabilistic. Keys SHORTER than 2·blockLen have overlapping blocks —
  * one central edit can break both — so they take a dedicated short-key
  * pass blocked on key LENGTH (an equi-join on length buckets, right side
  * exploded ±maxDist): still never a cross product, even on a short-heavy
  * corpus (SKUs, usernames). Block keys are lowercase; length-skewed
  * blocks behave like any hot join key (AQE skew-split applies).
  */
object FuzzyJoin {

  def byEditDistance(left: DataFrame, right: DataFrame,
                     leftId: String, leftKey: String,
                     rightId: String, rightKey: String,
                     maxDist: Int, blockLen: Int = 4): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockLen > maxDist,
      s"blockLen ($blockLen) must exceed maxDist ($maxDist) — a longer " +
        "edit run could rewrite a whole block and silently lose recall")
    val shortLen = 2 * blockLen
    val l = left.select(col(leftId).as("l_id"),
      lower(col(leftKey)).as("l_key"))
    val r = right.select(col(rightId).as("r_id"),
      lower(col(rightKey)).as("r_key"))
    def blocked(keyOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      l.where(length(col("l_key")) >= shortLen)
        .withColumn("__b", keyOf(col("l_key")))
        .join(r.where(length(col("r_key")) >= shortLen)
          .withColumn("__b", keyOf(col("r_key"))), "__b")
        .select("l_id", "l_key", "r_id", "r_key")
    // short keys: overlapping blocks can both be hit by ONE central edit,
    // so they pair among themselves — but never exhaustively. Bucket by
    // key LENGTH: the left side blocks on its exact length, the right
    // side explodes into lengths ±maxDist, so every pair within edit
    // distance (which implies |Δlen| ≤ maxDist) meets in exactly one
    // bucket, and a short-heavy corpus (SKUs, usernames) stays an
    // ordinary hash join on (2·maxDist+1)·|short| rows instead of a
    // |short|² cross product. The < shortLen + maxDist margin on BOTH
    // sides covers pairs that straddle the boundary (edits change length
    // by at most maxDist, so a sub-boundary key can only match keys under
    // the margin); keys at or above the margin on both sides have
    // disjoint blocks and are fully served by the two blocked passes.
    val shortPairs = l.where(length(col("l_key")) < shortLen + maxDist)
      .withColumn("__b", length(col("l_key")))
      .join(r.where(length(col("r_key")) < shortLen + maxDist)
        .withColumn("__b", explode(sequence(
          greatest(length(col("r_key")) - maxDist, lit(1)),
          length(col("r_key")) + maxDist))), "__b")
      .select("l_id", "l_key", "r_id", "r_key")
    val cand = blocked(k => substring(k, 1, blockLen))
      .union(blocked(k => substring(k, -blockLen, blockLen)))
      .union(shortPairs)
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("l_key"), col("r_key")))
      .where(col("dist") <= maxDist)
      .select(col("l_id"), col("r_id"), col("dist"))
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo's merge/purge):
    * globally sort the records by a blocking key, then candidate-pair
    * each record with only its next `window` neighbors in that order —
    * O(n·window) candidates total, independent of key distribution. The
    * complementary family to [[byEditDistance]]'s prefix/suffix blocks:
    * substring blocks recall pairs sharing an exact block but miss pairs
    * whose every block is touched; sort order recalls pairs that agree on
    * a long PREFIX of the key (names, addresses, normalized titles) no
    * matter where later edits fall. Production linkage runs several
    * passes with different key orderings and unions the candidates —
    * compose this with byEditDistance for that.
    *
    * Scale shape: the global sort is [[GlobalRank]]'s range exchange
    * (never a one-task window); neighbor pairing explodes each row into
    * `window` probe ranks and equi-joins rank-to-rank — shuffle volume is
    * n·window rows of (id, key), no self cross product anywhere. The
    * expensive `levenshtein` runs on candidates only.
    *
    * @return (id1, id2, dist) with id1 the sort-order-earlier record,
    *         dist ≤ maxDist */
  def sortedNeighborhood(records: DataFrame, idCol: String, keyCol: String,
                         window: Int, maxDist: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val keyed = records.select(col(idCol).as("id"),
      lower(col(keyCol)).as("key"))
    val ranked = GlobalRank.withRowNumber(keyed, "rn",
      Seq(col("key"), col("id")))
    val probes = ranked.select(col("id").as("id1"), col("key").as("k1"),
      explode(sequence(col("rn") + 1, col("rn") + window)).as("rn"))
    probes.join(ranked.select(col("id").as("id2"), col("key").as("k2"),
        col("rn")), "rn")
      .withColumn("dist", levenshtein(col("k1"), col("k2")))
      .where(col("dist") <= maxDist)
      .select(col("id1"), col("id2"), col("dist"))
  }
}
