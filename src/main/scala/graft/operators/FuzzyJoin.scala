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
  * short key; `levenshtein` runs on candidates only. A pair survives
  * blocking iff prefix OR suffix is untouched by the edits; with
  * `maxDist < blockLen` an edit run can break at most one of the two
  * blocks, so recall is total for single-cluster edits and the miss mode
  * (edits spanning BOTH ends) is explicit and documented rather than
  * probabilistic. Block keys are lowercase; length-skewed blocks behave
  * like any hot join key (AQE skew-split applies).
  */
object FuzzyJoin {

  def byEditDistance(left: DataFrame, right: DataFrame,
                     leftId: String, leftKey: String,
                     rightId: String, rightKey: String,
                     maxDist: Int, blockLen: Int = 4): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockLen > 0, s"blockLen must be positive, got $blockLen")
    val l = left.select(col(leftId).as("l_id"),
      lower(col(leftKey)).as("l_key"))
    val r = right.select(col(rightId).as("r_id"),
      lower(col(rightKey)).as("r_key"))
    def blocked(keyOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      l.withColumn("__b", keyOf(col("l_key")))
        .join(r.withColumn("__b", keyOf(col("r_key"))), "__b")
        .select("l_id", "l_key", "r_id", "r_key")
    val cand = blocked(k => substring(k, 1, blockLen))
      .union(blocked(k => substring(k, -blockLen, blockLen)))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("l_key"), col("r_key")))
      .where(col("dist") <= maxDist)
      .select(col("l_id"), col("r_id"), col("dist"))
  }
}
