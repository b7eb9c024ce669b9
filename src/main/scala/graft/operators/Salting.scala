package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (big) side, replicate the small
  * side per salt value, join on key+salt.
  *
  * AQE's skew-join split handles most skew at runtime; explicit salting is
  * the tool for the cases AQE can't touch — a single pathological key inside
  * one shuffle block (AQE splits blocks, not keys' hash buckets ending in
  * the same partition after repartition), or deterministic plans needed for
  * bucketed/bucket-pruned pipelines. Result set is identical to the plain
  * join; only the partitioning of work changes: the hot key's rows spread
  * across `saltFactor` reducers instead of one.
  */
object Salting {

  /** Inner/left equi-join with the left (big) side salted. The salt is
    * derived per-row (row spread, not key spread) so a hot key fans out
    * evenly; the right side is exploded ×saltFactor — keep it small. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    // right/full joins would surface the replicated small side: an
    // unmatched small-side row appears saltFactor times. Only join types
    // that never emit unmatched RIGHT rows are result-identical.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "left_anti", "leftanti", "cross")
        .contains(joinType.toLowerCase),
      s"saltedJoin does not preserve right/full join semantics: $joinType")
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
