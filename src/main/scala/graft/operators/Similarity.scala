package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: brute force is the exactness baseline — O(|Q|·|C|) dot
  * products, fine when |Q| is small and broadcast. The scale path is IVF:
  * a coarse quantizer partitions candidates by nearest centroid (one
  * scan + narrow shuffle on cluster id); queries probe only `nProbe`
  * clusters, cutting the search space by ~nClusters/nProbe. Centroids are
  * a broadcast table in both phases; the candidate side never re-shuffles
  * per query.
  */
object Similarity {

  /** Exact top-k by cosine: every (query, candidate) pair, ranked per query.
    * `queries` must be small (it is broadcast against the candidate scan).
    * Scores are rounded to 4 decimals before ranking (ties broken by id)
    * so results are reproducible across engines and partitionings. */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame,
                     k: Int): DataFrame = {
    val c = candidates.select(col("vec_id").as("cand_id"),
      asDouble(col("embedding")).as("cand_vec"))
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("query_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("score",
        graft.functions.Rounding.round4(cosine(col("query_vec"), col("cand_vec"))))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "cand_id", "score", "rank")
  }

  /** IVF (inverted-file) ANN: assign candidates to their nearest centroid,
    * then search only the `nProbe` centroids closest to each query.
    *
    * Centroids here are the first `nClusters` candidate vectors (a
    * deterministic stand-in for a k-means fit — the operator shape, the
    * partitioning, and the probe logic are what scale).
    */
  def ivfTopK(candidates: DataFrame, queries: DataFrame, k: Int,
              nClusters: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = candidates.orderBy("vec_id").limit(nClusters)
      .select(col("vec_id").cast("int").as("centroid_id"),
        asDouble(col("embedding")).as("centroid_vec"))

    def nearestCentroids(df: DataFrame, idCol: String, vecCol: String,
                         n: Int): DataFrame = {
      val w = Window.partitionBy(idCol)
        .orderBy(desc("cscore"), asc("centroid_id"))
      df.join(broadcast(cents), expr("true"))
        .withColumn("cscore",
          graft.functions.Rounding.round4(cosine(col(vecCol), col("centroid_vec"))))
        .withColumn("crank", row_number().over(w))
        .where(col("crank") <= n)
        .select(col(idCol), col(vecCol), col("centroid_id"))
    }

    val assigned = nearestCentroids(
      candidates.select(col("vec_id").as("cand_id"),
        asDouble(col("embedding")).as("cand_vec")),
      "cand_id", "cand_vec", 1)
    val probes = nearestCentroids(
      queries.select(col("vec_id").as("query_id"),
        asDouble(col("embedding")).as("query_vec")),
      "query_id", "query_vec", nProbe)

    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("cand_id"))
    probes.join(assigned, Seq("centroid_id"))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("score",
        graft.functions.Rounding.round4(cosine(col("query_vec"), col("cand_vec"))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "cand_id", "score", "rank")
  }
}
