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

  /** Deterministic Lloyd's k-means coarse quantizer for [[ivfTopK]].
    *
    * Spark shape: the fit runs on a bounded deterministic sample (the
    * `sampleN` rows with the smallest `xxhash64(id)` — a seedless
    * pseudo-random draw that is stable across partitionings), so training
    * cost is O(sampleN · k · iters) regardless of corpus size — the same
    * train-on-a-sample contract every production coarse quantizer uses.
    * Each iteration is one distributed pass over the sample: assign via a
    * broadcast of the k centroids, re-center via posexplode + per-(cluster,
    * dim) average with map-side partials; only k×dim doubles ever reach
    * the driver. Assignment of the FULL candidate set stays in [[ivfTopK]].
    *
    * Determinism (workflow requirement — no RNG anywhere): init is a
    * farthest-point (k-center greedy) traversal of the sample — seeded at
    * the smallest `xxhash64(id)`, each next centroid is the sample point
    * minimizing its max cosine to the chosen set (id tiebreak) — which
    * spreads the seeds across the data regardless of id layout; assignment
    * scores are rounded to 4 decimals with id tiebreaks, and re-centered
    * components are rounded to 6 decimals so float summation order across
    * partitions cannot perturb the result. Empty clusters keep their
    * previous centroid. Cosine metric: centroid scale is irrelevant to
    * cosine ranking, so no normalization step.
    */
  def fitCentroids(candidates: DataFrame, k: Int, iters: Int = 5,
                   sampleN: Int = 4096): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val sample = candidates
      .select(col("vec_id").as("id"), asDouble(col("embedding")).as("vec"))
      .orderBy(xxhash64(col("id")), col("id")).limit(sampleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seed = sample.orderBy(xxhash64(col("id")), col("id")).limit(1)
        .collect().head.getSeq[Double](1)
      val init = scala.collection.mutable.ArrayBuffer((0, seed))
      while (init.size < k) {
        val centDf = broadcast(init.toSeq.toDF("centroid_id", "centroid_vec"))
        val next = sample.crossJoin(centDf)
          .groupBy("id").agg(
            max(graft.functions.Rounding.round4(
              cosine(col("vec"), col("centroid_vec")))).as("closest"),
            first(col("vec")).as("vec"))
          .orderBy(col("closest").asc, col("id").asc).limit(1)
          .collect().head
        init += ((init.size, next.getSeq[Double](2)))
      }
      var cents: Array[(Int, Seq[Double])] = init.toArray
      for (_ <- 1 to iters) {
        val centDf = broadcast(cents.toSeq.toDF("centroid_id", "centroid_vec"))
        val scored = sample.crossJoin(centDf)
          .withColumn("cscore", graft.functions.Rounding.round4(
            cosine(col("vec"), col("centroid_vec"))))
        // argmax centroid per vector, ties to the lowest centroid id
        val assigned = scored.groupBy("id").agg(
          max_by(col("centroid_id"),
            struct(col("cscore"), -col("centroid_id"))).as("cid"),
          first(col("vec")).as("vec"))
        val means = assigned
          .select(col("cid"), posexplode(col("vec")).as(Seq("pos", "x")))
          .groupBy("cid", "pos").agg(avg("x").as("m"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cid, rows) =>
            val v = rows.sortBy(_.getInt(1))
              .map(r => math.rint(r.getDouble(2) * 1e6) / 1e6).toSeq
            (cid, v)
          }
        cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
      }
      cents.toSeq.toDF("centroid_id", "centroid_vec")
    } finally sample.unpersist(blocking = false)
  }

  /** The pre-k-means centroid stand-in (first `k` vectors by id) — kept as
    * the baseline SimilaritySpec measures [[fitCentroids]] against. */
  def firstNCentroids(candidates: DataFrame, k: Int): DataFrame =
    candidates.orderBy("vec_id").limit(k)
      .select(col("vec_id").cast("int").as("centroid_id"),
        asDouble(col("embedding")).as("centroid_vec"))

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
    * Centroids default to a deterministic Lloyd's k-means fit
    * ([[fitCentroids]]); pass `centroids` to reuse a fit across calls or
    * to substitute a different quantizer (SimilaritySpec uses a naive
    * first-N quantizer as the comparison baseline).
    */
  def ivfTopK(candidates: DataFrame, queries: DataFrame, k: Int,
              nClusters: Int = 16, nProbe: Int = 4,
              centroids: Option[DataFrame] = None): DataFrame = {
    val cents = centroids.getOrElse(fitCentroids(candidates, nClusters))
      .select(col("centroid_id").cast("int").as("centroid_id"),
        col("centroid_vec").as("centroid_vec"))

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
