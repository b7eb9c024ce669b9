package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-duplicate pair graph — the step that
  * turns dedup PAIRS into dedup DECISIONS: every document in a duplicate
  * cluster maps to one canonical id (the cluster minimum), and a pipeline
  * keeps exactly the rows where `id == canonical`.
  *
  * Algorithm: min-label propagation (Pregel-lite). Each node starts
  * labeled with its own id; every round each node takes the min of its
  * label and its neighbors' labels; converges in O(graph diameter) rounds.
  * Near-dup graphs are shallow (clusters are cliques-ish, diameter ≤ ~3),
  * so the loop terminates in a handful of rounds — `maxIter` bounds
  * adversarial chains, and the operator FAILS LOUDLY rather than returning
  * a half-converged labeling.
  *
  * Scale shape: one shuffle per round (the neighbor-min aggregation), all
  * joins on the node id. Storage discipline: each round persists its
  * output, materializes it via the convergence count, then frees the
  * previous round — at most two label copies live at any moment. Every
  * `CheckpointEvery` rounds the frame is additionally localCheckpoint'ed
  * to truncate the iterative lineage (the plan would otherwise nest one
  * join deeper per round and the optimizer re-walks the whole history);
  * checkpoint blocks are bounded at diameter/CheckpointEvery copies, the
  * price of fast recovery should a persisted partition be lost. For graphs
  * whose diameter is itself the problem (billions of edges, long chains),
  * swap in the alternating large-star/small-star algorithm (Kiveris et
  * al., "Connected Components in MapReduce and Beyond") — same DataFrame
  * surface.
  */
object ConnectedComponents {

  private val CheckpointEvery = 5

  /** @param pairs edges as two id columns (any orientation, dups fine)
    * @return (id, canonical) for every id appearing in `pairs` */
  def canonicalize(pairs: DataFrame, id1Col: String = "id1",
                   id2Col: String = "id2", maxIter: Int = 20): DataFrame = {
    val sym = pairs.select(col(id1Col).as("a"), col(id2Col).as("b"))
      .union(pairs.select(col(id2Col).as("a"), col(id1Col).as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = sym.select(col("a").as("id")).distinct()
        .withColumn("canonical", col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        // One round = one join + ONE aggregation: neighbor candidates and
        // the node's own label union into a single min — the self row both
        // keeps the label monotone (canonical = least(prev, neighborMin))
        // and carries the previous label through the same aggregate
        // (min over the unique self row), so convergence is read off the
        // SAME materialized frame with no per-round re-join. Two
        // label-sized exchanges per round instead of three.
        val cand = sym
          .join(labels.select(col("id").as("b"), col("canonical").as("cand")),
            "b")
          .select(col("a").as("id"), col("cand"), lit(false).as("self"))
          .union(labels.select(col("id"), col("canonical").as("cand"),
            lit(true).as("self")))
        var updated = cand.groupBy("id").agg(
          min(when(col("self"), col("cand"))).as("__prev"),
          min("cand").as("canonical"))
        updated =
          if (iter % CheckpointEvery == CheckpointEvery - 1)
            updated.localCheckpoint(true) // truncate the iterative lineage
          else updated.persist(StorageLevel.MEMORY_AND_DISK)
        // count() (not isEmpty) fully materializes the round before the
        // previous copy is released
        converged = updated.where(col("canonical") =!= col("__prev"))
          .count() == 0
        labels.unpersist() // updated is materialized; free the prior copy
        labels = updated.drop("__prev")
        iter += 1
      }
      require(converged,
        s"connected components did not converge in $maxIter rounds — " +
          "graph diameter exceeds the bound; raise maxIter or use an " +
          "alternating-star variant for long-chain graphs")
      labels
    } finally sym.unpersist() // also on the non-convergence throw
  }
}
