package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Tables.t
import graft.operators.Similarity

/** Driver-gated queries for similarity search over the `embeddings` table.
  *
  * All vector arithmetic runs in double with a fixed fold order and scores
  * are rounded to 4 decimals before ranking, so the DuckDB oracle (also
  * double) agrees bit-for-bit on ranks.
  */
object VectorQueries {

  val all: Seq[Q] = Seq(

    // Exact brute-force cosine top-k: the correctness baseline for ANN.
    Q("q_ann_brute",
      """WITH q AS (SELECT vec_id AS query_id,
        |                  CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS cand_id,
        |         round(list_cosine_similarity(qv,
        |               CAST(e.embedding AS DOUBLE[])), 4) AS score
        |  FROM q, embeddings e WHERE e.vec_id != q.query_id),
        |ranked AS (
        |  SELECT query_id, cand_id, score,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY score DESC, cand_id) AS rank
        |  FROM scored)
        |SELECT query_id, cand_id, score, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin) {
      (s, dir) =>
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 5), k = 10)
          .withColumn("rank", col("rank").cast("long"))
          .orderBy("query_id", "rank")
    },

    // IVF ANN: nearest-centroid partitioning + multi-probe search — the
    // scale path. Approximate by construction → rows-only here; recall vs
    // brute force is asserted in SimilaritySpec.
    Q.rowsOnly("q_ann_ivf") { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 5), k = 10,
          nClusters = 16, nProbe = 4)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
  )
}
