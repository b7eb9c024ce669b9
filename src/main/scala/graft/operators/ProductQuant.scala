package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.asDouble

/** Product quantization (PQ) — the memory-side scale lever for ANN that
  * IVF (the compute-side lever, Similarity.scala) composes with: each
  * L2-normalized vector is split into `m` subvectors and every subvector
  * is replaced by the id of its nearest entry in a per-subspace codebook,
  * so a 64-dim float vector becomes `m` small ints (16× smaller at
  * m=8/ks=16 — the difference between an embedding corpus that fits in
  * executor memory and one that doesn't).
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * exact; per query a (m × ks) inner-product table against the codebooks
  * is precomputed, and a candidate's approximate cosine is the sum of m
  * table lookups — no per-candidate float vector ever read. A shortlist
  * of `rerank` ADC candidates is then re-scored with exact cosine
  * (the standard ADC-prune + exact-rerank production shape; plain ADC
  * recall on unclustered data is not worth gating).
  *
  * Scale shape: codebooks are m·ks·(d/m) doubles — always broadcast;
  * encoding is a scan-local projection (one pass, no shuffle); the ADC
  * score table is (|Q|·m·ks) doubles, built driver-side from the two
  * tiny inputs and broadcast against the CODES scan (same bounded-driver
  * contract as Similarity.fitCentroids — |Q| is small by the same rule
  * that lets bruteForceTopK broadcast queries); re-ranking touches
  * |Q|·rerank full vectors, a semi-join-sized fraction of the corpus.
  *
  * Determinism (same contract as the IVF fit): codebooks train on the
  * xxhash64-bounded sample, farthest-point init per subspace (max-min
  * L2, id tiebreak), fixed-iteration Lloyd with sequential-fold double
  * arithmetic, means re-rounded half-even at 1e-6, assignment ties to
  * the lowest code id, scores rounded to 4 decimals before ranking with
  * id tiebreaks. No RNG anywhere.
  */
object ProductQuant {

  final case class Codebooks(m: Int, ks: Int, subDim: Int,
                             codes: Array[Array[Array[Double]]])

  private[operators] def l2normalize(v: Array[Double]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    if (n == 0.0) v
    else {
      val s = math.sqrt(n)
      val out = new Array[Double](v.length)
      i = 0
      while (i < v.length) { out(i) = v(i) / s; i += 1 }
      out
    }
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** One subspace's codebook over a prepared (id, subvector) sample:
    * farthest-point init in L2 (first sample point seeds; each next code
    * is the subvector maximizing its min L2 distance to the chosen set,
    * id tiebreak) then `iters` Lloyd rounds with half-even 1e-6
    * re-rounding; empty cells keep their previous code. Shared by the
    * raw-vector fit below and [[IvfPq]]'s residual fit — identical
    * determinism contract in both. */
  private[operators] def fitBook(subSample: Array[(Long, Array[Double])],
                                 ks: Int, iters: Int): Array[Array[Double]] = {
    val subDim = subSample.head._2.length
    val chosen = scala.collection.mutable.Set(subSample.head._1)
    val init = scala.collection.mutable.ArrayBuffer(subSample.head._2)
    while (init.size < math.min(ks, subSample.length)) {
      val next = subSample.filterNot(p => chosen.contains(p._1))
        .minBy { case (id, v) =>
          // minBy on (-minDist, id): farthest first, id tiebreak
          (-init.map(c => math.rint(sqDist(v, c) * 1e6) / 1e6).min, id)
        }
      chosen += next._1
      init += next._2
    }
    var cents: Array[Array[Double]] = init.toArray
    for (_ <- 1 to iters) {
      val sums = Array.fill(cents.length)(new Array[Double](subDim))
      val counts = new Array[Long](cents.length)
      subSample.foreach { case (_, v) =>
        var best = 0; var bestScore = Double.MaxValue; var c = 0
        while (c < cents.length) {
          val s = sqDist(v, cents(c))
          if (s < bestScore) { bestScore = s; best = c }
          c += 1
        }
        var i = 0
        while (i < subDim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(x => math.rint(x / counts(c) * 1e6) / 1e6)
      }
    }
    cents
  }

  /** Per-subspace codebooks from the SAME deterministic bounded sample
    * as Similarity.fitCentroids (smallest xxhash64(id) rows): for each of
    * the `m` subspaces, [[fitBook]] over that subspace's sample slices. */
  def fitCodebooks(candidates: DataFrame, m: Int = 8, ks: Int = 16,
                   iters: Int = 5, sampleN: Int = 4096): Codebooks = {
    val sample: Array[(Long, Array[Double])] = candidates
      .select(col("vec_id").as("id"), asDouble(col("embedding")).as("vec"))
      .orderBy(xxhash64(col("id")), col("id")).limit(sampleN)
      .collect().map(r => (r.getLong(0),
        l2normalize(r.getSeq[Double](1).toArray)))
      .distinctBy(_._1)
    require(sample.nonEmpty, "cannot fit codebooks on an empty corpus")
    val d = sample.head._2.length
    require(d % m == 0, s"dim $d must divide into m=$m subspaces")
    val subDim = d / m

    val books = Array.tabulate(m) { sub =>
      fitBook(sample.map { case (id, v) =>
        (id, java.util.Arrays.copyOfRange(v, sub * subDim,
          (sub + 1) * subDim))
      }, ks, iters)
    }
    Codebooks(m, ks, subDim, books)
  }

  /** Codebooks as a DataFrame (sub, code_id, code_vec) — the persistable
    * index artifact (write next to an IVF index; both are tiny). */
  def codebooksDF(spark: SparkSession, cb: Codebooks): DataFrame = {
    import spark.implicits._
    (for {
      sub <- 0 until cb.m
      code <- cb.codes(sub).indices
    } yield (sub, code, cb.codes(sub)(code).toSeq))
      .toDF("sub", "code_id", "code_vec")
  }

  /** Encode every candidate as `m` code ids: scan-local projection, the
    * codebooks ride the closure (tiny), ties to the lowest code id. */
  def encode(candidates: DataFrame, cb: Codebooks): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    candidates.select(col("vec_id").as("id"),
        asDouble(col("embedding")).as("vec"))
      .as[(Long, Seq[Double])]
      .map { case (id, raw) =>
        val v = l2normalize(raw.toArray)
        val codes = new Array[Int](cb.m)
        var sub = 0
        while (sub < cb.m) {
          val s0 = sub * cb.subDim
          var best = 0; var bestScore = Double.MaxValue; var c = 0
          while (c < cb.codes(sub).length) {
            val cent = cb.codes(sub)(c)
            var s = 0.0; var i = 0
            while (i < cb.subDim) {
              val dd = v(s0 + i) - cent(i); s += dd * dd; i += 1
            }
            if (s < bestScore) { bestScore = s; best = c }
            c += 1
          }
          codes(sub) = best
          sub += 1
        }
        (id, codes.toSeq)
      }.toDF("cand_id", "codes")
  }

  /** ADC top-k with exact re-rank: approximate every (query, candidate)
    * cosine as the sum of m inner-product table lookups over the codes,
    * keep the `rerank` best per query, then re-score that shortlist with
    * exact cosine. Scores rounded to 4 decimals, id tiebreaks.
    *
    * Bounded-driver contract: the query side is collected to build the
    * broadcast IP tables, so it must be small. A cheap `limit(maxQ+1)`
    * probe (one column, scan stops early) enforces the bound BEFORE the
    * collect — an oversized query table fails loudly instead of OOMing
    * the driver (same discipline as [[fitCodebooks]]' `limit(sampleN)`
    * sample). Callers with more queries batch them. */
  def pqTopK(candidates: DataFrame, queries: DataFrame, cb: Codebooks,
             k: Int = 10, rerank: Int = 50, maxQ: Int = 65536): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val spark = candidates.sparkSession
    import spark.implicits._
    // per-query IP tables against the codebooks: |Q| x m x ks doubles,
    // built from the two tiny inputs and broadcast onto the codes scan.
    // The maxQ bound rides the collect itself (r19 — loud limit cap +
    // length recheck instead of a separate limit+count guard job).
    val qRows = queries
      .select(col("vec_id").as("query_id"),
        asDouble(col("embedding")).as("vec"))
      .limit(maxQ + 1)
      .as[(Long, Seq[Double])].collect()
      .map { case (id, raw) => (id, l2normalize(raw.toArray)) }
    require(qRows.length <= maxQ,
      s"pqTopK query side exceeds maxQ=$maxQ rows: the per-query ADC " +
        "tables are built driver-side and broadcast, so the query table " +
        "must be bounded — batch the queries or raise maxQ explicitly")
    val tables = qRows.map { case (qid, qv) =>
      val tbl = Array.tabulate(cb.m) { sub =>
        val s0 = sub * cb.subDim
        cb.codes(sub).map { cent =>
          var s = 0.0; var i = 0
          while (i < cb.subDim) { s += qv(s0 + i) * cent(i); i += 1 }
          s
        }.toSeq
      }.toSeq
      (qid, tbl)
    }.toSeq.toDF("query_id", "tbl")

    val codes = encode(candidates, cb)
    val adcW = Window.partitionBy("query_id")
      .orderBy(desc("adc"), asc("cand_id"))
    val shortlist = codes.join(broadcast(tables),
        col("query_id") =!= col("cand_id"))
      .withColumn("adc", graft.functions.Rounding.round4(
        expr("aggregate(zip_with(codes, tbl," +
          " (c, t) -> element_at(t, c + 1)), 0D, (acc, x) -> acc + x)")))
      .withColumn("__r", row_number().over(adcW))
      .where(col("__r") <= rerank)
      .select("query_id", "cand_id", "adc")
    // exact re-rank of the shortlist: |Q| x rerank full vectors only
    val exactQ = qRows.map { case (id, v) => (id, v.toSeq) }.toSeq
      .toDF("query_id", "qv")
    val cands = candidates.select(col("vec_id").as("cand_id"),
      asDouble(col("embedding")).as("cv"))
    val rerankW = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("cand_id"))
    shortlist.join(cands, "cand_id").join(broadcast(exactQ), "query_id")
      .withColumn("score", graft.functions.Rounding.round4(
        graft.functions.VectorFunctions.cosine(col("qv"), col("cv"))))
      .withColumn("rank", row_number().over(rerankW))
      .where(col("rank") <= k)
      .select("query_id", "cand_id", "score", "rank")
  }
}
