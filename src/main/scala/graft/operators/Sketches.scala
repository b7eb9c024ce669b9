package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch operators — the approximate-analytics layer a 100 TB
  * warehouse runs where exact answers are either unnecessary (distinct
  * counts for monitoring) or unaffordable (per-item frequencies over a
  * token stream).
  *
  * Both sketches here are DISTRIBUTIVE aggregates: executors build partial
  * sketches scan-locally, and the exchange carries fixed-size sketch bytes
  * (KBs) instead of per-key state — the property that makes them viable at
  * any scale and incrementally maintainable (yesterday's sketch unions
  * with today's batch; nothing is recomputed). The HLL side uses Spark's
  * built-in DataSketches aggregates (`hll_sketch_agg` / `hll_union_agg`),
  * whose union is LOSSLESS at fixed lgConfigK: the union of shard sketches
  * is byte-equivalent to a single sketch of the whole — asserted by the
  * driver gate, which is exactly the incremental-maintenance contract.
  */
object Sketches {

  /** Heavy hitters with count-min-sketch error certification: the top-k
    * items by exact count, each flagged with the CMS guarantees
    * (`estimate ≥ truth`, always; `estimate ≤ truth + ⌈eps·N⌉`, w.p.
    * `confidence` — deterministic here because the sketch seed is fixed).
    *
    * Distribution shape: the sketch is built by a distributive aggregate
    * (partials merge across the exchange); only the finished sketch —
    * `O(1/eps · ln(1/δ))` counters, independent of N — and the k result
    * rows ever reach the driver. The exact top-k pass exists to CERTIFY
    * the sketch in the gate; a production pipeline ships the sketch alone.
    */
  def cmsHeavyHitters(items: DataFrame, itemCol: String, k: Int,
                      eps: Double, confidence: Double,
                      seed: Int): DataFrame = {
    require(items.schema(itemCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"cmsHeavyHitters certifies string items; $itemCol is " +
        items.schema(itemCol).dataType.simpleString)
    require(k > 0 && eps > 0 && confidence > 0 && confidence < 1,
      s"invalid sketch parameters: k=$k eps=$eps confidence=$confidence")
    val spark = items.sparkSession
    val sk = items.agg(
      expr(s"count_min_sketch($itemCol, CAST($eps AS DOUBLE), " +
        s"CAST($confidence AS DOUBLE), $seed)").as("cms"),
      count(lit(1)).as("n")).head()
    if (sk.isNullAt(0)) { // zero input rows aggregate to a NULL sketch
      import spark.implicits._
      return Seq.empty[(String, Long, Boolean, Boolean)]
        .toDF(itemCol, "true_cnt", "lower_ok", "upper_ok")
    }
    val cms = CountMinSketch.readFrom(
      new ByteArrayInputStream(sk.getAs[Array[Byte]]("cms")))
    val slack = math.ceil(eps * sk.getAs[Long]("n")).toLong
    val top = items.groupBy(col(itemCol))
      .agg(count(lit(1)).as("true_cnt"))
      .orderBy(desc("true_cnt"), col(itemCol))
      .limit(k).collect()
    val rows = top.toIndexedSeq.map { r =>
      val item = r.getString(0)
      val t = r.getLong(1)
      val est = cms.estimateCount(item)
      (item, t, est >= t, est <= t + slack)
    }
    import spark.implicits._
    rows.toDF(itemCol, "true_cnt", "lower_ok", "upper_ok")
      .orderBy(itemCol)
  }
}
