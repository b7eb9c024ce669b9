package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment join WITHOUT an equi key: left rows carrying a
  * timestamp matched to right rows carrying `[start, end)` intervals.
  *
  * Spark has no native range-join strategy — the naive formulation
  * `left.join(right, ts >= start && ts < end)` plans as a broadcast
  * nested-loop (O(|L|·|R|) comparisons), which dies long before 100 TB.
  * This operator manufactures the missing equi key by time-bucketing:
  * every point falls in exactly one `bucketSeconds` bucket, every interval
  * is exploded to the buckets it overlaps, the join runs as a plain
  * shuffled equi join on the bucket, and the exact predicate filters the
  * residue. Work is linear: |L| + |R|·(avg interval len / bucket width + 1)
  * rows shuffled, with matches confined to same-bucket partitions. Pick
  * `bucketSeconds` ≈ the typical interval length — wider buckets shuffle
  * fewer interval replicas but verify more candidates.
  *
  * Same decomposition DuckDB solves with IEJoin (the oracle side) and
  * range-join frameworks document for MPP engines; at extreme skew
  * (one hot bucket) compose with [[Salting.saltedJoin]] on the bucket key.
  *
  * Column names must be disjoint between `left` and `right` (the operator
  * joins on an internal bucket column only).
  */
object RangeJoin {

  def bucketed(left: DataFrame, leftTs: String,
               right: DataFrame, startCol: String, endCol: String,
               bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0, got $bucketSeconds")
    // integer `div` on epoch seconds — never through a double
    val lb = left.withColumn("__bucket",
      expr(s"CAST(`$leftTs` AS LONG) div $bucketSeconds"))
    val rb = right.withColumn("__bucket",
      explode(sequence(
        expr(s"CAST(`$startCol` AS LONG) div $bucketSeconds"),
        expr(s"CAST(`$endCol` AS LONG) div $bucketSeconds"))))
    // each left row lives in exactly one bucket and exploded buckets are
    // distinct per interval, so a matching pair meets exactly once — no
    // post-join dedup needed
    lb.join(rb, Seq("__bucket"))
      .where(col(leftTs) >= col(startCol) && col(leftTs) < col(endCol))
      .drop("__bucket")
  }
}
