package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: match each left row to the most recent right
  * row with `right.ts <= left.ts` within the same partition key — the
  * temporal lookup a Data Vault / feature-store pipeline needs ("which
  * satellite version was current when this event happened").
  *
  * Spark has no native as-of join; the naive form is a range join that
  * explodes to |L|·|R| per key. This operator uses the union+window
  * algorithm instead: tag both sides, sort within key by (ts, side), carry
  * the last right payload forward with last(ignoreNulls) over a running
  * frame, keep left rows. Cost: ONE shuffle on the key (the window sort) —
  * no range cross-product, no per-row probe. At 100 TB this is the only
  * shape that survives: work is linear in |L|+|R| and the shuffle key is
  * the partition key, so skew tooling (AQE/salting) applies unchanged.
  *
  * Tie semantics: a right row at exactly left.ts matches (inclusive <=),
  * like DuckDB's ASOF JOIN — the oracle for this operator. Right-side
  * duplicates per (key, ts) must be pre-deduplicated for determinism.
  */
object AsOfJoin {

  /** @param left        probe side; all columns pass through
    * @param right       build side: keys ++ tsCol ++ payload columns
    * @param keys        equality keys
    * @param tsCol       ordering column name (present on both sides)
    * @param payloadCols right columns to carry (renamed as-is in output)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__payload",
        lit(null).cast(right.select(payloadCols.map(col): _*).schema))
    val r = right.select(
      (keys.map(col) :+ col(tsCol) :+
        struct(payloadCols.map(col): _*).as("__payload")): _*)
      .withColumn("__side", lit(0))
    // align schemas: right rows carry nulls for non-key left columns
    val lOut = l.select((leftCols.map(col) :+ col("__side") :+
      col("__payload")): _*)
    val rOut = r.select(leftCols.map(c =>
      if (keys.contains(c) || c == tsCol) col(c)
      else lit(null).cast(left.schema(c).dataType).as(c)) :+
      col("__side") :+ col("__payload"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lOut.unionByName(rOut)
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true)
        .over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(p => col(s"__matched.$p").as(p)): _*)
  }

  /** Point-in-time filter over an SCD2 table: the rows valid at `ts`
    * (valid_from <= ts < valid_to) — the satellite-lookup special case. */
  def validAt(scd2: DataFrame, ts: Column): DataFrame =
    scd2.where(col("valid_from") <= ts && ts < col("valid_to"))
}
