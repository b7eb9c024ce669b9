package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the engine-side generalization of
  * the reference's per-column constraint registry (`meta.etl_col`
  * constraint codes + the CHECK at ddl.py:63, enforced by `stg_checker`):
  * every row-level expectation is evaluated in ONE aggregation pass over
  * the table, and the report comes back as (rule, violations) rows a
  * pipeline can gate on.
  *
  * Scale shape: row-level checks compile to `sum(when(...))` columns in a
  * single `HashAggregate` — one scan, map-side partials, one tiny result
  * row regardless of table size. Uniqueness is the one check that needs a
  * shuffle (distinct count over the key); it runs as its own aggregation
  * and unions into the same report.
  */
object Validate {

  /** One scan, n expectations: `checks` maps rule name → predicate that
    * must hold for every row; the report counts violating rows per rule.
    */
  def report(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val aggs = checks.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(name)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.unpivot(Array.empty[Column],
      checks.map { case (name, _) => col(name).as(name) }.toArray,
      "rule", "violations")
  }

  /** Bucketed content checksums — the table-reconciliation primitive:
    * compare two copies of a 100 TB table (replica, migration target,
    * another engine) by exchanging `nBuckets` (bucket, count, checksum)
    * rows instead of data. Row hash = the first 11 hex chars of
    * md5(concat_ws of the content columns) as a 44-bit integer, summed
    * per bucket in decimal(38,0) (128-bit — a raw int64 sum would wrap
    * silently past ~2^19 rows per bucket, exactly the scale the function
    * targets, and wrap differently from an engine that sums wider) and
    * reduced modulo the Mersenne prime 2^61-1, so the published checksum
    * is closed under int64 regardless of bucket cardinality and any
    * engine that can sum exactly (DuckDB sums to HUGEINT) reproduces it:
    * commutative (scan order irrelevant), engine-portable (md5 text is
    * byte-identical everywhere — the same property the MinHash oracles
    * lean on). Mismatched buckets localize the diff to 1/nBuckets of the
    * keyspace for drill-down.
    *
    * Content columns should be strings/integrals (cast upstream) —
    * float-to-string rendering is NOT cross-engine-portable.
    */
  val ChecksumModulus: Long = (1L << 61) - 1 // Mersenne prime 2^61-1

  def bucketChecksums(df: DataFrame, bucketKey: Column, nBuckets: Int,
                      contentCols: Seq[Column]): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    df.select(pmod(bucketKey, lit(nBuckets)).as("bucket"),
        conv(substring(md5(concat_ws("|", contentCols: _*)), 1, 11), 16, 10)
          .cast("decimal(38,0)").as("__rh"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        pmod(sum("__rh"), lit(ChecksumModulus))
          .cast("long").as("checksum"))
  }

  /** Key-uniqueness check: violations = rows beyond the first per key.
    * Null keys count as violations (a null pk is never a valid identity).
    */
  def uniqueness(df: DataFrame, ruleName: String,
                 keyCols: Seq[String]): DataFrame = {
    val nonNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    // duplicates among non-null keys + every null-key row
    df.agg(
      (sum(when(nonNull, 1L).otherwise(0L)) -
        count_distinct(when(nonNull, struct(keyCols.map(col): _*))) +
        sum(when(!nonNull, 1L).otherwise(0L))).as("violations"))
      .select(lit(ruleName).as("rule"), col("violations"))
  }
}
