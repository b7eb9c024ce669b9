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
