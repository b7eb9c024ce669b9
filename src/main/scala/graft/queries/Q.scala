package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gated query: a Spark implementation over an sf dir plus the
  * equivalent DuckDB SQL (None → driver records a weaker rows-only check).
  *
  * Determinism contract (the driver hash-compares values): every query
  * orders its output by a total key, aliases every computed column to the
  * same name on both sides, and rounds any double produced by an
  * order-sensitive aggregation (sum/avg over doubles) so Spark's partial
  * aggregation order and DuckDB's scan order can't flip low bits.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
