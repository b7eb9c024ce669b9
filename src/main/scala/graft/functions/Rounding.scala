package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Cross-engine-stable rounding.
  *
  * `roundCompat` rounds the SCALED BINARY double half away from zero —
  * exactly what DuckDB's `round(double, s)` computes. Spark's `round()`
  * instead rounds the shortest decimal representation of the double
  * (`BigDecimal.valueOf(d).setScale(s, HALF_UP)`), which disagrees on
  * decimal ties: for raw = 0.31575 (binary value 0.3157499999…) Spark
  * yields 0.3158 while DuckDB yields 0.3157. Every oracled query that
  * rounds a double must use this form so both engines agree bit-for-bit
  * even when a value lands exactly on a rounding boundary.
  *
  * Domain: |c·10^scale| must stay below 2^53 (true for every catalog
  * aggregate; sums ≈1e10 at scale 4 give 1e14).
  */
object Rounding {

  def roundCompat(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    val scaled = c * p
    when(scaled >= 0, floor(scaled + 0.5))
      .otherwise(ceil(scaled - 0.5))
      .cast(DoubleType) / p
  }

  /** The common catalog form. */
  def round4(c: Column): Column = roundCompat(c, 4)
}
