package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-vector expressions built from higher-order functions — dot
  * product, norms, cosine — all codegen'd, all computed in double (float
  * inputs upcast first) so results are bit-reproducible across engines.
  */
object VectorFunctions {

  /** Upcast a float vector to double once, before any arithmetic. */
  def asDouble(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** Sequential-fold dot product (deterministic accumulation order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
