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

  /** Per-vector int8 scalar-quantization scale: max|x| / 127. At 100 TB
    * this is the 4×-8× memory/IO lever for ANN candidate storage — codes
    * ship as 1 byte/dim instead of 4-8, and because cosine is
    * scale-invariant the QUANTIZED cosine needs no dequantization at all.
    * Zero vectors quantize to all-zero codes (scale 0 guarded). */
  def quantizeScale(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x))) / lit(127.0)

  /** int8 codes for `v` at `scale`: floor(x/scale + 0.5) — explicit
    * half-up, identical in every engine (SQL round() tie rules differ).
    * Returned as double for direct use in [[cosine]]; cast to tinyint at
    * the storage boundary. */
  def quantize8(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0.0))
        .otherwise(floor(x / scale + lit(0.5)).cast("double")))

  /** Reconstruction of [[quantize8]] codes. Error is bounded by scale/2
    * per component — asserted by the q_embed_quantize gate. */
  def dequantize8(codes: Column, scale: Column): Column =
    transform(codes, q => q * scale)
}
