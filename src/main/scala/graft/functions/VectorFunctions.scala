package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, as
  * higher-order built-in expressions (zip_with / aggregate). Floats
  * are widened to double before multiplying, and the sum is a
  * sequential left fold — the same order DuckDB's list_sum uses — so
  * the oracle reproduces results bit-for-bit before rounding.
  */
object VectorFunctions {

  /** Dot product of two float-array columns, in double — the native
    * codegen'd expression (graft.expressions.DotProduct): one fused
    * loop, no intermediate array, identical fold order to the
    * higher-order formulation.
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.GraftFunctions.vec_dot(a, b)

  /** Reference (higher-order builtin) formulation, kept for
    * cross-checking the native expression in tests.
    */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Absmax scale for symmetric int8 quantization. */
  def absmaxScale(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double"))))

  /** Symmetric int8 quantize-then-dequantize round trip (the storage
    * codec applied at rest; floor(x+0.5) rounding so both engines
    * agree on identical doubles). Returns array<double>.
    */
  def dequantizedInt8(v: Column, scale: Column): Column =
    transform(v, x =>
      floor(x.cast("double") * 127.0 / scale + 0.5) * scale / 127.0)

  /** Squared L2 distance. */
  def l2Squared(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0d), (acc, v) => acc + v)
}
