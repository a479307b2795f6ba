package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._

import graft.plans.ArrayDotProduct

/** Vector math over `array<float>` embedding columns, UDF-free.
  *
  * All arithmetic is done in DOUBLE with strictly sequential (left-fold)
  * accumulation so results are bit-identical to a DuckDB oracle that
  * accumulates the same way — the floats are cast element-wise before
  * any multiply/add. The dot product is a native codegen'd Catalyst
  * expression (graft.plans.ArrayDotProduct): Spark's higher-order
  * `aggregate`/`zip_with` lambdas evaluate interpreted per element,
  * ~10x slower in the ANN hot loop.
  */
object VectorFunctions {

  /** Sequential double-precision dot product (native expression). */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm (guards the
    * ANSI-mode divide-by-zero error rather than returning NULL/Inf). */
  def cosine(a: Column, b: Column): Column = {
    val d = l2Norm(a) * l2Norm(b)
    when(d > 0, dotProduct(a, b) / d).otherwise(lit(0.0))
  }

  /** Symmetric int8 quantization scale: max |v_i| / 127 (0 for an
    * all-zero or empty vector). Storing embeddings as int8 + one
    * float scale is the standard 4x footprint cut before an ANN
    * index build. */
  def int8Scale(a: Column): Column =
    coalesce(
      array_max(transform(a, x => abs(x.cast("double")))) / 127, lit(0.0))

  /** Element-wise int8 quantization against a PRE-MATERIALIZED scale
    * column: q_i = floor(v_i/scale + 0.5) clamped to [-127, 127]
    * (floor(x+0.5) rounds identically in Spark and DuckDB; `round`'s
    * half-even/half-up split across engines would not). Pass `scale`
    * as a bound column, NOT an inline expression — an expression
    * captured in the lambda is re-evaluated per element (see
    * spark-hof-lambda-recompute). */
  def quantizeInt8(a: Column, scale: Column): Column =
    when(scale > 0,
      transform(a, x => least(lit(127L), greatest(lit(-127L),
        floor(x.cast("double") / scale + 0.5)))))
      .otherwise(transform(a, _ => lit(0L)))
}
