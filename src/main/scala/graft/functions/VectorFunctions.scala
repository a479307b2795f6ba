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
}
