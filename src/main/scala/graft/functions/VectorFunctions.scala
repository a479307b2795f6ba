package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, UDF-free:
  * `zip_with` + `aggregate` stay inside whole-stage codegen.
  *
  * All arithmetic is done in DOUBLE with strictly sequential (left-fold)
  * accumulation so results are bit-identical to a DuckDB oracle that
  * accumulates the same way — the floats are cast element-wise before
  * any multiply/add.
  */
object VectorFunctions {

  /** Sequential double-precision dot product. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm (guards the
    * ANSI-mode divide-by-zero error rather than returning NULL/Inf). */
  def cosine(a: Column, b: Column): Column = {
    val d = l2Norm(a) * l2Norm(b)
    when(d > 0, dotProduct(a, b) / d).otherwise(lit(0.0))
  }
}
