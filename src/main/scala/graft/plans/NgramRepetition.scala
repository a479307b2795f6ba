package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style n-gram repetition signals of a token array, computed
  * IN-ROW in one counting pass (generalizes [[TopBigramFraction]] to
  * any n and adds the duplicate-mass signal):
  *
  *   - `top_frac`: occurrences of the single most frequent n-gram /
  *     total n-gram occurrences — catches one phrase looping;
  *   - `dup_frac`: occurrences belonging to any n-gram seen more than
  *     once / total occurrences — catches broad boilerplate churn
  *     that no single gram dominates.
  *
  * Both are `0.0` for arrays with fewer than `n` tokens; NULL array →
  * NULL row. Like the bigram form, the composed alternative (explode
  * n-grams → two keyed groupBys → join back) re-shuffles every gram
  * string in the corpus for a per-document scalar — at 100 TB, twice
  * the corpus through the exchange per n. In-row counting keeps the
  * operator a narrow projection; the per-row map is O(tokens) time
  * and O(distinct grams) space, bounded by document length.
  *
  * Engine parity: grams are space-joined windows of whitespace-split
  * tokens (which contain no spaces), so DuckDB's
  * `tk[i] || ' ' || ... || tk[i+n-1]` grouping partitions occurrences
  * identically, `sum(n) = len - n + 1` exactly, and both engines end
  * with the same double divisions.
  */
case class NgramRepetition(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 2, "n-gram size must be >= 2")

  override def dataType: DataType = StructType(Seq(
    StructField("top_frac", DoubleType, nullable = false),
    StructField("dup_frac", DoubleType, nullable = false)))

  override def prettyName: String = s"ngram_repetition_$n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NgramRepetition.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NgramRepetition.compute($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): NgramRepetition = copy(child = newChild)
}

object NgramRepetition {

  private val Sep = UTF8String.fromString(" ")

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(a: ArrayData, n: Int): InternalRow = {
    val len = a.numElements()
    if (len < n) return new GenericInternalRow(Array[Any](0.0, 0.0))
    def tok(i: Int): UTF8String =
      if (a.isNullAt(i)) UTF8String.EMPTY_UTF8 else a.getUTF8String(i)
    val counts = new java.util.HashMap[UTF8String, Integer]()
    val total = len - n + 1
    var max = 0
    var i = 0
    while (i < total) {
      val parts = new Array[UTF8String](2 * n - 1)
      var k = 0
      while (k < n) {
        parts(2 * k) = tok(i + k)
        if (k < n - 1) parts(2 * k + 1) = Sep
        k += 1
      }
      // concat copies out of any reused scan buffer, so keys are stable
      val key = UTF8String.concat(parts: _*)
      val c = counts.merge(key, 1, (x: Integer, y: Integer) => x + y)
      if (c > max) max = c
      i += 1
    }
    var dup = 0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      if (c > 1) dup += c
    }
    new GenericInternalRow(
      Array[Any](max.toDouble / total.toDouble, dup.toDouble / total.toDouble))
  }
}
