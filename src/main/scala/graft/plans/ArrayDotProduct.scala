package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential double-precision dot product of two numeric arrays.
  *
  * Spark's `aggregate`/`zip_with` higher-order functions evaluate an
  * interpreted lambda per element — far too slow for embedding math in
  * a hot loop. This native expression emits a tight codegen'd loop
  * (`doGenCode`), accumulating left-to-right in double exactly like the
  * DuckDB oracle (`list_dot_product` over DOUBLE[] casts), so results
  * stay bit-identical while running ~an order of magnitude faster.
  *
  * Arrays of unequal length: the shorter length wins (zip semantics).
  * NULL array → NULL; NULL elements are treated as 0.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t: NumericType, _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      // DecimalType is NumericType but has no primitive getter here —
      // reject it at analysis instead of an executor-side
      // IllegalStateException (r17 ADVICE)
      case (Some(_: DecimalType), _) | (_, Some(_: DecimalType)) =>
        TypeCheckResult.TypeCheckFailure(
          "array_dot does not support decimal element types; cast the " +
            "arrays to double")
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"array_dot requires two numeric arrays, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else toDouble(a, i, ta)
      val y = if (b.isNullAt(i)) 0.0 else toDouble(b, i, tb)
      acc += x * y
      i += 1
    }
    acc
  }

  private def toDouble(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case _ => throw new IllegalStateException(s"unsupported element type $t")
  }

  private def getter(t: DataType, arr: String, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case _ => throw new IllegalStateException(s"unsupported $t")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ta, tb) = (elemType(left).get, elemType(right).get)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.isNullAt($i) ? 0.0 : ${getter(ta, a, i)};
         |  double y = $b.isNullAt($i) ? 0.0 : ${getter(tb, b, i)};
         |  $acc += x * y;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayDotProduct = copy(newLeft, newRight)
}
