package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §6.2.2.2 percent-encoding normalization as ONE in-row
  * byte pass: every valid `%XY` escape gets uppercase hex, escapes of
  * UNRESERVED characters (ALPHA / DIGIT / `-` / `.` / `_` / `~`,
  * §2.3) are decoded, anything else — including a bare `%` not
  * followed by two hex digits — is copied through untouched.
  *
  * The composed alternative (split on `%` → higher-order transform
  * with hex parse per token → re-join) evaluates its lambda
  * INTERPRETED per token and allocates the token array per row —
  * measured ~3× the whole x56 entry's cost at sf0.1. This expression
  * is a single allocation-bounded scan (output ≤ input bytes since
  * decoding only shrinks), codegen-friendly via a static call, and
  * UTF-8-safe by construction: only ASCII bytes are inspected or
  * rewritten, and multi-byte sequences (high bit set) can never match
  * `%` or a hex digit, so they are copied verbatim.
  *
  * Engine parity: the DuckDB twin ([[graft.operators.Web.percentNormalizeSql]])
  * implements the same spec with list functions — both are generated
  * from the same unreserved-set constants and the oracle gates
  * bit-equality of the final strings.
  */
case class PercentNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "percent_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PercentNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PercentNormalize.normalize($c);")

  override protected def withNewChildInternal(
      newChild: Expression): PercentNormalize = copy(child = newChild)
}

object PercentNormalize {

  /** -1 for a non-hex byte, else the digit value. */
  private def hexVal(b: Byte): Int = b match {
    case d if d >= '0' && d <= '9' => d - '0'
    case a if a >= 'a' && a <= 'f' => a - 'a' + 10
    case a if a >= 'A' && a <= 'F' => a - 'A' + 10
    case _ => -1
  }

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' ||
      v == '~'

  private val UpperHex = "0123456789ABCDEF".getBytes

  /** Static entry point shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val in = s.getBytes
    // fast path: no '%' at all (the overwhelming majority of URLs)
    var probe = 0
    while (probe < in.length && in(probe) != '%') probe += 1
    if (probe == in.length) return s
    // decoding only ever shrinks, so input length bounds the output
    val out = new Array[Byte](in.length)
    var i = 0
    var o = 0
    while (i < in.length) {
      val b = in(i)
      if (b == '%' && i + 2 < in.length) {
        val h = hexVal(in(i + 1))
        val l = hexVal(in(i + 2))
        if (h >= 0 && l >= 0) {
          val v = h * 16 + l
          if (isUnreserved(v)) {
            out(o) = v.toByte; o += 1
          } else {
            out(o) = '%'; out(o + 1) = UpperHex(h); out(o + 2) = UpperHex(l)
            o += 3
          }
          i += 3
        } else { out(o) = b; o += 1; i += 1 }
      } else { out(o) = b; o += 1; i += 1 }
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }
}
