package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IDNA host normalization (RFC 3490, via `java.net.IDN.toASCII`):
  * a Unicode hostname becomes its punycode ASCII-Compatible-Encoding
  * form (`bücher.example` → `xn--bcher-kva.example`), so the Unicode
  * and ACE spellings of the same host canonicalize to ONE dedup key.
  *
  * Stability contract, tuned for dirty crawl input:
  *   - an all-ASCII host is returned UNCHANGED (fast path — IDNA is a
  *     no-op on ASCII, and this keeps already-punycoded `xn--` labels
  *     byte-stable and skips `toASCII`'s label-shape validation, which
  *     would throw on the empty/overlong labels real crawls contain);
  *   - a non-ASCII host that IDNA rejects (unassigned code points,
  *     label overflow) is returned unchanged rather than erroring —
  *     a malformed host must not kill a 100 TB ingest, and an
  *     un-normalized key only costs dedup recall on that one row;
  *   - output is lowercased (Nameprep lowercases anyway; this pins it).
  *
  * NULL in → NULL out. Codegen: a static call per row, no boxing
  * beyond the JDK API's String round-trip (non-ASCII rows only — the
  * ASCII fast path never leaves UTF8String).
  */
case class IdnToAscii(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "idn_to_ascii"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    IdnToAscii.toAsciiSafe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.IdnToAscii.toAsciiSafe($c);")

  override protected def withNewChildInternal(newChild: Expression): IdnToAscii =
    copy(child = newChild)
}

object IdnToAscii {

  /** Static entry point shared by interpreted eval and generated code. */
  def toAsciiSafe(s: UTF8String): UTF8String = {
    // all-ASCII fast path: byte scan, no String materialization
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) return s
    try UTF8String.fromString(
      java.net.IDN.toASCII(s.toString).toLowerCase(java.util.Locale.ROOT))
    catch { case _: IllegalArgumentException => s }
  }
}
