package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Repair of DOUBLE-ENCODED UTF-8 ("mojibake"): text whose producer
  * decoded UTF-8 bytes as ISO-8859-1, so every multi-byte sequence
  * surfaces as a run of Latin-1 characters (`é` → `Ã©`, `ü` → `Ã¼`).
  * This is the single most common encoding corruption in web crawls
  * (a UTF-8 page served or re-stored under a Latin-1 default), and it
  * silently poisons dedup keys, language ID, and tokenization — the
  * corrupted and clean forms of the same document never hash equal.
  *
  * Semantics — a strict, total inverse of one mis-decode step:
  *   1. If every code point of the input is ≤ U+00FF, reinterpret the
  *      code points as raw bytes (the inverse of the Latin-1 decode).
  *   2. If those bytes are VALID UTF-8 under RFC 3629 (no overlongs,
  *      no surrogates, no > U+10FFFF) *and* contain at least one
  *      multi-byte sequence, return them as the repaired string.
  *   3. Otherwise return the input unchanged — the expression never
  *      corrupts text that wasn't double-encoded, and pure-ASCII text
  *      takes a zero-allocation fast path.
  * Step 2's validity requirement makes accidental repair vanishingly
  * unlikely: natural Latin-1 text (`São Paulo café`) almost never
  * forms valid multi-byte UTF-8, so it passes through untouched.
  *
  * Triple-encoded text repairs one layer per call; callers wanting a
  * fixpoint iterate (bounded: each repair strictly shrinks).
  *
  * Why a native expression: the byte-level scan has no built-in
  * equivalent (Spark's `decode` raises on malformed input since 3.5 —
  * unusable as a "try" probe), and like [[PercentNormalize]] the
  * single static-call form stays inside whole-stage codegen where a
  * UDF would break the span. Detection (is this row mojibake?) stays
  * a plain `rlike` both engines share; only repair needs bytes.
  */
case class MojibakeRepair(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "mojibake_repair"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MojibakeRepair.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MojibakeRepair.repair($c);")

  override protected def withNewChildInternal(
      newChild: Expression): MojibakeRepair = copy(child = newChild)
}

object MojibakeRepair {

  /** Static entry point shared by interpreted eval and generated code.
    *
    * The input's own UTF-8 bytes encode only code points ≤ U+00FF iff
    * every non-ASCII sequence is two bytes with lead `C2`/`C3` — so
    * the Latin-1 re-encode is a single pass over those bytes (`C2 xx`
    * → `xx`, `C3 xx` → `xx + 0x40`), never a char-by-char decode. */
  def repair(s: UTF8String): UTF8String = {
    val in = s.getBytes
    // fast path: pure ASCII cannot be mojibake
    var probe = 0
    while (probe < in.length && (in(probe) & 0x80) == 0) probe += 1
    if (probe == in.length) return s
    // Latin-1 re-encode; any code point > U+00FF (lead byte >= C4 or
    // a 3-/4-byte sequence) means step 1 fails -> return unchanged
    val bytes = new Array[Byte](in.length)
    var i = 0
    var n = 0
    while (i < in.length) {
      val b = in(i) & 0xFF
      if (b < 0x80) { bytes(n) = b.toByte; n += 1; i += 1 }
      else if (b == 0xC2 && i + 1 < in.length) {
        bytes(n) = in(i + 1); n += 1; i += 2
      } else if (b == 0xC3 && i + 1 < in.length) {
        bytes(n) = ((in(i + 1) & 0xFF) + 0x40).toByte; n += 1; i += 2
      } else return s
    }
    if (!validUtf8WithMultibyte(bytes, n)) s
    else UTF8String.fromBytes(java.util.Arrays.copyOf(bytes, n))
  }

  /** RFC 3629 strict validation over `bytes[0, n)`: well-formed
    * sequences only (shortest form, no surrogates, ≤ U+10FFFF), and
    * at least one multi-byte sequence present (an all-ASCII result
    * means the input wasn't mojibake — nothing to repair). */
  private def validUtf8WithMultibyte(bytes: Array[Byte], n: Int): Boolean = {
    var i = 0
    var sawMulti = false
    def cont(j: Int): Boolean =
      j < n && (bytes(j) & 0xC0) == 0x80
    while (i < n) {
      val b = bytes(i) & 0xFF
      if (b < 0x80) i += 1
      else if (b >= 0xC2 && b <= 0xDF) {
        if (!cont(i + 1)) return false
        sawMulti = true; i += 2
      } else if (b == 0xE0) {
        if (!(i + 2 < n && (bytes(i + 1) & 0xFF) >= 0xA0 &&
            (bytes(i + 1) & 0xFF) <= 0xBF && cont(i + 2))) return false
        sawMulti = true; i += 3
      } else if (b >= 0xE1 && b <= 0xEC || b == 0xEE || b == 0xEF) {
        if (!(cont(i + 1) && cont(i + 2))) return false
        sawMulti = true; i += 3
      } else if (b == 0xED) {
        // exclude UTF-16 surrogates U+D800-U+DFFF
        if (!(i + 2 < n && (bytes(i + 1) & 0xFF) >= 0x80 &&
            (bytes(i + 1) & 0xFF) <= 0x9F && cont(i + 2))) return false
        sawMulti = true; i += 3
      } else if (b == 0xF0) {
        if (!(i + 3 < n && (bytes(i + 1) & 0xFF) >= 0x90 &&
            (bytes(i + 1) & 0xFF) <= 0xBF && cont(i + 2) && cont(i + 3)))
          return false
        sawMulti = true; i += 4
      } else if (b >= 0xF1 && b <= 0xF3) {
        if (!(cont(i + 1) && cont(i + 2) && cont(i + 3))) return false
        sawMulti = true; i += 4
      } else if (b == 0xF4) {
        // cap at U+10FFFF
        if (!(i + 3 < n && (bytes(i + 1) & 0xFF) >= 0x80 &&
            (bytes(i + 1) & 0xFF) <= 0x8F && cont(i + 2) && cont(i + 3)))
          return false
        sawMulti = true; i += 4
      } else return false // C0/C1 overlongs, F5+, stray continuation
    }
    sawMulti
  }
}
