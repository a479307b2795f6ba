package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a
  * native expression. Crawled text arrives in mixed normalization
  * forms — macOS filenames and some editors emit decomposed NFD
  * (`e` + U+0301 combining acute), most web text is composed NFC,
  * and compatibility singletons (U+212B ANGSTROM SIGN, U+2126 OHM
  * SIGN) appear in scientific scrape — and the forms are
  * CODEPOINT-DISTINCT while rendering identically. Like mojibake
  * ([[MojibakeRepair]]), that silently poisons every downstream
  * keying step: the NFD and NFC spellings of one document never hash
  * equal (exact dedup misses), produce different shingles (near-dup
  * misses), and tokenize differently (vocabulary pollution — `café`
  * and `cafe´` learn separate BPE merges). Canonicalizing to NFC at
  * ingest is the standard first normalization step of every
  * pretraining text pipeline (and of the oracle engine itself:
  * DuckDB ships `nfc_normalize` for exactly this reason, which is
  * what makes this operator independently oracle-checkable).
  *
  * Semantics: `Normalizer.normalize(s, NFC)` — full canonical
  * decomposition then canonical composition, per UAX #15. NFC (not
  * NFKC) deliberately: canonical equivalence only, so visually and
  * semantically identical spellings unify, but compatibility
  * variants that carry meaning (ligatures, super/subscripts,
  * full-width forms) are left to an explicit downstream policy.
  *
  * Why a native expression: Spark has no normalization built-in, and
  * the static-call form stays inside whole-stage codegen where a UDF
  * would break the span. Two allocation-free fast paths cover almost
  * every row of a real corpus: pure-ASCII bytes are NFC by
  * construction (one branchless scan, no String materialized), and
  * already-normalized non-ASCII text returns the input UTF8String
  * after an `isNormalized` check (the common case — most crawl text
  * IS NFC — pays one verification pass, no re-encode).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** Static entry point shared by interpreted eval and generated
    * code. ASCII fast path scans bytes without materializing a
    * String; non-ASCII text that is already NFC returns the input
    * unchanged (same-reference, zero-copy). */
  def normalize(s: UTF8String): UTF8String = {
    val in = s.getBytes
    var i = 0
    while (i < in.length && (in(i) & 0x80) == 0) i += 1
    if (i == in.length) return s // pure ASCII is always NFC
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
