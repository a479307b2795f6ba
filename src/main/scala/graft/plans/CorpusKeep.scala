package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** The corpus-hygiene keep predicate as ONE expression: tokenize once,
  * compute the quality score and language ID in a single pass, and
  * return `quality >= minQuality && lang ∈ langs`.
  *
  * Why an expression and not a composition: Catalyst pushes a
  * deterministic Filter through the Project that materialized the
  * token array, substituting the alias back into the condition — so a
  * composed filter re-tokenizes the document once per metric
  * reference (~8x), and FilterExec does no subexpression elimination.
  * A single scalar predicate is pushed intact and evaluated once per
  * row. CodegenFallback trades the whole-stage-codegen span of the
  * filter for the 8x reduction in tokenization work, which dominates
  * on real documents.
  *
  * The arithmetic mirrors TextAnalysis.qualityScoreFromTokens /
  * langIdFromTokens term for term (same operation order, same
  * space-only trim, same codepoint-counted lengths) so results are
  * bit-identical to both the composed forms and the DuckDB oracle.
  * Empty text scores quality 0 (the alpha term is zero-guarded, as is
  * the composed alphaRatio); NULL text is not kept. */
case class CorpusKeep(child: Expression, minQuality: Double,
    langs: Seq[String], stopwords: Seq[String],
    langMarkers: Seq[(String, Seq[String])])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "corpus_keep"

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val stopSet = stopwords.toSet
  @transient private lazy val markerSets =
    langMarkers.map { case (l, words) => (l, words.toSet) }
  @transient private lazy val langSet = langs.toSet

  // Spark's trim() strips 0x20 only — NOT java's String.trim (<= 0x20).
  private def sparkTrim(s: String): String = {
    var i = 0; var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return false
    val text = v.asInstanceOf[UTF8String].toString
    val toks = ws.split(sparkTrim(text), -1)
    val nTok = toks.length.toDouble
    var sw = 0; var lenSum = 0L
    val marks = new Array[Int](markerSets.length)
    toks.foreach { t =>
      if (stopSet.contains(t)) sw += 1
      lenSum += t.codePointCount(0, t.length)
      var i = 0
      while (i < marks.length) {
        if (markerSets(i)._2.contains(t)) marks(i) += 1
        i += 1
      }
    }
    val len = text.codePointCount(0, text.length)
    // count [A-Za-z] exactly (the regex class, not Unicode letters)
    val alphaChars =
      text.count(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))
    val alpha = if (len > 0) alphaChars.toDouble / len else 0.0
    val meanLen = lenSum.toDouble / nTok
    val bonus = if (meanLen >= 3 && meanLen <= 10) 0.2 else 0.0
    val quality = sw.toDouble / nTok * 0.4 + alpha * 0.4 + bonus
    // first language in declaration order with the (positive) max score
    val best = if (marks.isEmpty) 0 else marks.max
    var lang = "und"
    if (best > 0) {
      var i = marks.length - 1
      while (i >= 0) { if (marks(i) == best) lang = markerSets(i)._1; i -= 1 }
    }
    quality >= minQuality && langSet.contains(lang)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
