package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (nats) of a string's character distribution as a
  * native expression — the information-theoretic quality signal of a
  * corpus pipeline: keyboard mash, padding runs, ASCII-art and
  * template boilerplate all have character distributions far narrower
  * than prose (English sits around 2.7-3.0 nats per character), so a
  * low-entropy cut catches degenerate documents that length and
  * stopword ratios (x9) miss. Complements the repetition family
  * (x26's n-gram ratios catch REPEATED STRUCTURE; entropy catches
  * NARROW ALPHABETS — `ababab...` trips both, `aaaa...` only this,
  * a shuffled low-variety soup only this).
  *
  * Semantics: counts Unicode CODEPOINTS (not grapheme clusters —
  * documented, so combining sequences count per mark), then folds
  * `-(p * ln p)` over codepoints in ASCENDING order. The fold order
  * is part of the contract: floating addition is not associative,
  * and the DuckDB oracle twin folds the identical term list in the
  * identical order (`list_reduce(list(term ORDER BY ch), ...)`), so
  * both engines produce the same bits before rounding. Empty string
  * → 0.0.
  *
  * Why a native expression: the declarative form explodes one row
  * per CHARACTER (a 100 TB corpus becomes a ~100 TB-row shuffle
  * keyed on (doc, char)); this is one in-row pass that stays inside
  * whole-stage codegen. ASCII-only strings (the overwhelming case
  * after the usual ASCII-projection or on pre-screened text) count
  * into a flat 128-slot array with no boxing and no String
  * materialization; anything else takes a sorted-map codepoint walk.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "char_entropy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CharEntropy.entropy($c);")

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropy = copy(child = newChild)
}

object CharEntropy {

  /** Static entry point shared by interpreted eval and generated
    * code. */
  def entropy(s: UTF8String): Double = {
    val in = s.getBytes
    var i = 0
    while (i < in.length && (in(i) & 0x80) == 0) i += 1
    if (i == in.length) asciiEntropy(in) else codepointEntropy(s.toString)
  }

  private def asciiEntropy(in: Array[Byte]): Double = {
    if (in.length == 0) return 0.0
    val counts = new Array[Long](128)
    var i = 0
    while (i < in.length) {
      counts(in(i)) += 1L
      i += 1
    }
    fold(counts.iterator.filter(_ > 0L), in.length.toDouble)
  }

  private def codepointEntropy(str: String): Double = {
    val counts = new java.util.TreeMap[Integer, java.lang.Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1L else prev + 1L)
      i += Character.charCount(cp)
      n += 1L
    }
    if (n == 0L) 0.0
    else {
      import scala.jdk.CollectionConverters._
      fold(counts.values().iterator().asScala.map(_.longValue()),
        n.toDouble)
    }
  }

  /** `-(p * ln p)` summed left-to-right over ascending-key counts —
    * the exact arithmetic shape the DuckDB twin reproduces. */
  private def fold(ascCounts: Iterator[Long], total: Double): Double = {
    var sum = 0.0
    while (ascCounts.hasNext) {
      val p = ascCounts.next().toDouble / total
      sum += -(p * math.log(p))
    }
    sum
  }
}
