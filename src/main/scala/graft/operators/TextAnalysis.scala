package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword-marker heuristic), quality scoring, token statistics.
  * All pure built-in expression compositions — fully codegen'd, no UDFs,
  * and each has an exact DuckDB-SQL twin (integer counts and exact
  * double divisions only, so hashes match bit-for-bit).
  */
object TextAnalysis {

  /** Language marker words; scores are counts of tokens in each set.
    * Deterministic tie-break: first language in declaration order wins. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "a", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "de"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"))

  /** Predicted language code, or 'und' when no marker hits. */
  def langId(textCol: Column): Column = {
    val scores = langMarkers.map { case (lang, words) =>
      lang -> tokensIn(textCol, words)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Stopword ratio over whitespace tokens (English stopword set). */
  def stopwordRatio(textCol: Column): Column = {
    val sw = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    tokensIn(textCol, sw).cast("double") / wsTokenCount(textCol)
  }

  /** Alphabetic-character ratio. */
  def alphaRatio(textCol: Column): Column =
    length(regexp_replace(textCol, "[^A-Za-z]", "")).cast("double") /
      length(textCol)

  /** Mean token length. */
  def meanTokenLen(textCol: Column): Column =
    tokenLenSum(textCol).cast("double") / wsTokenCount(textCol)

  /** Composite quality score in [0, ~1]: rewards stopword presence,
    * alphabetic density and mid-length tokens — the standard cheap
    * pre-filter for web-scraped training text. Exact arithmetic:
    * integer counts divided as doubles. */
  def qualityScore(textCol: Column): Column =
    stopwordRatio(textCol) * lit(0.4) +
      alphaRatio(textCol) * lit(0.4) +
      when(meanTokenLen(textCol) >= 3 && meanTokenLen(textCol) <= 10, lit(0.2))
        .otherwise(lit(0.0))

  /** Per-document token statistics. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      wsTokenCount(col(textCol)).as("n_ws_tokens"),
      bpeishTokenCount(col(textCol)).as("n_bpe_tokens"),
      size(array_distinct(wsTokens(col(textCol)))).cast("long")
        .as("n_uniq_tokens"))
}
