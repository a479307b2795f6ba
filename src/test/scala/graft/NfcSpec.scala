package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class NfcSpec extends SparkSpec {
  import spark.implicits._

  private def nfd(s: String): String =
    Normalizer.normalize(s, Normalizer.Form.NFD)

  private def norm(texts: String*): Seq[String] =
    texts.toDF("t")
      .select(TextAnalysis.nfcNormalize(col("t")).as("n"))
      .as[String].collect().toSeq

  test("composes decomposed combining sequences (UAX #15 examples)") {
    val composed = "café España über naïve"
    assert(nfd(composed) != composed) // the fixture really is NFD
    assert(norm(nfd(composed)) == Seq(composed))
  }

  test("canonical singletons fold: U+212B ANGSTROM -> U+00C5, " +
    "U+2126 OHM -> U+03A9") {
    assert(norm("Å Ω") == Seq("Å Ω"))
  }

  test("already-NFC text is the identity") {
    val s = "café 日本語 Ω"
    assert(Normalizer.isNormalized(s, Normalizer.Form.NFC))
    assert(norm(s) == Seq(s))
  }

  test("pure ASCII is the identity (byte fast path)") {
    assert(norm("plain ascii only") == Seq("plain ascii only"))
  }

  test("idempotent: normalize(normalize(x)) == normalize(x)") {
    val ugly = "Å" + nfd("ñoño") + "Å"
    val once = norm(ugly).head
    assert(norm(once) == Seq(once))
    assert(once == Normalizer.normalize(ugly, Normalizer.Form.NFC))
  }

  test("combining marks without a precomposed form reorder to " +
    "canonical combining-class order but do not compose") {
    // on 'q': U+0305 OVERLINE (ccc 230) written BEFORE U+0323 DOT
    // BELOW (ccc 220) — NFC keeps both marks but sorts 0323 first
    assert(norm("q̣̅") == Seq("q̣̅"))
  }

  test("Hangul jamo compose to precomposed syllables (algorithmic " +
    "composition, not table-driven)") {
    // U+1112 U+1161 U+11AB = HIEUH + A + NIEUN -> U+D55C (HAN)
    assert(norm("한") == Seq("한"))
  }

  test("agrees with java.text.Normalizer on a mixed paragraph") {
    val s = "Cáfé Ångström in España — " +
      "ASCII tail, 한, q̣̅"
    assert(norm(s) == Seq(Normalizer.normalize(s, Normalizer.Form.NFC)))
  }

  test("null-safe") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(TextAnalysis.nfcNormalize(col("t")).as("n"))
      .as[Option[String]].collect().toSeq
    assert(r == Seq(None))
  }
}
