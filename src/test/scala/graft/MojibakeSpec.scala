package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  private def moji(clean: String): String = new String(
    clean.getBytes(java.nio.charset.StandardCharsets.UTF_8),
    java.nio.charset.StandardCharsets.ISO_8859_1)

  private def repair(texts: String*): Seq[String] =
    texts.toDF("t")
      .select(TextAnalysis.repairMojibake(col("t")).as("r"))
      .as[String].collect().toSeq

  private def flag(texts: String*): Seq[Boolean] =
    texts.toDF("t")
      .select(TextAnalysis.mojibakeFlag(col("t")).as("f"))
      .as[Boolean].collect().toSeq

  test("repair inverts one mis-decode step exactly") {
    val clean = "café señor über schön"
    assert(repair(moji(clean)) == Seq(clean))
  }

  test("repair handles 3- and 4-byte sequences (CJK, emoji)") {
    val clean = "日本語 😀 text"
    assert(repair(moji(clean)) == Seq(clean))
  }

  test("pure ASCII is the identity (fast path)") {
    assert(repair("plain ascii only") == Seq("plain ascii only"))
  }

  test("genuine Latin-1 prose does not repair by accident: its bytes " +
    "are not valid multi-byte UTF-8") {
    val prose = "São Paulo café – olé" // é/ã followed by ASCII letters
    assert(repair(prose) == Seq(prose))
  }

  test("code points above U+00FF mean the text was never Latin-1 " +
    "mis-decoded — unchanged") {
    val s = "already-correct 日本語 and café"
    assert(repair(s) == Seq(s))
  }

  test("truncated lead byte at end of string: unchanged") {
    val s = "ends with lone Ã"
    assert(repair(s) == Seq(s))
  }

  test("mojibake of a UTF-16 surrogate encoding is rejected by strict " +
    "validation (CESU-8 corruption must not 'repair' into garbage)") {
    // ED A0 80 = UTF-8-style encoding of surrogate U+D800 — invalid
    val s = "x\u00ED\u00A0\u0080y"
    assert(repair(s) == Seq(s))
  }

  test("triple-encoded text repairs one layer per call; two calls " +
    "reach the fixpoint") {
    val clean = "naïve"
    val twice = moji(moji(clean))
    val once = repair(twice)
    assert(once == Seq(moji(clean)))
    assert(repair(once.head) == Seq(clean))
  }

  test("flag fires exactly on the double-encoding signature") {
    assert(flag(moji("café"), "plain ascii", "São Paulo café")
      == Seq(true, false, false))
  }

  test("null-safe") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(TextAnalysis.repairMojibake(col("t")).as("r"))
      .as[Option[String]].collect().toSeq
    assert(r == Seq(None))
  }
}
