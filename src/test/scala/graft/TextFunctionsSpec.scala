package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String)(
      implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(input).toDF("s").select(c).as[T].head()

  test("capitalizeFirst uppercases only the first char") {
    assert(one[String](capitalizeFirst($"s"), "hello world") == "Hello world")
    assert(one[String](capitalizeFirst($"s"), "x") == "X")
  }

  test("dePluralizeCapitalize drops trailing char (reference F6 variant)") {
    assert(one[String](dePluralizeCapitalize($"s"), "stages") == "Stage")
    assert(one[String](dePluralizeCapitalize($"s"), "ab") == "A")
  }

  test("replaceFirst replaces only the first occurrence (Polars semantics)") {
    assert(one[String](replaceFirst($"s", "_", " "), "second_yellow_card")
      == "second yellow_card")
    assert(one[String](replaceFirst($"s", "_", " "), "nounderscore")
      == "nounderscore")
  }

  test("token counts: whitespace and BPE-ish") {
    assert(one[Long](wsTokenCount($"s"), "  a bb   ccc ") == 3L)
    assert(one[Long](bpeishTokenCount($"s"), "abc12 d,e") == 5L)
  }

  test("tokensIn counts membership hits") {
    assert(one[Long](tokensIn($"s", Seq("the", "a")), "the cat a hat the") == 3L)
  }

  test("charShingles yields distinct n-grams; short strings degrade safely") {
    assert(one[Seq[String]](charShingles($"s", 3), "abab").sorted
      == Seq("aba", "bab"))
    assert(one[Seq[String]](charShingles($"s", 3), "ab") == Seq("ab"))
  }

  test("md5Fingerprint is whitespace/case-normalized") {
    val a = one[String](md5Fingerprint($"s"), "  Hello   World ")
    val b = one[String](md5Fingerprint($"s"), "hello world")
    assert(a == b)
  }
}
