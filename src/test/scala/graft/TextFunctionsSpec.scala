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

  test("repetitionStats: duplicate lines and dominant bigrams measured") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "same line\nsame line\nother line"),          // 1 dup of 3 lines
      (2L, "go go go go"),                                // bigram "go go" x3/3
      (3L, "all distinct words here"),                    // no repetition
      (4L, "x"),                                          // single token
      (5L, "p1 one\n\np2 two\n\np3 three")                // blank separators
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(math.abs(got(1L)._1 - (1.0 - 2.0 / 3)) < 1e-15)
    assert(got(2L) == (0.0, 1.0))      // "go go" fills all 3 bigram slots
    assert(got(3L) == (0.0, 1.0 / 3))  // 3 distinct bigrams, max 1
    assert(got(4L) == (0.0, 0.0))      // no bigram slots at all
    // blank paragraph separators are NOT duplicate lines
    assert(got(5L)._1 == 0.0)
  }

  test("bpeTokens applies merges in rank order, exhaustive per pass") {
    val merges = Seq(("t", "a"), ("l", "e"), ("b", "le"), ("ta", "ble"),
      ("l", "l"))
    val words = Seq("table", "tale", "lll", "z", "", "bleak")
      .toDF("w")
    val got = words.select(col("w"),
        bpeTokens(col("w"), merges).as("toks"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("table") == Seq("table"))       // ta+ble via 4 stacked ranks
    assert(got("tale") == Seq("ta", "le"))     // partial stack
    // leftmost-first exhaustive pass on a run: lll -> ll, l (not l, ll)
    assert(got("lll") == Seq("ll", "l"))
    assert(got("z") == Seq("z"))               // no merge applies
    assert(got("") == Seq(""))                 // empty word -> one empty token
    // "ble" inside a longer word merges only as complete tokens
    assert(got("bleak") == Seq("ble", "a", "k"))
  }

  test("ngramRepetition: top and duplicate fractions per n, " +
      "short-array zeroing") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "b", "a")), // 3-grams: aba, bab, aba
      (2L, Seq("x", "y")),                // shorter than any n >= 3
      (3L, Seq("c", "c", "c", "c", "c", "c", "c"))
    ).toDF("id", "tk")
    val got = df.select(col("id"),
        ngramRepetition(col("tk"), 3).as("r3"),
        ngramRepetition(col("tk"), 5).as("r5"))
      .select(col("id"), col("r3.top_frac"), col("r3.dup_frac"),
        col("r5.top_frac"), col("r5.dup_frac"))
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    assert(got(1L) == ((2.0 / 3, 2.0 / 3, 1.0, 0.0)))
    assert(got(2L) == ((0.0, 0.0, 0.0, 0.0)))
    // degenerate run: one distinct gram owns all occurrences
    assert(got(3L) == ((1.0, 1.0, 1.0, 1.0)))
  }

  test("classifierMargin rewards stopword-rich alpha text, " +
      "penalizes junk") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "the data table shows the row and the scan for all of it"),
      (2L, "@@@@ #### 1234 %%%% !!!!")
    ).toDF("id", "text")
    val got = df
      .select(col("id"), col("text"), wsTokens(col("text")).as("tk"))
      .select(col("id"),
        TextAnalysis.classifierMargin(col("text"), col("tk")).as("m"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) > 0, s"good text should clear the margin, got ${got(1L)}")
    assert(got(2L) < 0, s"junk should fail the margin, got ${got(2L)}")
  }

  test("heavyHitters: exact counts, total-order ties, candPool cut " +
      "respected with a full sample") {
    import graft.operators.TextAnalysis
    // aa x5, bb x3, cc x3, dd x1 across docs; samplePct=100 makes
    // phase 1 the exact truth, so the output is the true top-k
    val docs = Seq(
      (1L, "aa aa bb cc"),
      (2L, "aa bb cc dd"),
      (3L, "aa aa bb cc")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.heavyHitters(docs, "doc_id", "text",
        k = 3, candPool = 3, samplePct = 100)
      .as[(String, Long, Long)].collect().toSeq
    // bb/cc tie at 3 -> token order breaks the tie deterministically
    assert(got == Seq(("aa", 5L, 5L), ("bb", 3L, 3L), ("cc", 3L, 3L)))
  }

  test("heavyHitters recounts candidates over the FULL corpus: " +
      "sampled-out occurrences still reach the exact count") {
    import graft.operators.TextAnalysis
    val docs = (0L until 40L).map(i => (i, "aa bb")).toDF("doc_id", "text")
    val got = TextAnalysis.heavyHitters(docs, "doc_id", "text",
        k = 2, candPool = 10, samplePct = 20)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) == Seq(("aa", 40L), ("bb", 40L)),
      s"exact n must count all docs, got $got")
    assert(got.forall(t => t._3 < 40L),
      "sample_n must reflect only the sampled slice")
  }

  test("charEntropy: hand-checked values, codepoint (not grapheme) " +
      "counting on non-ASCII, empty and null safety") {
    import graft.operators.TextAnalysis
    val got = Seq(("aaaa", 1), ("ab", 2), ("aabb", 3), ("abcd", 4),
        ("", 5), ("\u03b1\u03b2", 6), ("e\u0301e\u0301", 7))
      .toDF("t", "i")
      .select($"i", TextAnalysis.charEntropy($"t").as("e"))
      .as[(Int, Double)].collect().toMap
    assert(got(1) == 0.0, "single-symbol string has zero entropy")
    assert(math.abs(got(2) - math.log(2)) < 1e-12)
    assert(got(3) == got(2), "entropy depends on distribution, not length")
    assert(math.abs(got(4) - math.log(4)) < 1e-12)
    assert(got(5) == 0.0, "empty string is defined as zero")
    assert(math.abs(got(6) - math.log(2)) < 1e-12,
      "non-ASCII path counts codepoints")
    // e + COMBINING ACUTE = one grapheme but TWO codepoints — the
    // documented semantics: two equal-count symbols, ln 2
    assert(math.abs(got(7) - math.log(2)) < 1e-12)
    val nulls = Seq((Option.empty[String], 1)).toDF("t", "i")
      .select(TextAnalysis.charEntropy($"t").as("e"))
      .collect()
    assert(nulls.head.isNullAt(0), "null in, null out")
  }

  test("charEntropy separates narrow-alphabet degenerate text from " +
      "prose and agrees between the ASCII fast path and the " +
      "codepoint path on the same distribution") {
    import graft.operators.TextAnalysis
    val vals = Seq("ab " * 40,
        "the quick brown fox jumps over the lazy dog near a river bank")
      .toDF("t").select(TextAnalysis.charEntropy($"t").as("e"))
      .as[Double].collect()
    assert(vals(0) < 1.2 && vals(1) > 2.5,
      s"gate must separate: got ${vals.toSeq}")
    // same multiset of symbols, one forced down the non-ASCII path
    // by an appended 2-count non-ASCII pair: the shared symbols must
    // contribute identically (fold order is ascending codepoint in
    // both paths)
    val ascii = Seq("aabbcc").toDF("t")
      .select(TextAnalysis.charEntropy($"t")).as[Double].head()
    assert(math.abs(ascii - math.log(3)) < 1e-12)
    // force the SAME balanced multiset down the codepoint path: the
    // appended "αα" makes the string non-ASCII (dispatch goes to
    // codepointEntropy) and keeps the distribution uniform — 4
    // symbols × count 2 of 8 → exactly ln 4. A fast-path/codepoint
    // disagreement on the shared a/b/c symbols would break this.
    val mixed = Seq("aabbccαα").toDF("t")
      .select(TextAnalysis.charEntropy($"t")).as[Double].head()
    assert(math.abs(mixed - math.log(4)) < 1e-12,
      s"codepoint path on uniform 4-symbol multiset: $mixed != ln 4")
  }
}
