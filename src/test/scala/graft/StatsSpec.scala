package graft

import org.apache.spark.sql.functions.lit

import graft.operators.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("exactQuantiles: type-1 ranks on a known histogram, " +
      "duplicates and single-value groups handled") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 5.0), ("b", 5.0), ("b", 9.0),
      ("c", 7.0)
    ).toDF("g", "v")
    val got = Stats.exactQuantiles(df, "g", "v", Seq(25, 50, 75, 100))
      .as[(String, Double, Double, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    // group a, n=4: k25=ceil(1)=1 -> 1.0, k50=2 -> 2.0, k75=3 -> 3.0,
    // k100=4 -> 4.0
    assert(got("a") == (("a", 1.0, 2.0, 3.0, 4.0, 4L)))
    // group b, n=3: k25=ceil(.75)=1 -> 5.0, k50=ceil(1.5)=2 -> 5.0
    // (duplicate mass), k75=ceil(2.25)=3 -> 9.0
    assert(got("b") == (("b", 5.0, 5.0, 9.0, 9.0, 3L)))
    // single-value group: every quantile is that value
    assert(got("c") == (("c", 7.0, 7.0, 7.0, 7.0, 1L)))
  }

  test("exactQuantiles keeps a NULL group as a normal group (the " +
      "grouped prefix sum's join-back is null-safe on the group key)") {
    val df = Seq(
      (Some("a"), 1.0), (Some("a"), 3.0),
      (Option.empty[String], 2.0), (Option.empty[String], 4.0)
    ).toDF("g", "v")
    val got = Stats.exactQuantiles(df, "g", "v", Seq(50, 100))
      .as[(Option[String], Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(Some("a")) == ((Some("a"), 1.0, 3.0, 2L)))
    // the window form this replaced emitted a NULL-group row; an
    // equi-join would have silently dropped it
    assert(got(None) == ((None, 2.0, 4.0, 2L)))
  }

  test("exactQuantiles median agrees with sort-based rank on a " +
      "larger frame") {
    val df = (1 to 101).map(i => ("g", i.toDouble)).toDF("g", "v")
    val got = Stats.exactQuantiles(df, "g", "v", Seq(50))
      .as[(String, Double, Long)].head()
    // n=101 -> k = ceil(50.5) = 51 -> the 51st smallest = 51.0
    assert(got == (("g", 51.0, 101L)))
  }

  test("globalExactQuantiles equals the grouped form on a single " +
      "group, across bucket boundaries") {
    val df = (1 to 1000).map(i => i.toDouble).toDF("v")
    val global = Stats.globalExactQuantiles(df, "v", Seq(25, 50, 75))
      .as[(Double, Double, Double, Long)].head()
    assert(global == ((250.0, 500.0, 750.0, 1000L)))
    val grouped = Stats.exactQuantiles(df.withColumn("g", lit("all")),
        "g", "v", Seq(25, 50, 75))
      .as[(String, Double, Double, Double, Long)].head()
    assert((grouped._2, grouped._3, grouped._4, grouped._5) ==
      ((global._1, global._2, global._3, global._4)),
      "two-level prefix decomposition must equal the windowed form")
  }

  test("exactQuantiles: a continuous-valued group (distinct = rows) " +
      "and bucket-count invariance of the grouped two-level form") {
    // the degenerate shape the grouped two-level prefix sum exists
    // for: one group whose histogram is corpus-sized (every value
    // distinct) next to tiny groups — values must not depend on how
    // many range buckets the decomposition used
    val big = (1 to 500).map(i => ("big", i.toDouble))
    val df = (big ++ Seq(("one", 42.0), ("two", 1.0), ("two", 1.0)))
      .toDF("g", "v")
    val got = Stats.exactQuantiles(df, "g", "v", Seq(1, 50, 100))
      .as[(String, Double, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("big") == (("big", 5.0, 250.0, 500.0, 500L)))
    assert(got("one") == (("one", 42.0, 42.0, 42.0, 1L)))
    // all-equal-value group: one histogram row carrying all the mass
    assert(got("two") == (("two", 1.0, 1.0, 1.0, 2L)))
    // bucket invariance of the underlying grouped prefix sum
    import org.apache.spark.sql.functions.col
    val h = df.groupBy(col("g"), col("v"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("__cnt"))
    val at3 = graft.operators.Packing
      .groupedInclusiveRunningSum(h, "g", Seq(col("v")), "__cnt", 3)
      .select("g", "v", "__incl").as[(String, Double, Long)]
      .collect().toSet
    val at64 = graft.operators.Packing
      .groupedInclusiveRunningSum(h, "g", Seq(col("v")), "__cnt", 64)
      .select("g", "v", "__incl").as[(String, Double, Long)]
      .collect().toSet
    assert(at3 == at64, "grouped prefix sum must be bucket-invariant")
  }

  test("calibrationBins: hand-checked bins — perfectly calibrated " +
      "slices show zero gap, a confident-but-wrong slice shows it") {
    import graft.operators.Stats
    // bin 8 (p=0.85): 4 rows, 3 positive -> conf 0.85, acc 0.75
    // bin 2 (p=0.25): 4 rows, 1 positive -> conf 0.25, acc 0.25 (gap 0)
    // p=1.0 lands in the LAST bin (9), not a phantom bin 10
    val rows = (1 to 4).map(i => (0.85, i <= 3)) ++
      (1 to 4).map(i => (0.25, i == 1)) ++ Seq((1.0, true))
    val got = Stats.calibrationBins(
        rows.toDF("p", "lab"), "p", "lab")
      .orderBy($"bin")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (2L, 4L, 1L, 0.25, 0.25, 0.0),
      (8L, 4L, 3L, 0.85, 0.75, 0.1),
      (9L, 1L, 1L, 1.0, 1.0, 0.0)))
  }

  test("splitSentences: terminators end sentences and are retained, " +
      "trailing fragment kept, runs of whitespace tolerated, " +
      "no-terminator text is one sentence") {
    import graft.operators.TextAnalysis.splitSentences
    val got = Seq(
      (1L, "One two. Three four!  Five six? tail bit"),
      (2L, "no terminators at all"),
      (3L, "Ends exactly. ")
    ).toDF("id", "t")
      .select($"id", splitSentences($"t").as("s"))
      .as[(Long, Seq[String])].collect().map(r => r._1 -> r._2).toMap
    assert(got(1L) == Seq("One two.", "Three four!", "Five six?",
      "tail bit"))
    assert(got(2L) == Seq("no terminators at all"))
    assert(got(3L) == Seq("Ends exactly."))
  }
}
