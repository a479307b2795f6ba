package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // N=5, sum_dl=17, avgdl=3.4; df(spark)=2, df(window)=2, df(merge)=1
  private val docs = Seq(
    (1L, "spark spark window foo"),
    (2L, "spark merge bar baz"),
    (3L, "alpha beta gamma"),
    (4L, "window delta"),
    (5L, "epsilon zeta eta theta")
  ).toDF("doc_id", "text")

  private val terms = Seq("spark", "window", "merge")

  /** The classic BM25 term score, independently in plain Scala —
    * same ln idf, same tf saturation. */
  private def s(tf: Int, df: Int, dl: Int): Double =
    math.log((5 - df + 0.5) / (df + 0.5)) *
      (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 3.4))

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25TopK scores match an independent fold (sorted by term, " +
      "left-to-right, rounded once) and rank by the rounded score") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    // fold order is BY TOKEN: merge < spark < window
    val exp1 = r6(0.0 + s(2, 2, 4) + s(1, 2, 4)) // spark, window
    val exp2 = r6(0.0 + s(1, 1, 4) + s(1, 2, 4)) // merge, spark
    val exp4 = r6(0.0 + s(1, 2, 2))              // window
    val expected = Seq((1L, exp1, 2L), (2L, exp2, 2L), (4L, exp4, 1L))
      .sortBy { case (id, sc, _) => (-sc, id) }
    assert(got == expected)
    // docs hitting no term are excluded entirely
    assert(!got.exists(r => r._1 == 3L || r._1 == 5L))
  }

  test("bm25TopK respects k as the rounded-score cut") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 1)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got.length == 1 && got.head._1 == 2L,
      "rare 'merge' dominates via ln idf — the whole point of logging it")
  }

  test("bm25TopK rejects empty and duplicate term lists") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, "doc_id", "text", Seq.empty, 5) }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, "doc_id", "text", Seq("a", "a"), 5) }
  }

  test("bm25OracleSql escapes single quotes in terms") {
    val sql = Retrieval.bm25OracleSql("t", "id", "text",
      Seq("o'brien", "plain"), 5)
    assert(sql.contains("'o''brien'") && sql.contains("'plain'"))
  }

  private def r6d(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rrfFuse computes sum(1/(k0+rank)) with absent-list terms as " +
      "0, ranks by the rounded score, ties broken by id") {
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val vec = Seq((20L, 1L), (40L, 2L), (10L, 3L)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq("lex" -> lex, "vec" -> vec),
        k0 = 60, k = 10)
      .select($"id", $"rrf_r", $"rn", $"lex_rn", $"vec_rn")
      .as[(Long, Double, Long, Option[Long], Option[Long])]
      .collect().toSeq.sortBy(_._3)
    val exp = Seq(
      (20L, r6d(1.0 / 62 + 1.0 / 61)), // both lists, near top of each
      (10L, r6d(1.0 / 61 + 1.0 / 63)),
      (40L, r6d(1.0 / 62)),            // vec-only
      (30L, r6d(1.0 / 63))             // lex-only
    ).sortBy { case (id, sc) => (-sc, id) }
    assert(got.map(r => (r._1, r._2)) == exp)
    assert(got.map(_._3) == (1L to 4L))
    // per-list ranks survive as nullable columns
    val byId = got.map(r => r._1 -> ((r._4, r._5))).toMap
    assert(byId(20L) == ((Some(2L), Some(1L))))
    assert(byId(40L) == ((None, Some(2L))))
    assert(byId(30L) == ((Some(3L), None)))
  }

  test("rrfFuse: a doc present in BOTH lists outranks docs a single " +
      "list ranked higher — the consensus property RRF exists for") {
    val lex = Seq((1L, 1L), (9L, 2L)).toDF("id", "rank")
    val vec = Seq((2L, 1L), (9L, 2L)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq("lex" -> lex, "vec" -> vec),
        k0 = 60, k = 10)
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    assert(got(9L) == 1L, "rank-2 in both lists beats rank-1 in one")
  }

  test("rrfFusePerQuery equals per-query rrfFuse for every query in " +
      "the batch — the partitioned deployment shape changes nothing " +
      "but the window key") {
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 30L, 1L),
      (2L, 10L, 2L)).toDF("qid", "id", "rank")
    val vec = Seq((1L, 20L, 1L), (1L, 40L, 2L), (2L, 10L, 1L))
      .toDF("qid", "id", "rank")
    val batch = Retrieval.rrfFusePerQuery(
        Seq("lex" -> lex, "vec" -> vec), k0 = 60, k = 10)
      .select($"qid", $"id", $"rrf_r", $"rn")
      .as[(Long, Long, Double, Long)].collect().toSet
    val single = Seq(1L, 2L).flatMap { q =>
      Retrieval.rrfFuse(Seq(
          "lex" -> lex.filter($"qid" === q).select($"id", $"rank"),
          "vec" -> vec.filter($"qid" === q).select($"id", $"rank")),
          k0 = 60, k = 10)
        .select(lit(q).as("qid"), $"id", $"rrf_r", $"rn")
        .as[(Long, Long, Double, Long)].collect()
    }.toSet
    assert(batch == single)
  }

  test("rrfFuse respects k and validates inputs") {
    val l = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    assert(Retrieval.rrfFuse(Seq("a" -> l), 60, 2).count() == 2)
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq.empty, 60, 5) }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("a" -> l, "a" -> l), 60, 5) }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("a" -> l), 0, 5) }
  }

  test("rankingEval: hand-computed graded nDCG with an unretrieved " +
      "high-rel doc, exact MRR, zero-relevance and unlabeled queries") {
    val ranked = Seq(
      ("qA", 1L, 1L), ("qA", 2L, 2L), ("qA", 3L, 3L),
      ("qB", 1L, 1L), ("qB", 2L, 2L),   // nothing relevant retrieved
      ("qC", 5L, 1L)                    // query absent from rels
    ).toDF("qid", "doc_id", "rank")
    val rels = Seq(
      ("qA", 2L, 2), ("qA", 3L, 1), ("qA", 9L, 3), // d9 missed by the run
      ("qB", 7L, 2)
    ).toDF("qid", "doc_id", "rel")
    val got = Retrieval.rankingEval(ranked, rels, "qid", "doc_id",
        "rank", "rel", k = 3)
      .orderBy($"qid")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    val dcg = 3.0 / math.log(3.0) + 1.0 / math.log(4.0)
    val idcg = 7.0 / math.log(2.0) + 3.0 / math.log(3.0) +
      1.0 / math.log(4.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == (("qA", 3L, 2L, 2L, 0.5, r6(dcg / idcg))))
    assert(got(1) == (("qB", 2L, 0L, -1L, 0.0, 0.0)))
    assert(got(2) == (("qC", 1L, 0L, -1L, 0.0, 0.0)))
  }
}
