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
}
