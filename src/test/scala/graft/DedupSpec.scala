package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup
    (4L, "completely different content about spark query engines at scale")
  ).toDF("doc_id", "text")

  test("exactKeepFirst keeps lowest id per identical text") {
    val kept = Dedup.exactKeepFirst(docs, col("text"), col("doc_id"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L))
  }

  test("minhash signatures are equal for identical docs") {
    val p = Dedup.MinHashParams()
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", p)
      .orderBy("doc_id").collect()
    val s1 = sigs(0).toSeq.drop(1)
    val s2 = sigs(1).toSeq.drop(1)
    assert(s1 == s2)
  }

  test("minHashNearDupPairs finds the exact-dup pair with estimate 1.0") {
    val pairs = Dedup.minHashNearDupPairs(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.exists { case (a, b, est) => a == 1L && b == 2L && est == 1.0 })
    // unrelated doc 4 pairs with nothing
    assert(!pairs.exists { case (a, b, _) => a == 4L || b == 4L })
  }

  test("simHash32 identical docs share signatures; near-dups are close") {
    val sigs = Dedup.simHash32(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(3L)) < hamming(sigs(1L), sigs(4L)))
  }

  test("ngramJaccard: identical pair scores 1.0, near-dup scores high") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val j = Dedup.ngramJaccard(docs, pairs, "doc_id", "text", 3)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.7 && j((1L, 3L)) < 1.0)
    assert(j((1L, 4L)) < 0.3)
  }
}
