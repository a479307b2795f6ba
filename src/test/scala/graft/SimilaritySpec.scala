package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: parallel=1, orthogonal=0, antiparallel=-1, zero-guarded") {
    val df = Seq(
      (Seq(1f, 0f), Seq(2f, 0f)),
      (Seq(1f, 0f), Seq(0f, 3f)),
      (Seq(1f, 0f), Seq(-1f, 0f)),
      (Seq(0f, 0f), Seq(1f, 1f))
    ).toDF("a", "b")
    val got = df.select(cosine(col("a"), col("b"))).as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0, -1.0, 0.0))
  }

  test("bruteForceTopK ranks by cosine, excludes self, respects k") {
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f)),
      (1L, Seq(0.9f, 0.1f, 0f)),
      (2L, Seq(0f, 1f, 0f)),
      (3L, Seq(-1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0),
        "vec_id", "embedding", 2)
      .select("qid", "rn", "did").as[(Long, Long, Long)].collect().toSeq
    assert(top == Seq((0L, 1L, 1L), (0L, 2L, 2L)))
  }

  test("lshBuckets: identical vectors land in the same bucket") {
    val vecs = Seq(
      (0L, Seq.fill(8)(0.5f)),
      (1L, Seq.fill(8)(0.5f)),
      (2L, Seq.tabulate(8)(i => if (i % 2 == 0) 1f else -1f))
    ).toDF("vec_id", "embedding")
    val buckets = Similarity.lshBuckets(vecs, "vec_id", "embedding", 4, 8)
      .as[(Long, Long)].collect().toMap
    assert(buckets(0L) == buckets(1L))
    assert(buckets.values.forall(b => b >= 0 && b < 16))
  }

  test("lshTopK finds the identical twin (same-bucket guarantee)") {
    val vecs = Seq(
      (0L, Seq.fill(8)(0.5f)),
      (1L, Seq.fill(8)(0.5f)),
      (2L, Seq.tabulate(8)(i => if (i % 2 == 0) 1f else -1f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 0),
        "vec_id", "embedding", 1, nPlanes = 4, dim = 8)
      .select("qid", "did").as[(Long, Long)].collect().toSeq
    assert(top == Seq((0L, 1L)))
  }
}
