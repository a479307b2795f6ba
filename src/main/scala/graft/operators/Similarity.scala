package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions._
import graft.functions.VectorFunctions._

/** Similarity search over an `array<float>` embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the corpus; per-corpus-row work is a codegen'd fold, and the
  * per-query top-k is a window over qid (shuffle keyed by qid only).
  *
  * Scale path: random-hyperplane (sign-LSH) bucketing — corpus rows are
  * hashed once into 2^P buckets; queries probe only their own bucket, so
  * the candidate set shrinks ~2^P-fold. Buckets are deterministic
  * (md5-derived Rademacher planes), so results are reproducible across
  * runs and engines.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query row (excluding self).
    * `queries` must be small enough to broadcast. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("did"), col(vecCol).as("dvec"))
    val scored = c.join(broadcast(q), col("qid") =!= col("did"))
      .select(col("qid"), col("did"),
        cosine(col("qvec"), col("dvec")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("did"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Deterministic Rademacher hyperplanes: sign of bit0 of
    * md5("plane-<p>-<d>"). Returns (plane, dim, w) with w ∈ {-1, 1}. */
  def planes(spark: org.apache.spark.sql.SparkSession, nPlanes: Int,
      dim: Int): DataFrame = {
    import spark.implicits._
    (0 until nPlanes).flatMap(p => (0 until dim).map(d => (p, d)))
      .toDF("plane", "dim")
      .withColumn("w",
        when(md5Hash60(concat_ws("-", lit("plane"), col("plane"), col("dim")))
          .bitwiseAND(lit(1L)) === 1L, lit(1.0)).otherwise(lit(-1.0)))
  }

  /** Sign-LSH bucket id (0..2^nPlanes-1) per row: bit p is the sign of
    * the projection onto plane p. Join with the tiny broadcast plane
    * table + one groupBy on (id) — scales linearly in corpus size. */
  def lshBuckets(df: DataFrame, planesDf: DataFrame, idCol: String,
      vecCol: String, nPlanes: Int): DataFrame = {
    val exploded = df.select(col(idCol),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .join(broadcast(planesDf), "dim")
      .groupBy(col(idCol), col("plane"))
      .agg(sum(col("x").cast("double") * col("w")).as("proj"))
    exploded.groupBy(col(idCol))
      .agg(sum(when(col("proj") >= 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(plane AS INT))"))
        .otherwise(lit(0L)))
        .cast("long").as("bucket"))
  }

  /** Approximate top-k: exact cosine ranking restricted to the query's
    * own LSH bucket. Recall < 1 by design; deterministic output. */
  def lshTopK(spark: org.apache.spark.sql.SparkSession, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nPlanes: Int, dim: Int): DataFrame = {
    val pl = planes(spark, nPlanes, dim)
    val cb = lshBuckets(corpus, pl, idCol, vecCol, nPlanes)
    val qb = lshBuckets(queries, pl, idCol, vecCol, nPlanes)
    val c = corpus.join(cb, idCol)
      .select(col(idCol).as("did"), col(vecCol).as("dvec"), col("bucket"))
    val q = queries.join(qb, idCol)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("did"))
      .select(col("qid"), col("did"), cosine(col("qvec"), col("dvec")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("did"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }
}
