package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions

class SketchFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(df: org.apache.spark.sql.DataFrame,
      c: String): Array[Byte] =
    df.agg(SketchFunctions.bloomFilterAgg(col(c), 1000L).as("bf"))
      .head.getAs[Array[Byte]]("bf")

  test("bloom filter has no false negatives on long keys and a " +
      "bounded false-positive rate on non-members") {
    val members = (0L until 1000L).toDF("k")
    val bf = sketchOf(members, "k")
    val hits = members.filter(SketchFunctions.mightContain(bf, col("k")))
    assert(hits.count() == 1000L, "a member probe may never miss")
    val strangers = (100000L until 101000L).toDF("k")
    val fps = strangers.filter(SketchFunctions.mightContain(bf, col("k")))
    assert(fps.count() < 200L, "default-fpp sketch should reject most")
  }

  test("string and int keys probe fine — both sides normalize " +
      "through xxhash64 (raw string probes are an analysis error in " +
      "Spark's BloomFilterMightContain)") {
    val strs = Seq("alpha", "beta", "gamma").toDF("s")
    val bfs = sketchOf(strs, "s")
    assert(strs.filter(SketchFunctions.mightContain(bfs, col("s")))
      .count() == 3L)
    val ints = (0 until 100).toDF("i")
    val bfi = sketchOf(ints, "i")
    assert(ints.filter(SketchFunctions.mightContain(bfi, col("i")))
      .count() == 100L)
  }

  test("HLL sketches are mergeable without information loss: the " +
      "union of per-shard sketches estimates EXACTLY what one global " +
      "sketch over the same rows estimates (same lgK) — the property " +
      "x61's shard-then-rollup pattern rests on") {
    val rows = (0L until 20000L)
      .map(i => (i % 8, s"key-${i % 4999}")).toDF("shard", "k")
    val viaShards = rows.groupBy(col("shard"))
      .agg(hll_sketch_agg(col("k"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .head.getLong(0)
    val global = rows
      .agg(hll_sketch_estimate(hll_sketch_agg(col("k"), lit(12))).as("n"))
      .head.getLong(0)
    assert(viaShards == global,
      s"shard-union estimate $viaShards != global-sketch estimate $global")
    val exact = 4999L
    assert(math.abs(viaShards - exact).toDouble / exact <= 0.05,
      s"estimate $viaShards outside 5% of $exact")
  }
}
