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

  test("cms estimates are exact when the grid dwarfs the key space " +
      "(the probe and Spark's aggregate hash keys identically — a " +
      "build/probe asymmetry would misestimate even without " +
      "collisions)") {
    val rows = (0L until 1000L).map(i => s"key-${i % 100}").toDF("k")
    val sk = rows.agg(count_min_sketch(col("k"), lit(0.001), lit(0.99),
      lit(7)).as("sk")).head.getAs[Array[Byte]]("sk")
    val est = rows.distinct()
      .select(col("k"), SketchFunctions.cmsEstimate(sk, col("k")).as("e"))
      .as[(String, Long)].collect().toMap
    assert(est.size == 100 && est.values.forall(_ == 10L),
      s"collision-free grid must be exact, got ${est.values.toSet}")
  }

  test("cms grids merge losslessly (cell-wise counter sums): " +
      "per-shard sketches merged estimate EXACTLY what one global " +
      "sketch estimates, and never under-count, on a deliberately " +
      "crowded grid — the properties x63's shard-then-probe pattern " +
      "rests on") {
    val rows = (0L until 5000L)
      .map(i => (i % 8, s"key-${i % 499}")).toDF("shard", "k")
    // eps=0.2 → width 10 << 499 keys: every cell crowded
    def agg = count_min_sketch(col("k"), lit(0.2), lit(0.99), lit(7))
    val merged = graft.plans.CmsEstimate.merge(
      rows.groupBy(col("shard")).agg(agg.as("sk"))
        .collect().toSeq.map(_.getAs[Array[Byte]]("sk")))
    val global = rows.agg(agg.as("sk")).head.getAs[Array[Byte]]("sk")
    val both = rows.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .select(col("k"), col("n"),
        SketchFunctions.cmsEstimate(merged, col("k")).as("em"),
        SketchFunctions.cmsEstimate(global, col("k")).as("eg"))
      .as[(String, Long, Long, Long)].collect()
    assert(both.length == 499)
    both.foreach { case (k, n, em, eg) =>
      assert(em == eg, s"$k: merged $em != global $eg")
      assert(em >= n, s"$k: estimate $em below exact $n")
    }
    // the grid is genuinely crowded: overestimation must be visible
    assert(both.count { case (_, n, em, _) => em > n } > 400,
      "crowded grid should overestimate most keys")
  }
}
