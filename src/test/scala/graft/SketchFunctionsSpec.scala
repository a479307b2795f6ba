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

  test("cms 2-slot memo survives a two-sketch projection: probing " +
      "two grids per row deserializes once per (thread, sketch), " +
      "not twice per row — the one-slot memo's thrash mode") {
    val rows = (0L until 4000L).map(i => s"key-${i % 97}").toDF("k")
    def agg = count_min_sketch(col("k"), lit(0.01), lit(0.99), lit(7))
    val skA = rows.agg(agg.as("sk")).head.getAs[Array[Byte]]("sk")
    val skB = rows.limit(2000).agg(agg.as("sk"))
      .head.getAs[Array[Byte]]("sk")
    val before = graft.plans.CmsEstimate.deserializations.get()
    val probed = rows
      .select(SketchFunctions.cmsEstimate(skA, col("k")).as("ea"),
        SketchFunctions.cmsEstimate(skB, col("k")).as("eb"))
      .agg(sum(col("ea")), sum(col("eb"))).head
    assert(probed.getLong(0) >= 4000L && probed.getLong(1) >= 2000L)
    val misses = graft.plans.CmsEstimate.deserializations.get() - before
    // bound: 2 sketches × threads that touched a partition (local[4]
    // + possible driver-side eval), far below the 8000 a per-row
    // thrash would produce
    assert(misses <= 16L,
      s"memo thrashed: $misses deserializations for a 4000-row " +
        "two-sketch projection")
  }

  // a deterministic permutation of 0..n-1 (2654435761 is odd and ends
  // in 1, so it is coprime with 10^k moduli) — adversarial-ish insert
  // order without rand(), so measured error bounds stay pinned
  private def permuted(n: Int): IndexedSeq[Double] =
    (0 until n).map(i => ((i.toLong * 2654435761L) % n).toDouble)

  test("kll sketch conserves mass exactly (totalWeight == n through " +
      "every compaction), compacts for real, and bounds rank error " +
      "on a known uniform stream") {
    val sk = new graft.plans.QuantileSketch(128)
    val n = 100000
    permuted(n).foreach(sk.update)
    assert(sk.n == n)
    assert(sk.totalWeight == n,
      s"mass leaked: totalWeight ${sk.totalWeight} != n $n")
    assert(sk.retained < n / 20,
      s"sketch barely compacted: retained ${sk.retained}")
    // true p-quantile of {0..n-1} is ~p*n; measured max error for
    // this deterministic insert order is ~0.004 — pin 3x headroom
    for (p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = sk.quantile(p)
      val err = math.abs(est / n - p)
      assert(err <= 0.012, s"p=$p est=$est rank error $err > 0.012")
    }
  }

  test("kll quantile estimates are monotone in p (one cumulative " +
      "scan serves every probe) and serialization roundtrips " +
      "bit-identically") {
    val sk = new graft.plans.QuantileSketch(64)
    permuted(20000).foreach(sk.update)
    val ps = (0 to 100).map(_ / 100.0)
    val qs = ps.map(sk.quantile)
    assert(qs.sliding(2).forall(w => w(0) <= w(1)),
      "quantile must be nondecreasing in p")
    val rt = graft.plans.QuantileSketch.deserialize(sk.serialize)
    assert(rt.n == sk.n && rt.k == sk.k && rt.retained == sk.retained)
    assert(ps.map(rt.quantile) == qs,
      "roundtripped sketch must answer identically")
  }

  test("kll sketches merge through the DataFrame aggregates (map-side " +
      "partials + union rollup) within the same rank-error envelope " +
      "as direct building — the property x65's shard-then-rollup " +
      "pattern rests on — and reject mismatched k") {
    val n = 50000
    val rows = permuted(n).zipWithIndex
      .map { case (v, i) => (i % 8, v) }.toDF("shard", "v")
    val merged = graft.plans.QuantileSketch.deserialize(
      rows.groupBy(col("shard"))
        .agg(SketchFunctions.kllAgg(col("v"), 128).as("sk"))
        .agg(SketchFunctions.kllUnionAgg(col("sk")).as("sk"))
        .head.getAs[Array[Byte]]("sk"))
    assert(merged.n == n)
    assert(merged.totalWeight == n, "mass must survive the merge path")
    for (p <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val err = math.abs(merged.quantile(p) / n - p)
      assert(err <= 0.02, s"merged sketch p=$p rank error $err > 0.02")
    }
    val a = new graft.plans.QuantileSketch(64)
    val b = new graft.plans.QuantileSketch(128)
    a.update(1.0); b.update(2.0)
    val e = intercept[IllegalArgumentException](a.merge(b))
    assert(e.getMessage.contains("different k"))
  }

  test("kll aggregate skips nulls and an uninitialized union " +
      "accumulator adopts the first input's k (empty-group safety)") {
    val rows = Seq[(Int, Option[Double])]((0, Some(1.0)), (0, None),
      (0, Some(3.0)), (1, Some(2.0))).toDF("g", "v")
    val sks = rows.groupBy(col("g"))
      .agg(SketchFunctions.kllAgg(col("v"), 16).as("sk"))
    val union = graft.plans.QuantileSketch.deserialize(
      sks.agg(SketchFunctions.kllUnionAgg(col("sk")).as("u"))
        .head.getAs[Array[Byte]]("u"))
    assert(union.n == 3, s"nulls must not count: n=${union.n}")
    assert(union.k == 16, "union accumulator must adopt input k")
    assert(union.quantile(0.5) == 2.0)
  }

  test("kll rank error stays bounded on SORTED insert order — the " +
      "classic adversary for deterministic compactors (monotone ids, " +
      "timestamps): alternating-offset compaction de-biases it") {
    for (xs <- Seq((0 until 100000).map(_.toDouble),
      (0 until 100000).map(i => (99999 - i).toDouble))) {
      val sk = new graft.plans.QuantileSketch(256)
      xs.foreach(sk.update)
      assert(sk.totalWeight == 100000L)
      // measured max over both directions ~0.005; pin 3x headroom
      for (p <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
        val err = math.abs(sk.quantile(p) / 100000 - p)
        assert(err <= 0.015, s"sorted insert p=$p err=$err")
      }
    }
  }
}
