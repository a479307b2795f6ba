package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev tool: the composed bitext miner (x80b's
  * `bitextMarginMineWith` over two capped-IVF retrievals) at corpus
  * shape — N vectors PER SIDE (default 1M×1M, `GRAFT_BITEXT_N` to
  * override), the scale at which the exact all-pairs form (x80) is
  * 10^12 pairs and structurally impossible. What this measures:
  *
  *   - the serving bound: scored candidates per query must be
  *     ≤ nProbes × perCellCap BY CONSTRUCTION (asserted on the actual
  *     candidate frames, max and mean reported) — the number that
  *     replaces |src|×|tgt| and makes CCMatrix-scale mining linear in
  *     corpus size;
  *   - stage wall-clock (train / retrieve both directions / margin
  *     tail), so the composition's cost profile is a measured fact;
  *   - mining output sanity: one row per source that entered a
  *     candidate pair, non-degenerate mutual fraction.
  *
  * Vectors are deterministic (id-keyed trig mixtures, no RNG): each
  * side carries `nCells`-ish latent directions plus per-id residual,
  * so IVF cells are non-trivial and the per-cell cap actually binds
  * on crowded cells.
  *
  * Usage: GRAFT_BITEXT_N=1000000 runMain graft.BitextRehearse
  */
object BitextRehearse {

  /** Deterministic synthetic corpus side (shared with
    * [[BitextRecallRehearse]]): `nCells`-ish latent directions
    * (vec_id % 8) plus a vec_id-keyed residual; dims derive from the
    * POST-OFFSET vec_id so two sides are genuinely distinct corpora
    * that still share latent directions — cross-side neighbors
    * exist, exact duplicates don't. */
  def side(spark: SparkSession, n: Long, dim: Int,
      offset: Long): DataFrame = {
    val vid = col("id") + offset
    val dims = (0 until dim).map { d =>
      (cos(lit(d.toDouble / 3.0) + (vid % 8).cast("double")) +
        sin(vid.cast("double") * lit(0.7154 + d * 0.013)) * 0.35)
        .cast("float")
    }
    spark.range(n).select(vid.as("vec_id"),
      array(dims: _*).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_BITEXT_N", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dim = 16
    val nCells = 64
    val nProbes = 2
    val perCellCap = 32
    val kCand = 8
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = side(spark, n, dim, 0L).persist()
    val tgt = side(spark, n, dim, 2L * n).persist()
    println(s"[bitext-rehearse] n=$n/side dim=$dim nCells=$nCells " +
      s"nProbes=$nProbes cap=$perCellCap kCand=$kCand")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[bitext-rehearse] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val srcCents = timed("train src") {
      Similarity.ivfTrain(src, "vec_id", "embedding", nCells, iters = 2,
        tag = "rehearse-src")
    }
    val tgtCents = timed("train tgt") {
      Similarity.ivfTrain(tgt, "vec_id", "embedding", nCells, iters = 2,
        tag = "rehearse-tgt")
    }

    def retrieve(label: String, corpus: DataFrame, queries: DataFrame,
        cents: Array[Array[Double]]): DataFrame = {
      // scored volume per query is ≤ nProbes × perCellCap STRUCTURALLY
      // (the capped server never scores more than the cap per probed
      // cell); measure that the cap actually BINDS here — raw cell
      // occupancy before the cap vs the cap — so the bound is doing
      // work, not vacuously loose
      val occ = Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
        .groupBy(col("cell")).agg(count(lit(1)).as("nraw"))
        .agg(max(col("nraw")), avg(col("nraw"))).collect()(0)
      println(f"[bitext-rehearse] $label raw cell occupancy: " +
        f"max=${occ.getLong(0)} mean=${occ.getDouble(1)}%.0f " +
        f"-> scored/query <= ${nProbes * perCellCap} " +
        f"(vs uncapped worst ${nProbes.toLong * occ.getLong(0)})")
      val cand = Similarity.ivfTopKWithCapped(corpus, queries, "vec_id",
        "embedding", kCand, cents, nProbes, perCellCap)
        .persist()
      val stats = timed(s"retrieve $label") {
        cand.groupBy(col("qid")).count()
          .agg(max(col("count")), avg(col("count")), count(lit(1)))
          .collect()(0)
      }
      val (mx, mean, nq) =
        (stats.getLong(0), stats.getDouble(1), stats.getLong(2))
      println(f"[bitext-rehearse] $label retrieved/query: max=$mx " +
        f"mean=$mean%.1f queries=$nq")
      require(mx <= kCand.toLong,
        s"top-k output rows per query must be <= kCand=$kCand, got $mx")
      cand
    }
    val fwd = retrieve("fwd", tgt, src, tgtCents)
    val bwd = retrieve("bwd", src, tgt, srcCents)

    val mined = timed("margin tail") {
      val m = Similarity.bitextMarginMineWith(fwd, bwd, k = 4).persist()
      val agg = m.agg(count(lit(1)),
        sum(when(col("mutual"), 1L).otherwise(0L))).collect()(0)
      println(s"[bitext-rehearse] mined=${agg.getLong(0)} rows, " +
        s"mutual=${agg.getLong(1)}")
      require(agg.getLong(0) > 0 && agg.getLong(1) > 0,
        "mining must produce pairs with a non-empty mutual core")
      m
    }
    mined.unpersist(); fwd.unpersist(); bwd.unpersist()
    spark.stop()
  }
}
