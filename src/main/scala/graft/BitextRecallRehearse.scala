package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev tool: the composed bitext miner's RECALL curve vs the capped
  * retrieval's parameters (r15 verdict item #2 — the 1M×1M rehearsal's
  * 1,732/1M mutual core demanded a measured answer, not the
  * "precision slice" argument). At a scale where the exact all-pairs
  * miner (x80's operator) is still computable, every
  * (nProbes × perCellCap) point of the grid runs the composed form
  * ([[Similarity.bitextMarginMineWith]] over two capped-IVF
  * retrievals) against the exact ground truth and reports:
  *
  *   - pair recall: fraction of exact best-margin (src → tgt) pairs
  *     the composed miner reproduces exactly;
  *   - mutual-core recall: of the exact miner's MUTUAL pairs, the
  *     fraction the composed miner both reproduces and flags mutual
  *     (the CCMatrix extraction set — the slice a user actually keeps);
  *   - no-candidate sources (never entered any candidate pair).
  *
  * Same deterministic corpus generator as [[BitextRehearse]]
  * (id-keyed trig mixtures, 8 latent directions per side, no RNG).
  * One hash-gated point of this curve lives in the catalog as x80c.
  *
  * Usage: GRAFT_BITEXT_N=10000 runMain graft.BitextRecallRehearse
  */
object BitextRecallRehearse {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_BITEXT_N", "10000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dim = 16
    val nCells = 64
    val kCand = 8
    val k = 4
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[bitext-recall] n=$n/side dim=$dim nCells=$nCells " +
      s"kCand=$kCand k=$k")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[bitext-recall] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val src = BitextRehearse.side(spark, n, dim, 0L).persist()
    val tgt = BitextRehearse.side(spark, n, dim, 2L * n).persist()

    // exact ground truth: n×n scored pairs — the reason this rehearsal
    // runs at 10^4/side, not 10^6
    val exact = timed("exact all-pairs miner") {
      val e = Similarity.bitextMarginMine(src, tgt, "vec_id",
          "embedding", k)
        .select(col("src_id"), col("tgt_id").as("exact_tgt"),
          col("mutual").as("exact_mutual"))
        .persist()
      val c = e.count()
      require(c == n, s"exact miner must emit one row per source: $c")
      e
    }
    val nMutual = exact.filter(col("exact_mutual")).count()
    println(s"[bitext-recall] exact pairs=$n mutual core=$nMutual")

    val srcCents = timed("train src") {
      Similarity.ivfTrain(src, "vec_id", "embedding", nCells, iters = 2,
        tag = "recall-src")
    }
    val tgtCents = timed("train tgt") {
      Similarity.ivfTrain(tgt, "vec_id", "embedding", nCells, iters = 2,
        tag = "recall-tgt")
    }

    println("| nProbes | cap | pair recall | mutual-core recall | " +
      "no-cand sources | wall s |")
    println("|---|---|---|---|---|---|")
    for (nProbes <- Seq(2, 4); cap <- Seq(4, 16, 64, 256)) {
      val t0 = System.nanoTime()
      val fwd = Similarity.ivfTopKWithCapped(tgt, src, "vec_id",
        "embedding", kCand, tgtCents, nProbes, cap).persist()
      val bwd = Similarity.ivfTopKWithCapped(src, tgt, "vec_id",
        "embedding", kCand, srcCents, nProbes, cap).persist()
      val comp = Similarity.bitextMarginMineWith(fwd, bwd, k)
        .select(col("src_id"), col("tgt_id").as("comp_tgt"),
          col("mutual").as("comp_mutual"))
      val agg = exact.join(comp, Seq("src_id"), "left")
        .agg(
          sum(when(col("comp_tgt") === col("exact_tgt"), 1L)
            .otherwise(0L)).as("hits"),
          sum(when(col("exact_mutual") &&
            col("comp_tgt") === col("exact_tgt") &&
            col("comp_mutual"), 1L).otherwise(0L)).as("mhits"),
          sum(when(col("comp_tgt").isNull, 1L).otherwise(0L))
            .as("nocand"))
        .collect()(0)
      fwd.unpersist(); bwd.unpersist()
      val wall = (System.nanoTime() - t0) / 1e9
      val mr = if (nMutual > 0) agg.getLong(1).toDouble / nMutual
        else Double.NaN
      println(f"| $nProbes | $cap | ${agg.getLong(0).toDouble / n}%.3f " +
        f"| $mr%.3f | ${agg.getLong(2)} | $wall%.1f |")
    }

    // the nCells axis (r16 verdict item #2): the operating rule for
    // real mining runs — "raise nCells, not the cap" — predicts recall
    // tracks cap/occupancy (mean occupancy = n/nCells), so at FIXED
    // (nProbes=2, cap=64) the sweep 64 → 256 → 1024 cells should walk
    // cap/occupancy 0.4 → 1.6 → 6.6 and recall toward ~1.0. Measured
    // here instead of extrapolated from the survival model.
    println("| nCells | nProbes | cap | cap/occ | pair recall | " +
      "mutual-core recall | no-cand sources | wall s |")
    println("|---|---|---|---|---|---|---|---|")
    // the final (1024, 8) point tests the amended rule's second
    // clause: past the cap-bound regime, recall lost to probe
    // coverage comes back by scaling nProbes WITH nCells (8/1024
    // probes the same corpus fraction as 2/256)
    val centCache = scala.collection.mutable.Map(
      nCells -> (srcCents, tgtCents))
    for ((nc, nProbes) <- Seq((64, 2), (256, 2), (1024, 2), (1024, 8))) {
      val t0 = System.nanoTime()
      val (sc2, tc2) = centCache.getOrElseUpdate(nc, (
        Similarity.ivfTrain(src, "vec_id", "embedding", nc, iters = 2,
          tag = s"recall-src-$nc"),
        Similarity.ivfTrain(tgt, "vec_id", "embedding", nc, iters = 2,
          tag = s"recall-tgt-$nc")))
      val cap = 64
      val fwd = Similarity.ivfTopKWithCapped(tgt, src, "vec_id",
        "embedding", kCand, tc2, nProbes, cap).persist()
      val bwd = Similarity.ivfTopKWithCapped(src, tgt, "vec_id",
        "embedding", kCand, sc2, nProbes, cap).persist()
      val comp = Similarity.bitextMarginMineWith(fwd, bwd, k)
        .select(col("src_id"), col("tgt_id").as("comp_tgt"),
          col("mutual").as("comp_mutual"))
      val agg = exact.join(comp, Seq("src_id"), "left")
        .agg(
          sum(when(col("comp_tgt") === col("exact_tgt"), 1L)
            .otherwise(0L)).as("hits"),
          sum(when(col("exact_mutual") &&
            col("comp_tgt") === col("exact_tgt") &&
            col("comp_mutual"), 1L).otherwise(0L)).as("mhits"),
          sum(when(col("comp_tgt").isNull, 1L).otherwise(0L))
            .as("nocand"))
        .collect()(0)
      fwd.unpersist(); bwd.unpersist()
      val wall = (System.nanoTime() - t0) / 1e9
      val mr = if (nMutual > 0) agg.getLong(1).toDouble / nMutual
        else Double.NaN
      val capOverOcc = cap.toDouble * nc / n
      println(f"| $nc | $nProbes | $cap | $capOverOcc%.1f " +
        f"| ${agg.getLong(0).toDouble / n}%.3f | $mr%.3f " +
        f"| ${agg.getLong(2)} | $wall%.1f |")
    }
    spark.stop()
  }
}
