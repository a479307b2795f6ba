package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev tool: the bitext margin tail under adversarial HUB skew — one
  * target present in EVERY source's candidate list (r15 verdict watch
  * item #1). The capped IVF retrieval bounds candidates per QUERY
  * (≤ kCand rows each), but nothing upstream bounds how many queries'
  * lists one popular target appears in: a hub target concentrates
  * |queries| rows into a single per-tid task inside
  * `Similarity.bitextMarginMineWith`'s tail. This rehearsal
  * synthesizes the two directional candidate frames directly (the
  * miner's declared input contract — retrieval shape, ≤ kCand rows
  * per query) with tid 0 planted in every forward list, and measures:
  *
  *   - max candidate rows per tid after the union-dedup (the hub's
  *     per-key volume — what a per-tid window task must buffer);
  *   - the margin tail's wall-clock, hub vs no-hub, same volume.
  *
  * Candidates are deterministic id-keyed expressions (no RNG);
  * cosines vary per (query, rank) so top-k means and margins are
  * non-degenerate.
  *
  * Usage: GRAFT_HUB_N=1000000 [GRAFT_HUB=0] runMain graft.HubSkewRehearse
  */
object HubSkewRehearse {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_HUB_N", "1000000").toLong
    val hub = sys.env.getOrElse("GRAFT_HUB", "1") == "1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val kCand = 8
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[hub-rehearse] n=$n/side kCand=$kCand hub=$hub")

    // source ids 0..n-1, target ids n..2n-1 (the miner requires
    // disjoint sides). Forward lists: rank 0 is THE HUB (tid = n) for
    // every query when hub=1, a spread target otherwise; ranks 1..7
    // spread pseudo-uniformly. Backward lists always spread.
    val ranks = (0 until kCand).map(lit(_))
    def spreadT(q: org.apache.spark.sql.Column,
        j: org.apache.spark.sql.Column) =
      lit(n) + (q * 7L + j * 131L + 1L) % n
    val fwd = spark.range(n).select(col("id").as("qid"),
        explode(array(ranks: _*)).as("j"))
      .select(col("qid"),
        when(lit(hub) && col("j") === 0, lit(n))
          .otherwise(spreadT(col("qid"), col("j"))).as("did"),
        (lit(0.9) - col("j") * 0.03 -
          (col("qid") % 97).cast("double") * 1e-4).as("cos"))
    val bwd = spark.range(n).select((col("id") + n).as("qid"),
        explode(array(ranks: _*)).as("j"))
      .select(col("qid"),
        ((col("qid") * 13L + col("j") * 17L) % n).as("did"),
        (lit(0.85) - col("j") * 0.04 -
          (col("qid") % 89).cast("double") * 1e-4).as("cos"))

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[hub-rehearse] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // the per-tid volume the tail's backward-side computation faces
    val pairs = fwd.select(col("qid").as("sid"), col("did").as("tid"),
        col("cos"))
      .unionByName(bwd.select(col("did").as("sid"), col("qid").as("tid"),
        col("cos")))
      .groupBy(col("sid"), col("tid")).agg(max(col("cos")).as("cos"))
    val occ = timed("pair-volume scan") {
      pairs.groupBy(col("tid")).count()
        .agg(max(col("count")), avg(col("count"))).collect()(0)
    }
    println(f"[hub-rehearse] rows per tid: max=${occ.getLong(0)} " +
      f"mean=${occ.getDouble(1)}%.1f")

    val mined = timed("margin tail") {
      // materialize hook A/B (GRAFT_HUB_HOOK=persist|none): at gate
      // SF the hook wins (stage-fixed costs dominate; x80b scratches
      // its two tail intermediates, 5.9 -> 4.0 s), but at 16M-row
      // candidate volume caching 2×16M-row intermediates measured
      // SLOWER than recomputing them from the already-persisted
      // retrieval frames — so the at-scale default here is none
      val hook: DataFrame => DataFrame =
        if (sys.env.getOrElse("GRAFT_HUB_HOOK", "none") == "persist")
          df => {
            val p = df.persist(
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
            p.count(); p
          }
        else identity
      val m = Similarity.bitextMarginMineWith(fwd, bwd, k = 4, hook)
      val agg = m.agg(count(lit(1)),
        sum(when(col("mutual"), 1L).otherwise(0L)),
        sum(when(col("tgt_id") === n, 1L).otherwise(0L))).collect()(0)
      println(s"[hub-rehearse] mined=${agg.getLong(0)} rows, " +
        s"mutual=${agg.getLong(1)}, hub-elected=${agg.getLong(2)}")
      agg
    }
    require(mined.getLong(0) > 0, "mining must produce pairs")
    spark.stop()
  }
}
