package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev tool: measure the prefix filter's candidate-volume knob (x70)
  * across thresholds — the number the operator's 100 TB story rests
  * on: candidates (the quadratic-risk join's output) should be a
  * small, threshold-controlled fraction of all-pairs, while verified
  * pairs converge to the true near-dup relation. Reports, per t:
  * candidate count, verified count, candidates as a fraction of
  * all-pairs, the largest prefix-shingle posting list (the
  * worst-case join key), and wall.
  *
  * Usage: runMain graft.PrefixFilterRehearse <sfDir> [t,t,...]
  */
object PrefixFilterRehearse {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ts = args.lift(1).map(_.split(",").map(_.toDouble).toSeq)
      .getOrElse(Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val m = docs.count()
    val allPairs = m * (m - 1) / 2
    val sets = Dedup.prefixFilterSets(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sets.count()
    for (t <- ts) {
      val t0 = System.nanoTime()
      val cands = Dedup.prefixFilterCandidates(sets, "doc_id", t)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nCand = cands.count()
      val nVerified =
        Dedup.prefixFilterVerify(sets, cands, "doc_id", t).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // worst posting list among prefix shingles at this threshold
      val prefLen = (col("sz") - ceil(lit(t) * col("sz")) + 1).cast("int")
      val hot = sets
        .select(explode(slice(col("toks"), lit(1), prefLen)).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head.getLong(0)
      cands.unpersist(false)
      println(f"[prefix-rehearse] sf=$sfDir docs=$m t=$t%.1f " +
        f"cand=$nCand (${100.0 * nCand / allPairs}%.2f%% of $allPairs " +
        f"all-pairs) verified=$nVerified maxPosting=$hot " +
        f"wall=$wall%.1f s")
    }
    sets.unpersist(false)
    spark.stop()
  }
}
