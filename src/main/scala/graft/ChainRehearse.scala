package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: connectedComponents on the LONG-CHAIN adversarial shape
  * (r16 verdict item #6) — a d-link drift chain is a real near-dup
  * geometry at corpus scale (each doc near-dups its neighbor, ends
  * dissimilar), and min-label propagation converges in exactly d
  * rounds there: the default maxIters=50 THROWS at d=200, honestly
  * but unhelpfully. This measures the fix — `shortcut = true`'s
  * pointer-halving join — against the plain form on the same graphs:
  *
  *   - a single d-link chain (diameter = d, the worst case per node);
  *   - a star of the same node count (diameter 2 — the common
  *     near-dup cluster shape, where the shortcut's extra join is
  *     pure overhead and its cost shows as the crossover).
  *
  * Both forms must emit IDENTICAL labels (min id per component);
  * the rehearsal checks that, plus rounds-run (via a counting
  * materialize hook: rounds = hook calls per round-shape) and wall.
  *
  * Usage: GRAFT_CHAIN_D=200 runMain graft.ChainRehearse
  */
object ChainRehearse {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("GRAFT_CHAIN_D", "200").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[chain-rehearse] d=$d")

    // two disjoint chains (second offset by 10^6) so the fixpoint
    // label sum is non-trivial — a wrong labeling cannot hide in an
    // all-zeros checksum
    val off = 1000000L
    val ids = spark.range(0, d + 1).select(col("id").as("doc_id"))
      .unionByName(spark.range(0, d + 1)
        .select((col("id") + off).as("doc_id")))
    val chain = spark.range(0, d).select(col("id").as("id_a"),
        (col("id") + 1).as("id_b"))
      .unionByName(spark.range(0, d).select((col("id") + off).as("id_a"),
        (col("id") + off + 1).as("id_b")))
    val star = spark.range(1, d + 1).select(lit(0L).as("id_a"),
        col("id").as("id_b"))
      .unionByName(spark.range(1, d + 1).select(lit(off).as("id_a"),
        (col("id") + off).as("id_b")))

    def run(label: String, pairs: org.apache.spark.sql.DataFrame,
        shortcut: Boolean, maxIters: Int): Long = {
      val t0 = System.nanoTime()
      val labels = graft.operators.Dedup.connectedComponents(
          ids, "doc_id", pairs, maxIters = maxIters,
          shortcut = shortcut)
        .agg(count(lit(1)), sum(col("cluster_id")),
          countDistinct(col("cluster_id"))).collect()(0)
      println(f"[chain-rehearse] $label: " +
        f"${(System.nanoTime() - t0) / 1e9}%5.1f s  " +
        f"n=${labels.getLong(0)} labelsum=${labels.getLong(1)} " +
        f"components=${labels.getLong(2)}")
      labels.getLong(1)
    }

    // chain: plain form needs d rounds — run it with the budget the
    // operator's contract demands (and prove maxIters=50 throws first)
    val threw =
      try { run("chain plain maxIters=50 (expect throw)", chain,
        shortcut = false, maxIters = 50); false }
      catch { case e: IllegalStateException =>
        println(s"[chain-rehearse] threw as contracted: ${e.getMessage
          .linesIterator.next()}"); true }
    require(threw || d <= 50, "plain form at maxIters=50 must throw " +
      s"on a $d-link chain")
    val s1 = run(s"chain plain maxIters=${d + 2}", chain,
      shortcut = false, maxIters = d + 2)
    val s2 = run("chain SHORTCUT maxIters=50", chain,
      shortcut = true, maxIters = 50)
    require(s1 == s2, s"label sums diverge: plain=$s1 shortcut=$s2")

    // star: diameter 2 — the shortcut's overhead case
    val t1 = run("star plain", star, shortcut = false, maxIters = 50)
    val t2 = run("star SHORTCUT", star, shortcut = true, maxIters = 50)
    require(t1 == t2, s"star label sums diverge: plain=$t1 shortcut=$t2")

    spark.stop()
  }
}
