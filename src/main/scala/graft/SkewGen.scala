package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: build a HOT-KEY variant of a documents fixture for the
  * dedup skew rehearsal (VERDICT r9 item 6). Every doc with
  * `doc_id % 10 == 0` (~10% of the corpus) is rewritten as one fixed
  * ~40-word template plus a per-doc suffix token: texts stay DISTINCT
  * (so the exact-dedup prefilter cannot collapse them — fingerprints
  * all differ) but near-identical (Jaccard ≈ 0.95 over 3-gram
  * shingles), so MinHash banding and SimHash banding funnel them into
  * the same few buckets — the adversarial shape where one band-bucket
  * holds ~10% of the corpus and an uncapped bucket self-join goes
  * quadratic. Only `documents.parquet` is written: the dedup family
  * (x2/x2b/x3/x4/x19) reads nothing else.
  *
  * Prints the overflow-cap diagnostics for BOTH corpora (baseline vs
  * skewed) so the rehearsal can show the caps engaging: occupancy
  * over `maxBucket` is reported, never silently dropped.
  *
  * Usage: runMain graft.SkewGen <srcDir> <outDir>
  */
object SkewGen {
  def main(args: Array[String]): Unit = {
    val (src, out) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val template = ("the shared boilerplate paragraph that every scraped " +
      "mirror of this page carries verbatim apart from a tracking token " +
      "at the very end of the body text which differs per mirror and " +
      "keeps the fingerprints distinct while the shingle sets overlap " +
      "almost completely across the whole cluster version")
    val docs = graft.sources.Tables.load(spark, src, "documents")
    val skewed = docs.withColumn("text",
      when(col("doc_id") % 10 === 0,
        concat(lit(template + " "), col("doc_id").cast("string")))
        .otherwise(col("text")))
    skewed.write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[skewgen] wrote $out/documents.parquet")

    import graft.operators.Dedup
    Seq("baseline" -> src, "skewed" -> out).foreach { case (tag, dir) =>
      val d = graft.sources.Tables.load(spark, dir, "documents")
      val mh = Dedup.minHashBucketOverflow(d, "doc_id", "text")
        .agg(count(lit(1)), max(col("n_docs"))).head
      val sh = Dedup.simHashBucketOverflow(d, "doc_id", "text")
        .agg(count(lit(1)), max(col("n_docs"))).head
      println(s"[skewgen] $tag minhash buckets>cap: ${mh.get(0)} " +
        s"(max occupancy ${mh.get(1)}); simhash buckets>cap: " +
        s"${sh.get(0)} (max occupancy ${sh.get(1)})")
    }
    spark.stop()
  }
}
