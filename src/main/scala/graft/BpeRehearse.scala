package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: BPE merge learning at REALISTIC vocabulary scale. The
  * decade fixtures' synthetic text draws from ~31 distinct words, so
  * x59's sf10 run (3.3 s warm) proves the corpus-scan factorization
  * — 27M tokens reduce to a tiny vocabulary once — but exercises the
  * iteration legs on a toy table. A real 100 TB crawl vocabulary is
  * 10^7-10^8 normalized words; this rehearses `Bpe.learnMerges`
  * directly on a SYNTHESIZED vocabulary of that shape (md5-hex
  * digits mapped to letters: words of length 4-16 over a 16-letter
  * alphabet, Zipf-ish counts), timing per-merge wall so the
  * pair-explode shuffle and greedy-fold application are measured at
  * the scale the fixture can't produce.
  *
  * Usage: runMain graft.BpeRehearse [nWords] [nMerges]
  */
object BpeRehearse {
  def main(args: Array[String]): Unit = {
    val nWords = args.headOption.map(_.toInt).getOrElse(5000000)
    val nMerges = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic vocabulary: md5 of the id, hex digits
    // a-f kept and 0-9 shifted into g-p, truncated to a length drawn
    // from the id — distinct-ish words, Zipf-ish counts from the id
    val words = spark.range(nWords.toLong)
      .select(
        substring(translate(md5(col("id").cast("string")),
          "0123456789", "ghijklmnop"), lit(1),
          (pmod(col("id"), lit(13)) + 4).cast("int")).as("word"),
        (lit(1L) + pmod(col("id"), lit(97))).as("cnt"))
      .groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))

    val nw = words.count()
    println(s"[bpe] vocab=$nw words (requested $nWords ids)")
    val t0 = System.nanoTime()
    var last = t0
    val merges = graft.operators.Bpe.learnMerges(words, nMerges)
    val total = (System.nanoTime() - t0) / 1e9
    println(f"[bpe] merges=$nMerges totalSecs=$total%.1f " +
      f"perMerge=${total / nMerges}%.1f " +
      s"trajectory=${merges.map { case (l, r, n) => s"$l+$r:$n" }.mkString(",")}")
    spark.stop()
  }
}
