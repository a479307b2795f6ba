package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for heavy queries (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    import graft.functions.TextFunctions._
    import graft.functions.HashFunctions._
    time("warmup")(spark.range(100000).selectExpr("sum(id)").collect())
    time("docs count")(docs.count())
    val toks = docs.select(col("doc_id"), trim(col("text")).as("t"),
      wsTokens(col("text")).as("tk"))
    val grams = toks.select(col("doc_id"),
      explode(wordShinglesFromTokens(col("tk"), col("t"), 3)).as("g"))
    time("explode word shingles (bound tokens)")(grams.count())
    val hashed = grams.select(col("doc_id"), md5Hash60(col("g")).as("a"),
      md5Hash60b(col("g")).as("b"))
    time("md5+conv hash")(hashed.agg(avg("a")).collect())
    val p = graft.operators.Dedup.MinHashParams()
    val sigs = graft.operators.Dedup.minHashSignatures(docs, "doc_id", "text", p)
    time("signatures (12 mins)")(sigs.count())
    val bands = graft.operators.Dedup.lshBands(sigs, "doc_id", p)
    time("bands")(bands.count())
    val pairs = graft.operators.Dedup.minHashNearDupPairs(docs, "doc_id", "text")
    time("full pairs")(pairs.count())
    time("full pairs again")(pairs.count())
    // hygiene filter: native once-per-row predicate vs the composed
    // form (whose condition Catalyst pushes through the token
    // projection, re-tokenizing per metric reference)
    import graft.operators.TextAnalysis
    val keep = TextAnalysis.corpusKeep(col("text"), 0.55, Seq("en"))
    (1 to 3).foreach { i =>
      time(s"filter native CorpusKeep #$i")(docs.filter(keep).count())
    }
    val toksF = docs.select(col("doc_id"), col("text"),
      wsTokens(col("text")).as("tkf"))
    val composed = toksF.filter(
      TextAnalysis.qualityScoreFromTokens(col("text"), col("tkf")) >= 0.55 &&
        TextAnalysis.langIdFromTokens(col("tkf")).isin("en"))
    (1 to 3).foreach { i =>
      time(s"filter composed (pushed-down) #$i")(composed.count())
    }
    spark.stop()
  }
}
