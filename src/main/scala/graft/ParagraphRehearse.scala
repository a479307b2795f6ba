package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Dev tool: `Corpus.paragraphDedup` at corpus shape — millions of
  * paragraphs with a head-heavy boilerplate distribution (the regime
  * the x75 fixture's 500-5000 docs cannot reach): the question is
  * whether the winner-election shuffle stays fingerprint-sized and
  * the reassembly groupBy holds when the paragraph frame is ~10× the
  * document count.
  *
  * Everything is md5-derived and deterministic (no rand()): each doc
  * gets `parasPerDoc` paragraphs — a slice drawn from a Zipf-ish
  * boilerplate pool (low pool ids reused corpus-wide, like cookie
  * banners and nav blocks; squared-hash fold for the head-heavy
  * draw), a blank separator, and unique body paragraphs. The
  * rehearsal REQUIREs the aggregate invariants (each distinct
  * boilerplate string survives exactly once corpus-wide; blank
  * separators and unique bodies survive everywhere; totals
  * reconcile), then reports wall time per doc count — the number
  * that says whether the two-shuffle shape holds when paragraphs are
  * corpus-sized.
  *
  * Usage: runMain graft.ParagraphRehearse [nDocs[,nDocs...]] [poolSize]
  */
object ParagraphRehearse {
  def main(args: Array[String]): Unit = {
    val docCounts = args.headOption
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(100000L, 1000000L))
    val poolSize = args.lift(1).map(_.toLong).getOrElse(20000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    docCounts.foreach { n =>
      val id = col("id").cast("string")
      // Zipf-ish boilerplate draw: two independent squared-hash folds
      // so low pool ids dominate (the cookie-banner head)
      def hash(tag: String) =
        conv(substring(md5(concat(lit(tag), id)), 1, 15), 16, 10)
          .cast("long")
      def zipf(tag: String) = {
        val h = hash(tag) % 997L
        (h * h * lit(poolSize) / lit(994009L)).cast("long")
      }
      // the CCNet normalization key STRIPS digits — variant ids and
      // payload hashes must survive as letters or distinct strings
      // collapse into one key (variant 1 == variant 2 == ...)
      def lettered(c: org.apache.spark.sql.Column) =
        translate(c, "0123456789", "qrstuvwxyz")
      val boiler = (t: String) =>
        concat(lit("boilerplate banner variant "),
          lettered(zipf(t).cast("string")), lit(" all rights reserved"))
      // 10 paragraphs per doc: 2 boilerplate draws, 1 blank separator,
      // 7 unique bodies (text payload ~60 chars each)
      val bodies = (0 until 7).map(i =>
        concat(lit(s"body x$i of doc "), lettered(id), lit(" "),
          lettered(md5(concat(lit(s"pay$i:"), id)))))
      val docs = spark.range(n).select(col("id").as("doc_id"),
        concat_ws("\n",
          Seq(boiler("a"), boiler("b"), lit("")) ++ bodies: _*).as("text"))

      val t0 = System.nanoTime()
      val out = Corpus.paragraphDedup(docs, "doc_id", "text")
      val agg = out.agg(
        count(lit(1)).as("docs"),
        sum(col("n_paras")).as("paras"),
        sum(col("n_kept")).as("kept")).collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      val nDocs = agg.getLong(0)
      val paras = agg.getLong(1)
      val kept = agg.getLong(2)
      require(nDocs == n, s"every doc must survive: $nDocs vs $n")
      require(paras == 10L * n, s"paragraph total: $paras vs ${10L * n}")

      // invariant: kept = blanks (n) + unique bodies (7n) + one
      // survivor per DISTINCT drawn boilerplate string + per-doc
      // second-draw survivals where draw b != draw a in the SAME doc
      // never survive (they collide with some first occurrence) —
      // so kept - 8n must equal the number of distinct boilerplate
      // strings drawn corpus-wide, computed independently:
      val distinctBoiler = docs
        .select(explode(split(col("text"), "\n", -1)).as("p"))
        .filter(col("p").startsWith("boilerplate"))
        .agg(countDistinct(col("p"))).collect()(0).getLong(0)
      require(kept - 8L * n == distinctBoiler,
        s"boilerplate survivors ${kept - 8L * n} != distinct drawn " +
          s"$distinctBoiler")
      println(f"[paragraph-rehearse] docs=$n%,d paras=$paras%,d " +
        f"kept=$kept%,d distinct_boiler=$distinctBoiler%,d " +
        f"wall=$wall%.1f s")
    }
    spark.stop()
  }
}
