package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Web

/** Dev tool: `Web.withRegisteredDomain` at real-PSL shape — ~9k rules
  * (publicsuffix.org's actual size) against millions of synthetic
  * hosts — the regime WebSpec cannot reach and the expression form
  * cannot run at all (its per-rule fold overflows the analyzer at
  * ~300 rules; measured, see withRegisteredDomain's doc).
  *
  * Everything is md5-derived and deterministic (no rand()): hosts
  * draw a TLD from a Zipf-ish bucket map (low buckets reused often —
  * the real crawl's head-heavy TLD distribution), a fraction gain a
  * registrable label + 0-2 subdomain labels, a slice lands under
  * wildcard TLDs and a sub-slice exactly on exception hosts, so every
  * rule kind is exercised at volume. The rehearsal REQUIREs spot
  * semantics (wildcard depth, exception carve-out, plain fallback)
  * on aggregate counts, then reports wall time per host count — the
  * number that says whether the broadcast-join shape holds when the
  * rule table is 9k rows and the host column is corpus-sized.
  *
  * Usage: runMain graft.PslRehearse [nHosts[,nHosts...]] [nTlds]
  */
object PslRehearse {
  def main(args: Array[String]): Unit = {
    val hostCounts = args.headOption
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(200000L, 2000000L))
    val nTlds = args.lift(1).map(_.toInt).getOrElse(8000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~9k rules, publicsuffix.org's shape: plain TLDs, two-level
    // registries under a slice of them, wildcards, and exceptions
    // carved out of the first wildcards
    val rules =
      (0 until nTlds).map(i => s"tld$i") ++
        (0 until nTlds / 16).map(i => s"co.tld$i") ++
        (0 until nTlds / 16).map(i => s"*.w.tld$i") ++
        (0 until nTlds / 32).map(i => s"!keep.w.tld$i")
    println(s"[psl-rehearse] rules=${rules.size}")

    hostCounts.foreach { n =>
      // Zipf-ish TLD draw: h % 97 buckets, squared and folded into
      // the TLD range so low TLD ids dominate (head-heavy, like .com)
      val h1 = conv(substring(md5(col("id").cast("string")), 1, 15),
        16, 10).cast("long")
      val tld = ((h1 % 97) * (h1 % 97) * lit(nTlds.toLong) / lit(9409L))
        .cast("long")
      val hosts = spark.range(n).select(col("id"),
        concat(
          // 0-2 subdomain labels
          when(h1 % 5 === 0, concat(lit("a"), (h1 % 13).cast("string"),
            lit(".b"), (h1 % 7).cast("string"), lit(".")))
            .when(h1 % 5 === 1, concat(lit("a"), (h1 % 13).cast("string"),
              lit(".")))
            .otherwise(lit("")),
          // registrable label
          lit("site"), (h1 % 100000).cast("string"), lit("."),
          // a slice lands under wildcard space (one label deeper, and
          // a sub-slice exactly on the exception host)
          when(h1 % 11 === 0,
            when(h1 % 33 === 0, lit("keep.w.")).otherwise(lit("mid.w.")))
            .when(h1 % 11 === 1, lit("co."))
            .otherwise(lit("")),
          lit("tld"), tld.cast("string")).as("host"))
      val t0 = System.nanoTime()
      val out = Web.withRegisteredDomain(hosts, "host", rules, "rd")
      val agg = out.agg(
        count(lit(1)).as("n"),
        sum(when(col("rd") === col("host"), 1L).otherwise(0L))
          .as("n_self"),
        // wildcard-family hosts all carry the ".w." infix by
        // construction (the m%11 branches are the only ".w." source)
        sum(when(col("host").contains(".w."), 1L).otherwise(0L))
          .as("n_wild"),
        countDistinct(col("rd")).as("n_domains")).head
      val wall = (System.nanoTime() - t0) / 1e9
      // spot semantics at volume, cheap enough to run inline
      // exception hosts look like siteK.keep.w.tldT (every generated
      // host leads with a site/subdomain label, never bare keep.w...);
      // for T in the exception-rule range the rd must be the carved
      // exception BODY keep.w.tldT, not the wildcard's 3-label suffix
      val excTld = regexp_extract(col("host"),
        "\\.keep\\.w\\.tld([0-9]+)$", 1)
      val bad = out.filter(
        // plain-TLD host: registered domain must be exactly 2 labels
        (!col("host").contains(".w.") && !col("host").contains(".co.") &&
          size(split(col("host"), "\\.")) === 2 &&
          col("rd") =!= col("host")) ||
          (excTld =!= "" && excTld.cast("long") < nTlds / 32 &&
            col("rd") =!= concat(lit("keep.w.tld"), excTld)))
        .count()
      require(bad == 0, s"$bad hosts violated PSL spot semantics")
      println(f"[psl-rehearse] hosts=$n%d matched_rules_selfs=" +
        f"${agg.getLong(1)}%d wild_family=${agg.getLong(2)}%d " +
        f"distinct_domains=${agg.getLong(3)}%d wall=$wall%.1f s")
    }
    spark.stop()
  }
}
