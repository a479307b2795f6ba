package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * Everything keys off the md5-derived 60-bit hash of the row id —
  * never `rand()` — so samples and train/val/test assignments are
  * reproducible across runs, engines (the DuckDB oracle reproduces
  * them bit-for-bit), cluster layouts, and incremental re-runs over
  * a growing corpus (a row's split never changes as data arrives).
  * All operators are narrow projections/filters: zero shuffles, fully
  * pushdown-friendly.
  */
object Sampling {

  /** Stable bucket 0..buckets-1 from the row id (md5-derived, uniform
    * for practical purposes; 60-bit hash is always positive so `%` is
    * safe). */
  def hashBucket(id: Column, buckets: Int): Column =
    md5Hash60(id.cast("string")) % buckets

  /** Deterministic ~pct% sample (keep rows whose bucket < pct). */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol), 100) < pct)

  /** Train/val/test assignment: bucket < trainPct -> train,
    * < trainPct+valPct -> val, else test. Adds `bucket` and `split`. */
  def assignSplit(df: DataFrame, idCol: String, trainPct: Int,
      valPct: Int): DataFrame =
    df.withColumn("bucket", hashBucket(col(idCol), 100))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))

  /** Stratified deterministic sampling: keep rows whose 0..99 id-hash
    * bucket is below their class's percentage — per-class `fractions`
    * (e.g. "wiki" -> 100, "commoncrawl" -> 10) with `defaultPct` for
    * unlisted classes. The standard corpus-mixing knob (up-weight
    * curated sources, down-sample crawl bulk) as a pure narrow
    * filter: no shuffle, no rand(), pushdown-friendly, and a row's
    * keep/drop never changes as the corpus grows or re-runs.
    *
    * The class percentage is a literal CASE chain (classes are a
    * config, not data), so the whole predicate reaches the scan. */
  def stratifiedSample(df: DataFrame, classCol: String, idCol: String,
      fractions: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require((fractions.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "percentages must be in [0, 100]")
    val pct = fractions.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (cls, p)) => when(col(classCol) === cls, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), 100) < pct)
  }

  /** Temperature-based class rebalancing (the multilingual sampling
    * knob of XLM / mC4 — Conneau & Lample 2019 §3.1, Raffel et al.
    * 2020 §2.3): resample so class shares follow `p_c ∝ n_c^alpha`
    * instead of the natural distribution — `alpha < 1` lifts
    * low-resource classes, `alpha = 1` is a no-op. Realized here as
    * pure DOWNSAMPLING at maximum utilization, which has a closed
    * form: the smallest class keeps 100% and class c keeps
    * `(n_min / n_c)^(1-alpha)` (derivation: keep_c = T·share_c with
    * T = min_c n_c/share_c; the share normalizer cancels).
    *
    * Scale shape: one map-side-combined count per class (the only
    * shuffle, cardinality = #classes), a broadcast join of the tiny
    * per-class keep-rate frame, and the same deterministic md5 keep
    * filter as [[stratifiedSample]] — no rand(), reproducible across
    * engines/runs, and a kept row stays kept under re-runs with the
    * same class counts. Keep rates are rounded to 6 dp before the
    * bucket cut so both engines drop the identical rows (pow differs
    * across libms by ~1 ulp). `buckets` sets rate granularity
    * (default 1e-4). A NULL class is a class like any other: the
    * rates join is null-safe (`<=>`), so null-class rows get the
    * keep rate their group's count implies — alpha=1 keeps every
    * row, null class included. */
  def temperatureSample(df: DataFrame, classCol: String, idCol: String,
      alpha: Double, buckets: Int = 10000): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__nmin"))
    val rates = counts.crossJoin(minN)
      .select(col(classCol).as("__cls"),
        round(pow(col("__nmin").cast("double") / col("__n"),
          lit(1.0 - alpha)), 6).as("keep_rate_r"))
    df.join(broadcast(rates), df(classCol) <=> rates("__cls"))
      .filter(md5Hash60(col(idCol).cast("string")) % buckets <
        floor(col("keep_rate_r") * buckets))
      .drop("__cls")
  }

  /** Per-domain quota: keep each domain's `quota` lowest-`idCol` rows
    * — the web-pipeline per-site cap that stops one crawl-heavy
    * domain from dominating the mix.
    *
    * Skew design: a hot domain (hundreds of millions of pages) would
    * funnel through ONE window task, so ranking is two-phase. Phase 1
    * ranks within (domain, shard) — shard = id-hash mod `shards` —
    * and keeps at most `quota` rows per shard: a row with `quota`
    * same-domain rows below it in its OWN shard already cannot be
    * among the domain's lowest `quota`, so the discard is lossless.
    * Phase 2 ranks the ≤ shards×quota survivors per domain. Both
    * passes shuffle on their window keys; no task ever sees more than
    * shards×quota rows of any single domain. */
  def domainQuota(df: DataFrame, domainCol: String, idCol: String,
      quota: Int, shards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quota > 0 && shards > 0, "quota and shards must be positive")
    val w1 = Window
      .partitionBy(col(domainCol), md5Hash60(col(idCol).cast("string")) % shards)
      .orderBy(col(idCol))
    val w2 = Window.partitionBy(col(domainCol)).orderBy(col(idCol))
    df.withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= quota)
      .withColumn("__r2", row_number().over(w2))
      .filter(col("__r2") <= quota)
      .drop("__r1", "__r2")
  }

  /** Deterministic weighted sampling without replacement (Efraimidis
    * & Spirakis 2006): per class, keep the `k` rows with the largest
    * priority `ln(u) / w`, where `u ∈ (0, 1]` derives from the row
    * id's md5 — never `rand()` — and `w` is the row's weight. That
    * priority is a monotone transform of E-S's `u^(1/w)` key, so the
    * top-k by it IS a weighted sample without replacement: inclusion
    * probability rises with weight (the token-budget-proportional /
    * quality-score-proportional subset selection step of a corpus
    * mix), and the draw is reproducible across runs, engines, and
    * cluster layouts — the DuckDB oracle re-derives the identical
    * sample from the identical md5 arithmetic.
    *
    * Cross-engine determinism: `u` is exact 60-bit integer arithmetic
    * in both engines; `ln` may differ by ~1 ulp across libms (the
    * temperatureSample pow note), so the priority is rounded to 9 dp
    * BEFORE ranking and ties break on the id — both engines rank the
    * same.
    *
    * Skew shape: same two-phase ranking as [[domainQuota]] — phase 1
    * ranks within (class, id-hash shard) and keeps at most `k` per
    * shard (lossless: a row with `k` higher-priority classmates in
    * its OWN shard cannot be in the class top-k), phase 2 ranks the
    * ≤ shards×k survivors. No task ever holds more than shards×k
    * rows of one class; the weight column never shuffles beyond the
    * two window exchanges. Adds `w` (the evaluated weight), `priority_r`
    * (the rounded priority) and `rk` (the final per-class rank). */
  def weightedSample(df: DataFrame, classCol: String, idCol: String,
      weight: Column, k: Int, shards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && shards > 0, "k and shards must be positive")
    val u = (md5Hash60(col(idCol).cast("string")) + 1).cast("double") /
      lit((1L << 60).toDouble)
    // E-S requires w > 0. Guard rather than trust: a NEGATIVE weight
    // flips ln(u)/w positive (beats every legitimate priority — the
    // row would ALWAYS be drawn), and Spark orders NaN above every
    // double (same hijack). Invalid weights get a NULL priority and
    // are filtered OUT before ranking: desc_nulls_last alone only
    // pushes them below valid rows — row_number still ranks them, so
    // a class with fewer than k valid rows would leak invalid rows
    // through both `<= k` filters.
    val wd = weight.cast("double")
    val pri = when(!isnan(wd) && wd > 0, round(log(u) / wd, 9))
    val w1 = Window
      .partitionBy(col(classCol),
        md5Hash60b(col(idCol).cast("string")) % shards)
      .orderBy(col("priority_r").desc, col(idCol))
    val w2 = Window.partitionBy(col(classCol))
      .orderBy(col("priority_r").desc, col(idCol))
    df.withColumn("w", weight.cast("double"))
      .withColumn("priority_r", pri)
      .filter(col("priority_r").isNotNull)
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= k)
      .drop("__r1")
  }
}
