package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted deterministic corpus mixing — combining source corpora at
  * target sampling ratios into one global training order, the step
  * after per-corpus cleaning and before packing.
  *
  * Stride interleaving: a row with 0-based rank r inside source s of
  * weight w gets mix key (r + 0.5) / w. Reading rows in ascending key
  * order yields each source at a rate proportional to its weight
  * (a weight-2 source contributes two rows for every one from a
  * weight-1 source), deterministically — no RNG, stable under
  * re-runs, appends to one source shift only that source's tail.
  *
  * Scale shape: the per-source rank is the distributed two-level
  * prefix sum ([[Packing.exclusiveRunningSum]] over a constant 1) —
  * no global window over any corpus; the union is map-side. Consumers
  * sort by (mix_key, source, id) — a total order since ranks are
  * unique within a source. The key arithmetic is plain double
  * division, bit-identical cross-engine. */
object Mixing {

  /** Tag + interleave `sources` (name, frame, weight): returns
    * (source, idCol, mix_key) for every row of every source. Weights
    * must be positive; `idCol` must be unique within each source.
    * `nBuckets = 0` adapts the rank prefix sum to each source's
    * partitioning (see [[Packing.assignPacks]]). */
  def weightedInterleave(sources: Seq[(String, DataFrame, Double)],
      idCol: String, nBuckets: Int = 0): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    require(sources.forall(_._3 > 0), "weights must be positive")
    sources.map { case (name, df, w) =>
      Packing.exclusiveRunningSum(
          df.select(col(idCol), lit(1L).as("__one")), idCol, "__one",
          nBuckets)
        .select(lit(name).as("source"), col(idCol),
          ((col("__excl").cast("double") + 0.5) / w).as("mix_key"))
    }.reduce(_.unionByName(_))
  }

  // ---- UniMax budget allocation -------------------------------------

  /** UniMax sampling (Chung et al., ICLR 2023): split a token budget
    * across domains so every domain repeats as uniformly as possible
    * without any domain exceeding `maxEpochs` passes — the principled
    * answer to temperature mixing's (x24b) over-sampling of tiny
    * domains. Waterfilling in closed form over the domain table
    * sorted by size ascending: domain j with remaining budget R_j and
    * m_j domains left gets its full cap E·n_j if that fits the equal
    * share R_j/m_j, otherwise the water level λ = R_{j*}/m_{j*} fixed
    * at the FIRST uncapped domain (caps ascend with size, so capped
    * domains form a prefix and Σ alloc = budget exactly when any
    * domain is uncapped).
    *
    * The window runs over the DOMAIN table — config-scale (tens of
    * rows), never the corpus — so the unpartitioned sort is free at
    * any corpus size. Determinism: caps are n·E with E a short-binary-
    * fraction epoch bound (whole/half/quarter epochs), so every
    * prefix sum is EXACT in a double (order-independent) and λ/epochs
    * are single divisions of identical operands on both engines.
    *
    * Input: one row per domain (domainCol, tokCol = total tokens).
    * Output: (domainCol, n_tok, cap, alloc, epochs), exact doubles —
    * callers round for display. */
  def unimaxAllocate(domainTok: DataFrame, domainCol: String,
      tokCol: String, budgetTokens: Long, maxEpochs: Double): DataFrame = {
    require(budgetTokens >= 0, "budget must be >= 0")
    require(maxEpochs > 0 && (maxEpochs * 4).isWhole,
      s"maxEpochs must be a positive multiple of 0.25 (exact binary " +
        s"fraction keeps cross-engine prefix sums exact): $maxEpochs")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(tokCol), col(domainCol))
    val ranked = domainTok
      .select(col(domainCol), col(tokCol).cast("long").as("n_tok"))
      .withColumn("j", row_number().over(w).cast("long"))
      .withColumn("cap", col("n_tok").cast("double") * maxEpochs)
      .withColumn("__prefix", coalesce(
        sum(col("cap")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0.0)))
      .crossJoin(broadcast(domainTok.agg(count(lit(1)).as("__nd"))))
      .withColumn("u",
        (lit(budgetTokens.toDouble) - col("__prefix")) /
          (col("__nd") - col("j") + 1).cast("double"))
    val star = ranked.filter(col("cap") > col("u"))
      .agg(min(col("j")).as("__jstar"), min_by(col("u"), col("j")).as("__lambda"))
    ranked.crossJoin(broadcast(star))
      .select(col(domainCol), col("n_tok"), col("cap"),
        when(col("__jstar").isNull || col("j") < col("__jstar"), col("cap"))
          .otherwise(col("__lambda")).as("alloc"))
      .withColumn("epochs", col("alloc") / col("n_tok").cast("double"))
  }

  /** Apply a [[unimaxAllocate]] result to the corpus: every document
    * repeats floor(epochs) times plus one more for a deterministic
    * hash-fraction of its domain (the partial last epoch) — adds
    * `reps` (0 when a sub-epoch domain samples the document out).
    * Pure narrow join + projection; the id hash is namespaced so the
    * partial-epoch draw is independent of split/sample/DSIR draws. */
  def unimaxApply(docs: DataFrame, idCol: String, domainCol: String,
      allocation: DataFrame): DataFrame = {
    import graft.functions.HashFunctions.md5Hash60
    val id = col(idCol)
    val frac = col("epochs") - floor(col("epochs"))
    docs.join(broadcast(allocation.select(col(domainCol), col("epochs"))),
        Seq(domainCol))
      .withColumn("reps",
        (floor(col("epochs")) +
          when(md5Hash60(concat(lit("unimax:"), id.cast("string")))
            .cast("double") < frac * lit((1L << 60).toDouble), 1.0)
            .otherwise(0.0)).cast("long"))
  }

  /** DuckDB twin of [[unimaxAllocate]] + [[unimaxApply]] as CTEs:
    * `dt` must be a prior CTE of (domain, n_tok); emits `<out>_alloc`
    * (domain, n_tok, cap, alloc, epochs) and expects the caller to
    * join it back to the corpus with the same reps rule
    * ([[unimaxRepsSql]]). */
  def unimaxAllocSqlCtes(dt: String, budgetSql: String, maxEpochs: Double,
      out: String): String = {
    val e = java.lang.Double.toString(maxEpochs)
    s"""${out}_ranked AS (
       |  SELECT domain, n_tok,
       |    CAST(row_number() OVER (ORDER BY n_tok, domain) AS BIGINT)
       |      AS j,
       |    CAST(n_tok AS DOUBLE) * $e AS cap,
       |    coalesce(sum(CAST(n_tok AS DOUBLE) * $e) OVER (
       |      ORDER BY n_tok, domain
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
       |      AS pfx,
       |    (SELECT CAST(count(*) AS BIGINT) FROM $dt) AS nd
       |  FROM $dt),
       |${out}_u AS (
       |  SELECT *, (CAST(($budgetSql) AS DOUBLE) - pfx) /
       |    CAST(nd - j + 1 AS DOUBLE) AS u
       |  FROM ${out}_ranked),
       |${out}_star AS (
       |  SELECT min(j) AS jstar, arg_min(u, j) AS lambda
       |  FROM ${out}_u WHERE cap > u),
       |${out}_alloc AS (
       |  SELECT domain, n_tok, cap,
       |    CASE WHEN jstar IS NULL OR j < jstar THEN cap ELSE lambda END
       |      AS alloc,
       |    CASE WHEN jstar IS NULL OR j < jstar THEN cap ELSE lambda END
       |      / CAST(n_tok AS DOUBLE) AS epochs
       |  FROM ${out}_u CROSS JOIN ${out}_star)""".stripMargin
  }

  /** The [[unimaxApply]] reps rule over SQL expressions (DuckDB). */
  def unimaxRepsSql(idExpr: String, epochsExpr: String): String = {
    val two60 = java.lang.Double.toString((1L << 60).toDouble)
    s"""CAST(floor($epochsExpr) + CASE WHEN
       |  CAST(('0x' || substr(md5('unimax:' ||
       |    CAST($idExpr AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)
       |  < ($epochsExpr - floor($epochsExpr)) * $two60
       |  THEN 1.0 ELSE 0.0 END AS BIGINT)""".stripMargin
  }
}
