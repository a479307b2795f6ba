package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics at scale.
  *
  * Spark's `percentile` aggregate (and DuckDB's quantile_cont) buffer
  * every value of a group in memory — fine per-group at test SF,
  * an OOM at a 100 TB fact table's group sizes. The histogram
  * decomposition here computes EXACT discrete quantiles from the
  * per-group (value, count) histogram instead: one map-side-combined
  * shuffle to build the histogram, one window over HISTOGRAM rows
  * (cardinality = distinct values per group, not rows), one final
  * group-by. No global sort, no per-group value buffer, no sampling
  * error — the same histogram-rank decomposition x38 uses for its
  * terciles.
  *
  * Quantile definition is type-1 (discrete): p-th quantile = the
  * smallest value whose cumulative count reaches ceil(p/100 · n).
  * All arithmetic is integer-exact, so the DuckDB twin is
  * hash-identical — unlike interpolated quantile_cont, there is no
  * floating interpolation to diverge by an ULP.
  */
object Stats {

  /** Exact long floor-division of non-negative operands (Column `/`
    * is double division; making the numerator divisible first keeps
    * the quotient integral and exact below 2^53). */
  private def ldiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Per-group exact discrete quantiles of `valCol` at the given
    * integer percentages, plus the group's row count. Output:
    * (groupCol, p<pct>..., n_rows) — one row per group.
    *
    * The per-group cumulative count runs through
    * [[Packing.groupedInclusiveRunningSum]]'s two-level prefix sum
    * over the (group, value) histogram — NOT a per-group window: a
    * group with continuous values (doc scores: distinct ≈ rows) makes
    * the histogram group corpus-sized, and a
    * `partitionBy(group).orderBy(value)` window would pull all of it
    * through one task, while the two-level form spreads it across
    * range buckets (same decomposition [[globalExactQuantiles]] has
    * always used for the one-giant-group case, values bit-identical).
    * Group totals join back per group — an equi-join AQE can
    * skew-split, unlike a window. */
  def exactQuantiles(df: DataFrame, groupCol: String, valCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentages must be in [1,100], got $pcts")
    val h = df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("__cnt"))
    // the group total rides the prefix sum's own offsets join
    // (withGroupTotal) — a separate totals aggregate would re-scan
    // and re-build the histogram a second time
    val cum = Packing
      .groupedInclusiveRunningSum(h, groupCol, Seq(col(valCol)), "__cnt",
        withGroupTotal = true)
      .withColumn("__cum", col("__incl").cast("long"))
      .withColumn("__n", col("__gtot").cast("long"))
    val aggs = pcts.map { p =>
      val k = ldiv(col("__n") * p + 99, lit(100L))
      min(when(col("__cum") >= k, col(valCol))).as(s"p$p")
    } :+ max(col("__n")).cast("long").as("n_rows")
    cum.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col(groupCol))
  }

  /** GLOBAL (ungrouped) exact discrete quantiles — [[exactQuantiles]]
    * distributes its cumulative window by group key, so the
    * ungrouped case would degenerate to one task; this form runs the
    * cumulative count through [[Packing.exclusiveRunningSum]]'s
    * two-level prefix sum over the VALUE HISTOGRAM instead (in-bucket
    * windows + one tiny per-bucket-totals window), so no window ever
    * sees more than a range-partitioned slice of distinct values.
    * The fork of the cum frame (total + quantile scan) is
    * histogram-sized, not corpus-sized. Output: one row
    * (p<pct>..., n_rows). */
  def globalExactQuantiles(df: DataFrame, valCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentages must be in [1,100], got $pcts")
    val h = df.groupBy(col(valCol)).agg(count(lit(1)).as("__cnt"))
    val cum = Packing.exclusiveRunningSum(h, valCol, "__cnt")
      .withColumn("__cum", (col("__excl") + col("__cnt")).cast("long"))
    val tot = cum.agg(max(col("__cum")).cast("long").as("__n"))
    val aggs = pcts.map { p =>
      val k = ldiv(col("__n") * p + 99, lit(100L))
      min(when(col("__cum") >= k, col(valCol))).as(s"p$p")
    } :+ max(col("__n")).cast("long").as("n_rows")
    // empty input: a global aggregate still emits one all-null row —
    // drop it so the global form agrees with the grouped form's
    // zero-rows-on-empty behavior (the oracle twin mirrors this with
    // a HAVING clause)
    cum.crossJoin(broadcast(tot)).agg(aggs.head, aggs.tail: _*)
      .where(col("n_rows").isNotNull)
  }

  /** DuckDB twin of [[globalExactQuantiles]] — plain running window
    * over the histogram (same result as the two-level decomposition,
    * whose shape is Spark-side scaling, not semantics). */
  def globalExactQuantilesOracleSql(table: String, valCol: String,
      pcts: Seq[Int]): String = {
    val qSel = pcts.map { p =>
      s"min(CASE WHEN cum >= (n * $p + 99) // 100 THEN $valCol END) AS p$p"
    }.mkString(",\n  ")
    s"""WITH h AS (
       |  SELECT $valCol, CAST(count(*) AS BIGINT) AS cnt
       |  FROM $table GROUP BY $valCol),
       |c AS (
       |  SELECT $valCol, CAST(sum(cnt) OVER (ORDER BY $valCol
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM h),
       |t AS (SELECT CAST(max(cum) AS BIGINT) AS n FROM c)
       |SELECT
       |  $qSel,
       |  CAST(max(n) AS BIGINT) AS n_rows
       |FROM c CROSS JOIN t
       |HAVING CAST(max(n) AS BIGINT) IS NOT NULL""".stripMargin
  }

  /** DuckDB twin of [[exactQuantiles]] — the identical histogram CTE
    * chain (NOT quantile_disc, whose rank convention need not match;
    * mirroring the formulation keeps the gate meaningful). */
  def exactQuantilesOracleSql(table: String, groupCol: String,
      valCol: String, pcts: Seq[Int]): String = {
    val qSel = pcts.map { p =>
      s"min(CASE WHEN cum >= (n * $p + 99) // 100 THEN $valCol END) AS p$p"
    }.mkString(",\n  ")
    s"""WITH h AS (
       |  SELECT $groupCol, $valCol, CAST(count(*) AS BIGINT) AS cnt
       |  FROM $table GROUP BY $groupCol, $valCol),
       |c AS (
       |  SELECT $groupCol, $valCol,
       |    sum(cnt) OVER (PARTITION BY $groupCol ORDER BY $valCol
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(cnt) OVER (PARTITION BY $groupCol) AS n
       |  FROM h)
       |SELECT $groupCol,
       |  $qSel,
       |  CAST(max(n) AS BIGINT) AS n_rows
       |FROM c GROUP BY $groupCol ORDER BY $groupCol""".stripMargin
  }

  // ---- classifier calibration ---------------------------------------

  /** Reliability-diagram bins for a [0,1] score against a boolean
    * label — the calibration audit run before a quality classifier's
    * threshold is trusted (Guo et al. 2017 popularized ECE; the bins
    * here are its terms). Per equal-width bin: row count, positive
    * count, mean CONFIDENCE and empirical ACCURACY, and their gap.
    *
    * Determinism + scale: the only floating sum is the per-bin mean
    * score, computed as an exact DECIMAL(18,6) sum of the 6-dp-rounded
    * scores (order-independent, map-side partial, no collect_list —
    * a bin holding millions of rows folds as decimal partials) and
    * cast to DOUBLE only at the boundary — the catalog's money-column
    * convention applied to probabilities. Accuracy is an integer
    * ratio. Output has NO decimal columns.
    *
    * Output: (bin, n, n_pos, conf_r, acc_r, gap_r), one row per
    * populated bin. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val p = col(scoreCol)
    val b = least(floor(p * nBins), lit(nBins - 1)).cast("long")
    val conf = col("__sum").cast("double") / col("n")
    val acc = col("n_pos").cast("double") / col("n")
    df.groupBy(b.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        sum(round(p, 6).cast(org.apache.spark.sql.types
          .DecimalType(18, 6))).as("__sum"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(conf, 6).as("conf_r"), round(acc, 6).as("acc_r"),
        round(abs(acc - conf), 6).as("gap_r"))
  }

  /** DuckDB twin of [[calibrationBins]]: `src` must provide (p BOUND
    * score expression `pExpr`, boolean `labelExpr`); same decimal
    * sum, same divisions, same rounding. */
  def calibrationBinsOracleSql(src: String, pExpr: String,
      labelExpr: String, nBins: Int = 10): String =
    s"""SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  round(CAST(sum(CAST(round(p, 6) AS DECIMAL(18, 6))) AS DOUBLE)
       |    / count(*), 6) AS conf_r,
       |  round(CAST(sum(CASE WHEN lab THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 6) AS acc_r,
       |  round(abs(CAST(sum(CASE WHEN lab THEN 1 ELSE 0 END) AS DOUBLE)
       |      / count(*) -
       |    CAST(sum(CAST(round(p, 6) AS DECIMAL(18, 6))) AS DOUBLE)
       |      / count(*)), 6) AS gap_r
       |FROM (
       |  SELECT CAST(least(floor(($pExpr) * $nBins), $nBins - 1)
       |      AS BIGINT) AS bin,
       |    ($pExpr) AS p, ($labelExpr) AS lab
       |  FROM $src)
       |GROUP BY bin""".stripMargin
}
