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
    * (groupCol, p<pct>..., n_rows) — one row per group. */
  def exactQuantiles(df: DataFrame, groupCol: String, valCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentages must be in [1,100], got $pcts")
    val h = df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("__cnt"))
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col(valCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col(groupCol))
    val cum = h
      .withColumn("__cum", sum(col("__cnt")).over(cumW))
      .withColumn("__n", sum(col("__cnt")).over(totW))
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
}
