package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.Catalog
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query inventory itself lives in graft.queries.{ParityQueries,
  * ExtensionQueries}; names carry SURVEY.md §2 operator ids.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Full star-schema join chain: region⟵nation⟵customer⟵
    * orders⟵lineitem with exact-decimal revenue — small dims broadcast
    * by Catalyst/AQE, the single shuffle is the groupBy on r_name. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    def t(n: String) = Tables.load(spark, dir, n)
    def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
    t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(Catalog.specs.map(s => s.name -> s.run): _*)

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Late-bound oracles (oracleGen) are evaluated
    * here — i.e. after `queries` ran, per Verify's ordering — so SQL
    * can embed values the run computed (trained IVF centroids). A
    * spec with NO oracle of either kind → driver records a rows-only
    * check; but a PROVIDED oracleGen that finds no stash entry throws
    * — that is a harness bug (training skipped, wrong key/tag), not a
    * legitimately oracle-less query, and downgrading it silently
    * would skip its hash gate. */
  def oracleSql: Map[String, String] = oracleSqlFiltered(_ => true)

  /** [[oracleSql]] restricted to `keep` BEFORE gens are evaluated, so
    * a filtered Verify dump doesn't evaluate (and throw on) gens of
    * queries whose training was legitimately filtered out. */
  def oracleSqlFiltered(keep: String => Boolean): Map[String, String] =
    ListMap(Catalog.specs.filter(s => keep(s.name)).flatMap { s =>
      val gen =
        if (s.oracleGen eq graft.queries.QuerySpec.noGen) None
        else Some(s.oracleGen().getOrElse(throw new IllegalStateException(
          s"late-bound oracle for '${s.name}' found no stash entry — " +
            "training did not run (filtered dump?) or the stash " +
            "key/tag is wrong")))
      s.oracle.orElse(gen).map(sql => s.name -> sql)
    }: _*)
}
