package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named Spark query over a test-data directory,
  * with an optional DuckDB oracle SQL that must produce a hash-identical
  * result on the same parquet tables (the driver's t2 gate).
  *
  * Determinism contract (BASELINE.md): every query ends in a total-order
  * ORDER BY; aggregate doubles go through exact DECIMAL(18,2) arithmetic
  * before a final cast to DOUBLE so both engines produce the same bits;
  * integer-typed outputs are BIGINT on both sides.
  */
final case class QuerySpec(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Late-bound oracle for queries whose SQL embeds values computed
      * DURING the run (e.g. trained IVF centroids): evaluated at dump
      * time, AFTER every `run` has executed (Verify's ordering), so it
      * can read state the run deterministically stashed. A gen that
      * returns None FAILS the dump loudly (SparkEntry.oracleSql
      * throws): a missing stash entry means training didn't run or
      * the key/tag is wrong, and silently downgrading to a rows-only
      * check would skip the query's hash gate. */
    oracleGen: () => Option[String] = QuerySpec.noGen)

object QuerySpec {
  /** Sentinel default distinguishing "no late-bound oracle" from a
    * provided gen that failed to find its stash entry. */
  val noGen: () => Option[String] = () => None
}

object Catalog {
  lazy val specs: Seq[QuerySpec] =
    ParityQueries.specs ++ ExtensionQueries.specs ++ WorldCupQueries.specs

  lazy val byName: Map[String, QuerySpec] =
    specs.map(s => s.name -> s).toMap
}
