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
      * can read state the run deterministically stashed. Returning
      * None falls back to a rows-only check. */
    oracleGen: () => Option[String] = () => None)

object Catalog {
  lazy val specs: Seq[QuerySpec] =
    ParityQueries.specs ++ ExtensionQueries.specs ++ WorldCupQueries.specs

  lazy val byName: Map[String, QuerySpec] =
    specs.map(s => s.name -> s).toMap
}
