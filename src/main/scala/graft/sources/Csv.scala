package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source layer — the reference's scan shape: header CSV read with
  * an explicit schema and positional column projection
  * (`pl.read_csv(path, columns=[1..4])`, `scripts/build_db.py:104-108`
  * and 17 sibling sites; date auto-parsing via `try_parse_dates`,
  * `:459,493,663`).
  *
  * Spark-first mapping: the schema is declared (the analog of the
  * target-table DDL being the source of truth, SURVEY.md §1.3), dates
  * parse because the schema says DateType/TimestampType, and ordinal
  * projection happens by name after the schema fixes the ordinal→name
  * mapping. CSV column pruning is pushed into the parser by
  * `spark.sql.csv.parser.columnPruning.enabled` (default on).
  */
object Csv {

  /** Read a header CSV with a declared schema. */
  def read(spark: SparkSession, path: String, schema: StructType,
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", timestampFormat)
      .schema(schema)
      .csv(path)

  /** PERMISSIVE read for dirty inputs: rows that fail the declared
    * schema (bad types, wrong field counts) land with their raw line
    * in `_corrupt_record` instead of failing the job — feed the
    * result to [[Quarantine.ingest]] with [[Quarantine.csvReason]]. */
  def readQuarantined(spark: SparkSession, path: String,
      schema: StructType,
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", timestampFormat)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Quarantine.CorruptCol)
      .schema(schema.add(Quarantine.CorruptCol, "string"))
      .csv(path)

  /** Read keeping only the given 0-based ordinals (reference S1 shape).
    * The ordinal list is resolved to names via the declared schema, so
    * projection is still by name underneath — Catalyst prunes the
    * parse. */
  def readOrdinals(spark: SparkSession, path: String, schema: StructType,
      ordinals: Seq[Int]): DataFrame = {
    val names = ordinals.map(schema.fields(_).name)
    read(spark, path, schema).select(names.head, names.tail: _*)
  }
}
