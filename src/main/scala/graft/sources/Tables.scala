package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet source layer for the driver test tables (TESTDATA.md).
  *
  * The reference's source layer is CSV scans with manual positional
  * projection (`/root/reference/scripts/build_db.py:104-108` and 17 more
  * sites); here scans are declarative parquet reads and column pruning /
  * filter pushdown are delegated to Catalyst (`PushedFilters` /
  * `ReadSchema` visible in `.explain("formatted")`).
  *
  * Scale note: each table is a single parquet file locally, but nothing
  * here assumes that — at 100 TB these paths are directories of many
  * row-group-sized files and the same `spark.read.parquet` call
  * parallelizes by `spark.sql.files.maxPartitionBytes`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else
      spark.read.parquet(path(dir, name))

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long and truncate to microseconds —
    * exactly what DuckDB does internally, so oracle values agree. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, "events"))
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Streaming twin of [[load]]: the same table as a file-source
    * stream (schema inferred from a batch footer read — the file
    * stream source requires an explicit schema). Mirrors the events
    * nanos→micros truncation so a streaming plan over the fixture is
    * value-identical to the batch frame the DuckDB oracle checks. At
    * scale the path is a directory micro-batched by arrival. */
  def loadStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The file stream source requires a DIRECTORY base path; locally a
    // table is one file inside the shared sf dir, so scope the listing
    // with pathGlobFilter. At scale a table is its own directory and
    // the filter is unnecessary (but harmless).
    def stream(schema: org.apache.spark.sql.types.StructType) =
      spark.readStream.schema(schema)
        .option("pathGlobFilter", s"$name.parquet").parquet(dir)
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      stream(spark.read.parquet(path(dir, "events")).schema)
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else stream(spark.read.parquet(path(dir, name)).schema)
  }

  /** Register every test table as a temp view — the analog of DuckDB's
    * replacement scan resolving Python-local frames inside SQL
    * (`scripts/build_db.py:72-84`): a name in SQL text resolves to a
    * lazily-planned DataFrame. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
