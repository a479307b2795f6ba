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

  /** Register every test table as a temp view — the analog of DuckDB's
    * replacement scan resolving Python-local frames inside SQL
    * (`scripts/build_db.py:72-84`): a name in SQL text resolves to a
    * lazily-planned DataFrame. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
