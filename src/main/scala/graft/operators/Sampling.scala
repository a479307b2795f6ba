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
}
