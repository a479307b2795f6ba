package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}

import graft.plans.RollingHash

/** Session-scoped registration of graft's custom Catalyst expressions,
  * making them callable from SQL text and `expr(...)`. Idempotent. */
object Register {
  def rollingHash(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "rolling_hash",
      exprs => RollingHash(exprs.head))

  def all(spark: SparkSession): Unit = rollingHash(spark)
}
