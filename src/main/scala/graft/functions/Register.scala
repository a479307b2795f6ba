package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}

import graft.plans.{ArrayDotProduct, RollingHash}

/** Session-scoped registration of graft's custom Catalyst expressions,
  * making them callable from SQL text and `expr(...)`. Idempotent. */
object Register {
  def rollingHash(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "rolling_hash",
      exprs => RollingHash(exprs.head))

  def arrayDot(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "array_dot",
      exprs => ArrayDotProduct(exprs(0), exprs(1)))

  def all(spark: SparkSession): Unit = {
    rollingHash(spark)
    arrayDot(spark)
  }
}
