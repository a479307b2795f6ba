package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal

import graft.plans.{ArrayDotProduct, RollingHash, TopKPairs}

/** Session-scoped registration of graft's custom Catalyst expressions,
  * making them callable from SQL text and `expr(...)`. Idempotent. */
object Register {
  def rollingHash(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "rolling_hash",
      exprs => RollingHash(exprs.head))

  def arrayDot(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "array_dot",
      exprs => ArrayDotProduct(exprs(0), exprs(1)))

  def topKPairs(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "top_k_pairs", exprs => {
      val k = exprs(2) match {
        case Literal(v: Number, _) => v.intValue()
        case other => throw new IllegalArgumentException(
          s"top_k_pairs k must be an integer literal, got $other")
      }
      TopKPairs(exprs(0), exprs(1), k).toAggregateExpression()
    })

  def all(spark: SparkSession): Unit = {
    rollingHash(spark)
    arrayDot(spark)
    topKPairs(spark)
  }
}
