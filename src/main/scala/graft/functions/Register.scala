package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal

import graft.plans.{ArrayDotProduct, RollingHash, TopBigramFraction, TopKPairs}

/** Session-scoped registration of graft's custom Catalyst expressions,
  * making them callable from SQL text and `expr(...)`. Idempotent. */
object Register {
  def rollingHash(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "rolling_hash",
      exprs => RollingHash(exprs.head))

  def arrayDot(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "array_dot",
      exprs => ArrayDotProduct(exprs(0), exprs(1)))

  def topBigramFrac(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "top_bigram_frac",
      exprs => TopBigramFraction(exprs.head))

  def topKPairs(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "top_k_pairs", exprs => {
      require(exprs.length == 3,
        s"top_k_pairs(score, id, k) takes 3 arguments, got ${exprs.length}")
      val k = exprs(2) match {
        case Literal(v: Int, _) => v
        case Literal(v: Long, _) =>
          require(v == v.toInt, s"top_k_pairs k out of Int range: $v")
          v.toInt
        case Literal(v: Short, _) => v.toInt
        case Literal(v: Byte, _) => v.toInt
        case other => throw new IllegalArgumentException(
          s"top_k_pairs k must be an integral literal, got $other")
      }
      TopKPairs(exprs(0), exprs(1), k).toAggregateExpression()
    })

  def all(spark: SparkSession): Unit = {
    rollingHash(spark)
    arrayDot(spark)
    topBigramFrac(spark)
    topKPairs(spark)
  }
}
