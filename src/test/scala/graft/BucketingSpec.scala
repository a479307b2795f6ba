package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.catalog.Warehouse
import graft.sources.Tables

/** Bucketing = the pre-shuffled fact-table layout: joins and
  * aggregations on the bucket key must plan WITHOUT any Exchange. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans with zero shuffle exchanges") {
    val dir = sf()
    Warehouse.saveBucketed(Tables.load(spark, dir, "orders"),
      "orders_bkt", Seq("o_orderkey"), 8)
    Warehouse.saveBucketed(Tables.load(spark, dir, "lineitem"),
      "lineitem_bkt", Seq("l_orderkey"), 8)
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a sort-merge join and a static plan so the Exchange count
      // is inspectable deterministically
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the join is exchange-free (bucket co-location); the only
      // shuffle is the groupBy on the non-bucket column
      assert(exchanges.length == 1,
        s"expected only the aggregation exchange, got:\n" +
          joined.queryExecution.executedPlan)
      // and the result matches the unbucketed join
      val expected = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
    }
  }
}
