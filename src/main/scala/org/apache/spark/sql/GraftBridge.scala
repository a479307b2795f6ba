package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Spark internals, kept to the two
  * capabilities a library of custom Catalyst expressions needs:
  * registering an expression builder in the session's function registry
  * (so it is usable from SQL text and `expr(...)`), and wrapping a raw
  * `Expression` as a user-facing `Column`.
  */
object GraftBridge {

  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Bounded-wait read of an Observation's metrics — used by
    * iterative loops that ride their convergence probe on a
    * materialization job and must FAIL LOUDLY if that job ever stops
    * completing the observed metrics, rather than park forever like
    * the public `get`.
    *
    * `private[sql]` `getOrEmpty` alone waits only 100 ms, and an
    * Observation is completed by a QueryExecutionListener on the
    * ASYNC ExecutionListenerBus — the SQLExecutionEnd event can
    * legitimately land later than that under listener-bus backlog or
    * a GC pause, even though the materializing action already
    * succeeded. So poll it in a bounded retry loop (default 10 s,
    * two orders of magnitude past observed listener latencies but
    * still a loud, finite failure if the metric genuinely never
    * completes) instead of treating one 100 ms miss as "empty". */
  def observedOrEmpty(obs: Observation,
      timeoutMs: Long = 10000L): Map[String, Any] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var m = obs.getOrEmpty
    while (m.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(50L)
      m = obs.getOrEmpty
    }
    m
  }

  /** Wrap an analyzed logical plan as a DataFrame — used by the
    * catalog's total-order checker to re-execute the PRE-limit input
    * of a top-k entry's Sort (a non-total key above a LIMIT picks
    * engine-dependent boundary rows, invisible in the post-limit
    * output). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
