package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: assign documents (in a
  * deterministic id order) to fixed token-budget packs, the step that
  * turns a cleaned corpus into training shards. Pack boundaries come
  * from the global running token sum — a document straddling a
  * boundary starts its pack and continues into the next (the
  * streaming-chunker semantic; packs are index ranges, not bins).
  *
  * Scale design: the global running sum is computed as a TWO-LEVEL
  * prefix sum — a cumsum windowed WITHIN each id bucket plus an
  * exclusive prefix over the per-bucket totals — so no window ever
  * sees more than one bucket's rows and the only global pass is over
  * #buckets rows (thousands, not billions). Integer prefix sums are
  * associative, so the result is bit-identical to the textbook
  * single-window formulation (which is what the DuckDB oracle runs).
  */
object Packing {

  /** (idCol, nTokCol, pack_id) for every row: pack_id =
    * floor(exclusive_running_token_sum / budget) over rows ordered by
    * `idCol`.
    *
    * PRECONDITION: `idCol` values must be unique — the running sum is
    * ordered by id alone, so duplicate ids would make tie order (and
    * thus pack boundaries) run-dependent, like any non-total ORDER BY.
    *
    * Buckets come from `repartitionByRange` over the id (sampled,
    * balanced boundaries), NOT from the id VALUE space — value-range
    * buckets degenerate to one row per bucket under sparse hash ids,
    * which would blow up the offsets broadcast and the over-buckets
    * window. `nBuckets` therefore bounds the offsets frame regardless
    * of id distribution. The sampled boundaries may differ between
    * runs, but the prefix sum is associative, so pack ids are
    * IDENTICAL for any bucketing — determinism does not depend on the
    * sampling (PackingSpec checks equivalence across bucket counts),
    * and a task retry recomputes the same pure id→partition mapping.
    *
    * `nBuckets = 0` (the default) adapts to the CLUSTER: 4 buckets
    * per default-parallelism slot, capped at 1024. The cap keeps the
    * offsets frame tiny at any scale; the floor keeps a 5k-row local
    * corpus from paying 1024-way repartition task overhead (measured
    * 12.7 s → ~1 s on the sf0.1 mixing query). Deliberately NOT
    * derived from `df.rdd.getNumPartitions`: under AQE, `.rdd`
    * materializes the final plan — executing every upstream shuffle
    * once just to count partitions, then recomputing it all on the
    * real action. `defaultParallelism` is a pure driver-side read. */
  def assignPacks(docs: DataFrame, idCol: String, nTokCol: String,
      budget: Long, nBuckets: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    exclusiveRunningSum(docs, idCol, nTokCol, nBuckets)
      // integer DIV, not `/`: double division would lose exactness
      // once running token sums pass 2^53
      .select(col(idCol), col(nTokCol),
        expr(s"CAST(__excl DIV $budget AS BIGINT)").as("pack_id"))
  }

  /** The distributed global EXCLUSIVE running sum of `valueCol` over
    * rows ordered by (unique) `idCol`, as column `__excl` — the
    * two-level prefix-sum primitive behind pack assignment and
    * weighted corpus mixing. See [[assignPacks]] for the bucketing
    * rationale and the uniqueness precondition. */
  def exclusiveRunningSum(docs: DataFrame, idCol: String,
      valueCol: String, nBuckets: Int = 0): DataFrame = {
    require(nBuckets >= 0, "nBuckets must be >= 0 (0 = adaptive)")
    val buckets =
      if (nBuckets > 0) nBuckets
      else math.min(1024, math.max(1,
        docs.sparkSession.sparkContext.defaultParallelism * 4))
    val bucketed = docs.select(col(idCol), col(valueCol))
      .repartitionByRange(buckets, col(idCol))
      .withColumn("__b", spark_partition_id().cast("long"))
    val inBucket = Window.partitionBy(col("__b"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = bucketed
      .withColumn("__cum_in", sum(col(valueCol)).over(inBucket))
    // per-bucket totals: at most nBuckets rows — the only global
    // window runs over this tiny frame
    val bucketTotals = withCum.groupBy(col("__b"))
      .agg(sum(col(valueCol)).as("__tot"))
    val overBuckets = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketTotals
      .withColumn("__off", sum(col("__tot")).over(overBuckets) - col("__tot"))
      .select(col("__b"), col("__off"))
    withCum.join(broadcast(offsets), Seq("__b"))
      .withColumn("__excl", col("__cum_in") + col("__off") - col(valueCol))
      .select(col(idCol), col(valueCol), col("__excl"))
  }

  /** Pack manifest: per pack, its row count, token total, and id
    * range — what a shard writer consumes. */
  def packManifest(assigned: DataFrame, idCol: String,
      nTokCol: String): DataFrame =
    assigned.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(nTokCol)).as("n_tokens"),
        min(col(idCol)).as("first_id"), max(col(idCol)).as("last_id"))
}
