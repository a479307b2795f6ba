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
    * `idCol`. `idBucket` sizes the prefix-sum buckets (id range per
    * bucket, not row count — ids need not be dense). */
  def assignPacks(docs: DataFrame, idCol: String, nTokCol: String,
      budget: Long, idBucket: Long = 4096L): DataFrame = {
    require(budget > 0, "budget must be positive")
    val bucket = (col(idCol) / idBucket).cast("long").as("__b")
    val inBucket = Window.partitionBy(col("__b"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = docs.select(col(idCol), col(nTokCol), bucket)
      .withColumn("__cum_in", sum(col(nTokCol)).over(inBucket))
    // per-bucket totals: a tiny frame (one row per bucket) — the only
    // global window runs over it
    val bucketTotals = withCum.groupBy(col("__b"))
      .agg(max(col("__cum_in")).as("__tot"))
    val overBuckets = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketTotals
      .withColumn("__off", sum(col("__tot")).over(overBuckets) - col("__tot"))
      .select(col("__b"), col("__off"))
    withCum.join(broadcast(offsets), Seq("__b"))
      // integer DIV, not `/`: double division would lose exactness
      // once running token sums pass 2^53
      .withColumn("__excl", col("__cum_in") + col("__off") - col(nTokCol))
      .select(col(idCol), col(nTokCol),
        expr(s"CAST(__excl DIV $budget AS BIGINT)").as("pack_id"))
  }

  /** Pack manifest: per pack, its row count, token total, and id
    * range — what a shard writer consumes. */
  def packManifest(assigned: DataFrame, idCol: String,
      nTokCol: String): DataFrame =
    assigned.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(nTokCol)).as("n_tokens"),
        min(col(idCol)).as("first_id"), max(col(idCol)).as("last_id"))
}
