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

  /** Sliding-window chunking: split each document into
    * `chunkSize`-token chunks whose starts advance by
    * `chunkSize - overlap` tokens — the context-window prep that
    * turns long documents into trainable sequences without losing
    * the text that straddles a boundary. The final chunk may be
    * shorter; a document with at most `chunkSize` tokens yields
    * exactly one chunk.
    *
    * Emits (idCol, chunk_id, start_tok, n_tokens, chunk_md5) —
    * chunk content travels as an md5 digest because downstream
    * consumers (dedup, manifests, the oracle gate) only need
    * identity; a writer variant would keep the text column.
    *
    * Scale shape: tokenization, chunk slicing, and hashing all
    * happen INSIDE one row before a posexplode — a narrow operator
    * with zero shuffles whose output is ~n_tokens/step rows per doc.
    * The token array is materialized in a projection first and only
    * the BOUND attribute is referenced inside the transform lambda
    * (the HOF-recompute contract), so per-chunk work is one slice +
    * join + md5, not a re-tokenization. */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize,
      "overlap must be in [0, chunkSize)")
    val step = chunkSize - overlap
    docs.select(col(idCol),
        graft.functions.TextFunctions.wsTokens(col(textCol)).as("__tk"))
      .select(col(idCol), expr(
        s"""transform(
           |  sequence(1, greatest(size(__tk) - $overlap, 1), $step),
           |  st -> struct(
           |    CAST(st AS BIGINT) AS start_tok,
           |    CAST(least($chunkSize, size(__tk) - st + 1) AS BIGINT)
           |      AS n_tokens,
           |    md5(array_join(slice(__tk, st, $chunkSize), ' '))
           |      AS chunk_md5))""".stripMargin).as("__chunks"))
      .select(col(idCol), posexplode(col("__chunks")))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col.start_tok"), col("col.n_tokens"), col("col.chunk_md5"))
  }

  /** Pack manifest: per pack, its row count, token total, and id
    * range — what a shard writer consumes. */
  def packManifest(assigned: DataFrame, idCol: String,
      nTokCol: String): DataFrame =
    assigned.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(nTokCol)).as("n_tokens"),
        min(col(idCol)).as("first_id"), max(col(idCol)).as("last_id"))
}
