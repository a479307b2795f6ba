package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{lit, xxhash64}

/** Column wrappers over Spark's own bloom-filter expressions — the
  * exact machinery Catalyst's InjectRuntimeFilter uses for runtime
  * row-level join pruning, exposed so a pipeline can build the filter
  * from an arbitrary keyed frame and apply it where the optimizer
  * cannot see the opportunity (e.g. across a materialization
  * boundary, or ahead of an expensive non-join operator).
  *
  * The aggregate produces the sketch as one binary value; at cluster
  * scale that binary is driver-collected (it is KB–MB regardless of
  * input row count — that is the point of a sketch) and re-broadcast
  * as a literal, which is precisely how Spark materializes its own
  * runtime bloom filters (subquery result → literal). `mightContain`
  * then evaluates codegen'd per row with zero shuffle: false
  * positives are possible (callers must re-verify with an exact join
  * or equality), false negatives are not.
  */
object SketchFunctions {

  /** Spark 4.1.2's BloomFilterMightContain type-checks ONLY
    * (Binary, Long) — a sketch built directly from a string column
    * could never be probed (analysis error), and int keys would need
    * an explicit cast. So BOTH sides normalize the key through
    * xxhash64 (any atomic type → long) — exactly how Catalyst's
    * InjectRuntimeFilter handles non-long join keys. The extra hash
    * only adds collisions WITHIN the bloom's false-positive contract;
    * no-false-negatives is preserved because build and probe hash
    * identically. */
  private def normKey(key: Column): Column = xxhash64(key)

  /** Aggregate a key column (any atomic type) into a bloom-filter
    * sketch (binary) — Spark's native BloomFilterAggregate over the
    * xxhash64-normalized key. */
  def bloomFilterAgg(key: Column, expectedItems: Long): Column =
    GraftBridge.column(
      new BloomFilterAggregate(GraftBridge.expression(normKey(key)),
        expectedItems).toAggregateExpression())

  /** Probe a driver-collected sketch: true if `key` MIGHT be in the
    * set the sketch was built from (no false negatives — callers must
    * still re-verify positives with an exact join or equality). The
    * sketch rides the plan as a literal — broadcast with the task
    * binary, never shuffled. `key` must be normalized the same way as
    * the build side, which happens here: pass the raw column. */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(lit(sketch)),
      GraftBridge.expression(normKey(key))))

  /** Per-key frequency estimate from a driver-collected count-min
    * sketch (built with Spark's `count_min_sketch` aggregate, merged
    * across shards with [[graft.plans.CmsEstimate.merge]]). Same
    * literal-sketch transport as [[mightContain]]; the estimate is
    * one-sided — never below the true count, above it by at most
    * `eps * totalCount` with the sketch's configured confidence. */
  def cmsEstimate(sketch: Array[Byte], key: Column): Column =
    GraftBridge.column(graft.plans.CmsEstimate(
      GraftBridge.expression(lit(sketch)),
      GraftBridge.expression(key)))

  /** Aggregate a numeric column into a serialized mergeable quantile
    * sketch (binary) — [[graft.plans.KllSketchAgg]], the
    * distribution-shaped sibling of `hll_sketch_agg` (distincts) and
    * `count_min_sketch` (frequencies), which Spark ships no quantile
    * counterpart for. Map-side partials fold rows locally; only the
    * KB-scale sketch crosses the shuffle. */
  def kllAgg(value: Column, k: Int): Column =
    GraftBridge.column(graft.plans.KllSketchAgg(
      GraftBridge.expression(value.cast("double")), k)
      .toAggregateExpression())

  /** Union serialized quantile sketches into one (the rollup half of
    * the shard→rollup pattern — the quantile analogue of
    * `hll_union_agg`). Probe the result driver-side via
    * [[graft.plans.QuantileSketch.deserialize]]`.quantile(p)`. */
  def kllUnionAgg(sketch: Column): Column =
    GraftBridge.column(graft.plans.KllUnionAgg(
      GraftBridge.expression(sketch)).toAggregateExpression())
}
