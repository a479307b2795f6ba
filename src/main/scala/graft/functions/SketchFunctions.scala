package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.lit

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

  /** Aggregate a key column into a bloom-filter sketch (binary).
    * Accepts int/long/string keys — Spark's native
    * BloomFilterAggregate. */
  def bloomFilterAgg(key: Column, expectedItems: Long): Column =
    GraftBridge.column(
      new BloomFilterAggregate(GraftBridge.expression(key), expectedItems)
        .toAggregateExpression())

  /** Probe a driver-collected sketch: true if `key` MIGHT be in the
    * set the sketch was built from (no false negatives). The sketch
    * rides the plan as a literal — broadcast with the task binary,
    * never shuffled. */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(lit(sketch)),
      GraftBridge.expression(key)))
}
