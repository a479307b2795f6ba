package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-estimate probe into a serialized count-min sketch (Cormode &
  * Muthukrishnan 2005): `cms_estimate(sketch, key)` returns the
  * sketch's frequency estimate for `key`. The companion of Spark's own
  * `count_min_sketch` aggregate, which builds the sketch but ships no
  * expression to query it — without a probe the aggregate is
  * write-only.
  *
  * The estimate is one-sided by construction: never below the true
  * count, above it by at most `eps * totalCount` with probability
  * `confidence` (min over `depth` independent counter rows, each
  * counter the sum of every colliding key). That makes the sketch the
  * 100 TB answer to per-key frequency questions the same way HLL
  * (x61) answers distinct-cardinality ones: a frequency table over a
  * high-cardinality key (tokens, URLs, n-grams) shuffles every
  * distinct key, while a CMS is a fixed-size counter grid that
  * accepts map-side partial aggregation and MERGES losslessly
  * (counter grids add cell-wise), so per-shard sketches built once
  * roll up to any scope without rescanning.
  *
  * Keys hash through their UTF-8 bytes on both sides: Spark's
  * `CountMinSketchAgg` adds string inputs as `UTF8String.getBytes`
  * and this probe calls `estimateCount(byte[])` — the same Murmur3
  * path, so build and probe agree bit-for-bit.
  *
  * The sketch argument is expected to ride the plan as a literal (the
  * [[graft.functions.SketchFunctions]] bloom pattern: driver-collect
  * the KB-scale binary, re-broadcast with the task binary). Each
  * evaluation thread deserializes the grid once and memoizes by
  * reference, so per-row cost is the probe's `depth` hashes, not a
  * deserialization.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    CmsEstimate.estimate(sketch.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"${ev.value} = graft.plans.CmsEstimate.estimate($s, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {

  /** Per-thread TWO-slot memo of deserialized sketches, keyed by
    * array REFERENCE: each sketch is a plan literal, so every row of
    * a task sees the same array object and deserialization happens
    * once per (thread, sketch), not once per row. Two slots because a
    * projection that probes two sketches per row (comparing epochs,
    * before/after grids) alternates between them — a 1-slot memo
    * deserializes BOTH multi-KB grids on EVERY row. Slot 0 is
    * most-recently-used; a miss evicts slot 1. Reference (not
    * content) comparison is deliberate — content-hashing a multi-KB
    * grid per row would cost more than the probe it guards. */
  private val memo =
    new ThreadLocal[Array[(Array[Byte], CountMinSketch)]] {
      override def initialValue(): Array[(Array[Byte], CountMinSketch)] =
        new Array[(Array[Byte], CountMinSketch)](2)
    }

  /** Total grid deserializations across threads — test observability
    * for the memo's hit rate (one increment per MISS only; no cost on
    * the hit path). */
  private[graft] val deserializations =
    new java.util.concurrent.atomic.AtomicLong(0L)

  def estimate(sketch: Array[Byte], key: UTF8String): Long = {
    val slots = memo.get()
    val s0 = slots(0)
    if (s0 != null && (s0._1 eq sketch))
      return s0._2.estimateCount(key.getBytes)
    val s1 = slots(1)
    if (s1 != null && (s1._1 eq sketch)) {
      slots(1) = s0; slots(0) = s1 // promote to MRU
      return s1._2.estimateCount(key.getBytes)
    }
    deserializations.incrementAndGet()
    val fresh = (sketch, CountMinSketch.readFrom(sketch))
    slots(1) = s0; slots(0) = fresh
    fresh._2.estimateCount(key.getBytes)
  }

  /** Driver-side lossless union of serialized sketches (cell-wise sum
    * of counter grids — requires identical depth/width/seed, which
    * `mergeInPlace` enforces). The shard→rollup path: build one
    * sketch per shard/day/segment with the aggregate, merge the
    * KB-scale binaries here, probe the union. */
  def merge(sketches: Seq[Array[Byte]]): Array[Byte] = {
    require(sketches.nonEmpty, "cms merge needs at least one sketch")
    val acc = CountMinSketch.readFrom(sketches.head)
    sketches.tail.foreach(b => acc.mergeInPlace(CountMinSketch.readFrom(b)))
    acc.toByteArray
  }
}
