package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable streaming quantile sketch — the distribution-shaped third
  * of the sketch-governance family (HLL answers `how many distinct`,
  * CMS answers `how often does THIS key occur`, this answers `what is
  * the p99`). A compactor-stack sketch in the Manku–Rajagopalan–
  * Lindsay 1998 / Karnin–Lang–Liberty 2016 family with DETERMINISTIC
  * alternating-offset compaction instead of KLL's coin flip: level `i`
  * holds items of weight `2^i` in a buffer of capacity `k`; a full
  * buffer sorts, promotes every other item to the next level at
  * doubled weight (the start offset alternates per level to de-bias
  * the pairing), and an odd item stays behind at its own level, so
  * total item mass is conserved EXACTLY (`totalWeight == n` at all
  * times — spec-pinned). Determinism means a fixed input order yields
  * a bit-identical sketch, so governance thresholds measured once stay
  * green; the trade is that (unlike HLL register-max or CMS cell-add)
  * the merge is not order-independent — estimates may move within the
  * error envelope under a different shard merge order, which is why
  * callers gate on rank-error BOUNDS, never on estimate values.
  *
  * Why this exists at 100 TB: an exact per-group quantile sorts or
  * multi-pass-selects the full value column per group, and exact
  * results from two shards do not combine. This sketch is a few KB
  * per group regardless of input rows, accepts map-side partial
  * aggregation, and MERGES (concatenate levels, re-compact) — build
  * once per shard/day/segment, roll up to any scope without a rescan,
  * exactly the x61/x63 shard→rollup shape. Rank error is
  * `O(log^2(n/k) / k)` for the deterministic variant — measured, not
  * assumed, by the x65 entry and `SketchFunctionsSpec`.
  */
final class QuantileSketch(private var capacity: Int)
    extends Serializable {

  require(capacity == 0 || capacity >= 8,
    s"k must be >= 8 (or 0 for an uninitialized union accumulator), " +
      s"got $capacity")

  private var levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  private var parity: ArrayBuffer[Boolean] = ArrayBuffer(false)
  private var count: Long = 0L

  def k: Int = capacity
  def n: Long = count
  def numLevels: Int = levels.size

  /** Items physically retained (the sketch's size); < n once any
    * compaction has fired. */
  def retained: Int = levels.iterator.map(_.size).sum

  /** Sum of item weights — the invariant `totalWeight == n` holds
    * through every compaction and merge (mass is never dropped, only
    * re-weighted). */
  def totalWeight: Long =
    levels.iterator.zipWithIndex.map { case (b, i) => b.size.toLong << i }.sum

  def update(v: Double): Unit = {
    require(capacity > 0, "cannot update an uninitialized (k=0) sketch")
    levels(0) += v
    count += 1
    if (levels(0).size >= capacity) cascade()
  }

  /** Concatenate the other sketch's levels into this one and
    * re-compact. An uninitialized (k=0) accumulator adopts the first
    * input's k; thereafter mismatched k is an error (same-params
    * enforcement, as CMS merge does). */
  def merge(o: QuantileSketch): Unit = {
    if (o.count == 0) return
    if (capacity == 0) capacity = o.capacity
    require(o.capacity == capacity,
      s"cannot merge sketches with different k: $capacity vs ${o.capacity}")
    ensureLevel(o.levels.size - 1)
    var i = 0
    while (i < o.levels.size) {
      levels(i) ++= o.levels(i)
      i += 1
    }
    count += o.count
    cascade()
  }

  private def ensureLevel(i: Int): Unit =
    while (levels.size <= i) {
      levels += ArrayBuffer.empty[Double]
      parity += false
    }

  private def cascade(): Unit = {
    var i = 0
    while (i < levels.size) {
      if (levels(i).size >= capacity) compact(i)
      i += 1
    }
  }

  /** Sort level `i`, promote every other item (alternating start
    * offset) to level `i+1` at doubled weight; an odd count leaves the
    * sorted maximum behind at level `i` (lossless retention — the
    * pairing, not the leftover, is where rank error comes from). */
  private def compact(i: Int): Unit = {
    val sorted = levels(i).sorted
    val even = sorted.length % 2 == 0
    val upto = if (even) sorted.length else sorted.length - 1
    val off = if (parity(i)) 1 else 0
    parity(i) = !parity(i)
    ensureLevel(i + 1)
    val promoted = ArrayBuffer.empty[Double]
    var j = off
    while (j < upto) {
      promoted += sorted(j)
      j += 2
    }
    levels(i) =
      if (even) ArrayBuffer.empty[Double] else ArrayBuffer(sorted(upto))
    levels(i + 1) ++= promoted
  }

  private def weightedSorted: Array[(Double, Long)] = {
    val out = new ArrayBuffer[(Double, Long)](retained)
    var i = 0
    while (i < levels.size) {
      val w = 1L << i
      levels(i).foreach(v => out += ((v, w)))
      i += 1
    }
    out.sortBy(_._1).toArray
  }

  /** Estimated p-quantile: the smallest retained value whose
    * cumulative weight reaches `ceil(p * n)`. Monotone in p by
    * construction (one cumulative scan serves every probe). */
  def quantile(p: Double): Double = {
    require(p >= 0.0 && p <= 1.0, s"p must be in [0,1], got $p")
    require(count > 0, "empty sketch has no quantiles")
    val items = weightedSorted
    val target = math.max(1L, math.ceil(p * count).toLong)
    var cum = 0L
    var i = 0
    while (i < items.length) {
      cum += items(i)._2
      if (cum >= target) return items(i)._1
      i += 1
    }
    items.last._1
  }

  /** Estimated rank of `v` (fraction of mass <= v). */
  def rank(v: Double): Double = {
    require(count > 0, "empty sketch has no ranks")
    var below = 0L
    var i = 0
    while (i < levels.size) {
      val w = 1L << i
      levels(i).foreach(x => if (x <= v) below += w)
      i += 1
    }
    below.toDouble / count.toDouble
  }

  def serialize: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(capacity)
    out.writeLong(count)
    out.writeInt(levels.size)
    var i = 0
    while (i < levels.size) {
      out.writeBoolean(parity(i))
      out.writeInt(levels(i).size)
      levels(i).foreach(out.writeDouble)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object QuantileSketch {

  /** Uninitialized accumulator for union aggregation — adopts the k of
    * the first sketch merged into it. */
  def empty: QuantileSketch = new QuantileSketch(0)

  def deserialize(bytes: Array[Byte]): QuantileSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new QuantileSketch(0)
    sk.capacity = in.readInt()
    sk.count = in.readLong()
    val nLevels = in.readInt()
    sk.levels = new ArrayBuffer[ArrayBuffer[Double]](nLevels)
    sk.parity = new ArrayBuffer[Boolean](nLevels)
    var i = 0
    while (i < nLevels) {
      sk.parity += in.readBoolean()
      val sz = in.readInt()
      val buf = new ArrayBuffer[Double](sz)
      var j = 0
      while (j < sz) {
        buf += in.readDouble()
        j += 1
      }
      sk.levels += buf
      i += 1
    }
    sk
  }
}

/** `kll_sketch_agg(value, k)` — aggregate a double column into a
  * serialized [[QuantileSketch]] (binary). A `TypedImperativeAggregate`,
  * so it participates in map-side partial aggregation: each task folds
  * its rows locally and only the KB-scale serialized sketch crosses the
  * shuffle — the same contract as Spark's own `count_min_sketch` /
  * `hll_sketch_agg`, which ship no quantile counterpart. */
case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65536, s"k must be in [8, 65536], got $k")

  override def prettyName: String = "kll_sketch_agg"

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double value column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): QuantileSketch =
    new QuantileSketch(k)

  override def update(buffer: QuantileSketch,
      input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: QuantileSketch,
      other: QuantileSketch): QuantileSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: QuantileSketch): Any = buffer.serialize

  override def serialize(buffer: QuantileSketch): Array[Byte] =
    buffer.serialize

  override def deserialize(bytes: Array[Byte]): QuantileSketch =
    QuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(
      newChild: Expression): KllSketchAgg = copy(child = newChild)
}

/** `kll_union_agg(sketch)` — union serialized [[QuantileSketch]]
  * binaries into one (concatenate levels, re-compact). The rollup half
  * of the shard→rollup pattern: per-shard sketches built once by
  * [[KllSketchAgg]] merge to any scope without rescanning the data —
  * the quantile analogue of `hll_union_agg`. Mismatched k across
  * inputs is an error (same-params enforcement). */
case class KllUnionAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_union_agg"

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): QuantileSketch =
    QuantileSketch.empty

  override def update(buffer: QuantileSketch,
      input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v != null) {
      buffer.merge(QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    }
    buffer
  }

  override def merge(buffer: QuantileSketch,
      other: QuantileSketch): QuantileSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: QuantileSketch): Any = buffer.serialize

  override def serialize(buffer: QuantileSketch): Array[Byte] =
    buffer.serialize

  override def deserialize(bytes: Array[Byte]): QuantileSketch =
    QuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(
      newChild: Expression): KllUnionAgg = copy(child = newChild)
}
