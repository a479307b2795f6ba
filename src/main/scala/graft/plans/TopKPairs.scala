package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score DESC, id ASC)
  * pairs per group in an O(k) heap, returning them best-first as
  * `array<struct<score double, id bigint>>`.
  *
  * The scale rationale vs the `row_number().over(Window)` top-k idiom:
  * a window must SHUFFLE AND SORT every candidate row of a group
  * before discarding all but k, so per-group candidate volume (corpus
  * size, for ANN ranking) hits the exchange. A TypedImperativeAggregate
  * participates in partial (map-side) aggregation — each task reduces
  * its slice to k pairs, the exchange carries only k×groups rows, and
  * the merge is a heap union. Same results, shuffle shrunk by
  * candidates/k (the corpus/k factor for brute-force ANN).
  *
  * Heap order matches the window idiom's tie-break exactly
  * (score DESC, then id ASC), so outputs are bit-identical to the
  * verified window formulation.
  */
case class TopKPairs(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with BinaryLike[Expression] with ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  /** Analysis-time contract (with implicit numeric widening): a float
    * score or int id casts up; anything non-numeric fails resolution
    * instead of a mid-task ClassCastException. */
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  override def prettyName: String = "top_k_pairs"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType),
      StructField("id", LongType))), containsNull = false)

  /** Max-heap whose head is the WORST kept pair (lowest score; ties ->
    * highest id), so eviction tests compare against the head. */
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
      pair: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(pair)
    else if (worstFirst.compare(pair, buf.head) < 0) {
      buf.dequeue(); buf.enqueue(pair)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // non-destructive: running window frames call eval() repeatedly on
    // the SAME buffer (one per output row), so draining it would lose
    // every earlier candidate from the second row on
    val bestFirst: Seq[(Double, Long)] = buf.clone().dequeueAll.reverse
    new GenericArrayData(
      bestFirst.map(p => InternalRow(p._1, p._2)).toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKPairs = copy(left = newLeft, right = newRight)
}
