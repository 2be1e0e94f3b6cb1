package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Mergeable rank/quantile sketch: the k rows with the SMALLEST
  * (hash, value) pairs — a deterministic bottom-k order-statistic sample
  * (the KMV idea applied to rank estimation). Replaces
  * `Quantiles.histogramQuantiles`' data-dependent `bucketWidth` knob with
  * a data-independent accuracy knob `k` (standard sampling bound: rank
  * error O(1/sqrt(k))), in constant memory, one pass, map-side partials.
  *
  * Deliberately NOT a compacting KLL: KLL's compaction decisions depend on
  * the merge tree, so under Spark's nondeterministic partial-merge order
  * the sketch state is not reproducible run-to-run, let alone across
  * engines. The bottom-k state is a pure function of the input MULTISET —
  * merge = union-then-trim in any order — which is what lets the
  * q_quantiles_sketch oracle compare the full sketch state hash-exactly
  * (the q_hll_distinct register-compare pattern; asymptotically KLL's
  * O(1/k) beats O(1/sqrt(k)), the documented price of determinism).
  *
  * The hash must be the portable md5 lane of the VALUE's string form
  * (`hex_to_long(substr(md5(v), 1, 15))`), so equal values share a hash
  * and the sample is a coordinated value-domain sample with row
  * multiplicities kept — still a consistent row-quantile estimator
  * (multiplicity is independent of the hash), and reproducible anywhere
  * md5 exists.
  */
case class QuantileSampleAgg(
    hashChild: Expression,
    valueChild: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def children: Seq[Expression] = Seq(hashChild, valueChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashChild.dataType == LongType && valueChild.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "quantile_sample requires (bigint hash, bigint value), got " +
        s"(${hashChild.dataType.simpleString}, ${valueChild.dataType.simpleString})")

  // max-heap on (h, v): head is the largest kept pair, evicted first
  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)]

  private def insert(buf: mutable.PriorityQueue[(Long, Long)], p: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(p)
    else if (Ordering[(Long, Long)].lt(p, buf.head)) {
      buf.dequeue(); buf.enqueue(p)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null) insert(buf, (h.asInstanceOf[Long], v.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(
      buf.toSeq.sorted.map { case (h, v) => InternalRow(h, v) })

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (h, v) => bb.putLong(h); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSampleAgg =
    copy(hashChild = newChildren(0), valueChild = newChildren(1))
}

object QuantileSample {
  /** Column API: bottom-k (hash, value) sample as array<struct<h,v>>
    * sorted ascending. Mergeable across groups by union-then-trim. */
  def quantile_sample(hash: Column, value: Column, k: Int): Column =
    shims.columnOf(
      QuantileSampleAgg(shims.expressionOf(hash), shims.expressionOf(value), k)
        .toAggregateExpression())
}
