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

/** Mergeable bottom-k DISTINCT-hash sketch (KMV, Bar-Yossef et al. 2002):
  * the k smallest distinct hash values seen — the set-valued sibling of
  * [[QuantileSampleAgg]] (which keeps multiset multiplicities for rank
  * estimation). The distinct-set state is what enables set OPERATIONS on
  * sketches — intersection/Jaccard estimation between groups, which HLL
  * registers fundamentally cannot do (inclusion-exclusion on HLL
  * estimates explodes for small overlaps).
  *
  * The buffer is a bounded max-heap over a dedup set: insert ignores
  * hashes already present, evicts the largest when over k. Like the
  * bottom-k rank sketch, the state is a pure function of the input SET —
  * merge = union-then-trim in any order — so partial-merge order cannot
  * perturb it and the full sketch reproduces in any engine with md5
  * (feed `hex_to_long(substr(md5(x), 1, 15))` hashes).
  *
  * Null hashes are skipped. Output: sorted ascending array<long> of at
  * most k distinct hashes.
  */
case class KmvSetAgg(
    hashChild: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def children: Seq[Expression] = Seq(hashChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashChild.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a bigint hash, got ${hashChild.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def insert(buf: mutable.TreeSet[Long], h: Long): Unit =
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf -= buf.last; buf += h }

  override def update(buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val h = hashChild.eval(input)
    if (h != null) insert(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSetAgg =
    copy(hashChild = newChildren(0))
}

object KmvSketch {
  /** Column API: bottom-k distinct-hash sketch as a sorted array<long>.
    * Mergeable across groups by union-then-trim. */
  def kmv_sketch(hash: Column, k: Int): Column =
    shims.columnOf(
      KmvSetAgg(shims.expressionOf(hash), k).toAggregateExpression())
}
