package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, LongType, MapType}

import scala.collection.mutable

/** Distributed union-find as a Catalyst aggregate: connected components in
  * ONE aggregation pass (the optional speedup sketched in SURVEY.md §7.7).
  *
  * Each partition folds its edge stream into a local disjoint-set forest
  * (the partial buffer is a compressed spanning forest, ≤ #local-vertices
  * entries, regardless of edge count); partials merge by replaying their
  * parent links as unions. The final buffer holds parent links for every
  * vertex — so this path suits graphs whose VERTEX set fits in a task
  * (edges only stream), complementing the fully-distributed GraphX /
  * alternating-star paths for larger vertex sets.
  *
  * eval returns map<vertex(long) -> root(long)> with every seen vertex
  * present and root ids canonicalized to the smallest member id.
  */
case class UnionFindAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(LongType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  private def find(m: mutable.LongMap[Long], x0: Long): Long = {
    var x = x0
    var p = m.getOrElse(x, x)
    while (p != x) { // path halving
      val gp = m.getOrElse(p, p)
      m.update(x, gp)
      x = gp
      p = m.getOrElse(x, x)
    }
    x
  }

  private def union(m: mutable.LongMap[Long], a: Long, b: Long): Unit = {
    val ra = find(m, a)
    val rb = find(m, b)
    val root = math.min(ra, rb)
    // union by smaller id → roots are canonical minima without a final scan
    if (ra < rb) m.update(rb, ra)
    else if (rb < ra) m.update(ra, rb)
    // record both endpoints as seen (plain contains+update: getOrElseUpdate
    // with a map-mutating default is unsafe during rehash)
    if (!m.contains(a)) m.update(a, root)
    if (!m.contains(b)) m.update(b, root)
  }

  override def update(buffer: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l != null && r != null) {
      union(buffer, l.asInstanceOf[Long], r.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: mutable.LongMap[Long], other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreach { case (k, v) => union(buffer, k, v) }
    buffer
  }

  override def eval(buffer: mutable.LongMap[Long]): Any = {
    val keys = buffer.keys.toArray
    val roots = keys.map(k => find(buffer, k))
    new ArrayBasedMapData(
      new GenericArrayData(keys.map(x => x: Any)),
      new GenericArrayData(roots.map(x => x: Any)))
  }

  override def serialize(buffer: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.size * 16)
    bb.putLong(buffer.size.toLong)
    buffer.foreach { case (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong.toInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): UnionFindAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UnionFindAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): UnionFindAgg =
    copy(left = newChildren(0), right = newChildren(1))
}

object UnionFindAgg {
  /** Column API: aggregate two long id columns into map<vertex, root>. */
  def union_find(src: Column, dst: Column): Column =
    shims.columnOf(
      UnionFindAgg(shims.expressionOf(src), shims.expressionOf(dst))
        .toAggregateExpression())
}
