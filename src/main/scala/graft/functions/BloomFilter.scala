package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter membership kernel shared by the aggregate (build) and the
  * codegen expression (probe).
  *
  * Wire format (the aggregate's output and the probe's input):
  * `[k: 1 byte][bit array: numBits/8 bytes]`. Probe i of value v sets/tests
  * bit `(xxhash64(v, seed=i) & Long.MaxValue) % numBits` — the same XXH64
  * kernel as Spark's `xxhash64` function, so build and probe agree on any
  * engine/JVM. Bits are tested directly on the byte array: no
  * deserialization per row, k array reads per probe.
  */
object BloomFilterImpl {
  def numBitsOf(bytes: Array[Byte]): Long = (bytes.length - 1).toLong * 8L

  def setBit(bytes: Array[Byte], bit: Long): Unit = {
    val idx = 1 + (bit >>> 3).toInt // skip the k header byte
    bytes(idx) = (bytes(idx) | (1 << (bit & 7)).toByte).toByte
  }

  def testBit(bytes: Array[Byte], bit: Long): Boolean = {
    val idx = 1 + (bit >>> 3).toInt
    (bytes(idx) & (1 << (bit & 7))) != 0
  }

  def bitFor(v: Long, seed: Int, numBits: Long): Long =
    (XXH64.hashLong(v, seed) & Long.MaxValue) % numBits

  def add(bytes: Array[Byte], v: Long): Unit = {
    val k = bytes(0) & 0xff
    val m = numBitsOf(bytes)
    var i = 0
    while (i < k) { setBit(bytes, bitFor(v, i, m)); i += 1 }
  }

  /** Row-hot probe: called from whole-stage codegen. */
  def mightContain(bytes: Array[Byte], v: Long): Boolean = {
    val k = bytes(0) & 0xff
    val m = numBitsOf(bytes)
    var i = 0
    while (i < k) {
      if (!testBit(bytes, bitFor(v, i, m))) return false
      i += 1
    }
    true
  }
}

/** Mergeable Bloom-filter build aggregate over a bigint key column.
  *
  * The 100 TB use: a runtime semi-join filter. Aggregate the SMALL side's
  * join keys into `numBits` bits (map-side partials OR-merge, so the
  * shuffle carries one fixed-size byte array per partition), then prune
  * the BIG side at the scan with [[BloomMightContain]] BEFORE its shuffle —
  * rows that cannot have a match never enter the exchange. False positives
  * are removed by the exact join that follows; false negatives are
  * impossible, so the composed result is exact (see
  * [[graft.ops.BloomPrune]]).
  *
  * Buffer = raw wire bytes; merge = bitwise OR, commutative and
  * associative, so the filter is a pure function of the key SET —
  * partition layout and merge order cannot perturb it (same reproducibility
  * contract as [[HllRegistersAgg]]).
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(numBits >= 64 && (numBits & 7) == 0,
    s"numBits must be >= 64 and a multiple of 8, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1, 16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_filter_agg requires a bigint argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Byte] = {
    val b = new Array[Byte](1 + numBits / 8)
    b(0) = numHashes.toByte
    b
  }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomFilterImpl.add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 1
    while (i < buffer.length) {
      buffer(i) = (buffer(i) | other(i)).toByte
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

/** `might_contain(filter, key)`: codegen Bloom probe. `filter` is the wire
  * bytes from [[BloomFilterAgg]] (in practice a literal, so the probe stays
  * inside whole-stage codegen over the big-side scan); `key` is the bigint
  * join key. Never false-negative; false positives at the standard
  * (1 - e^(-kn/m))^k rate.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bloom_might_contain requires (binary, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(filter: Any, key: Any): Any =
    BloomFilterImpl.mightContain(
      filter.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, k) =>
      s"graft.functions.BloomFilterImpl.mightContain($f, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomFilter {
  /** Aggregate a bigint key column into Bloom-filter wire bytes. */
  def bloom_filter_agg(key: Column, numBits: Int, numHashes: Int): Column =
    shims.columnOf(
      BloomFilterAgg(shims.expressionOf(key), numBits, numHashes)
        .toAggregateExpression())

  /** Probe: true iff `key` might be in the set `filter` was built from. */
  def bloom_might_contain(filter: Column, key: Column): Column =
    shims.columnOf(BloomMightContain(
      shims.expressionOf(filter), shims.expressionOf(key)))
}
