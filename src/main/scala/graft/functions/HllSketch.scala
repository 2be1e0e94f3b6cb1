package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** HyperLogLog register aggregate — the one-pass, mergeable,
  * constant-memory way to count distincts at 100 TB (a `COUNT(DISTINCT x)`
  * is a full shuffle of every distinct value; a sketch is 2^p ints per
  * group, partial-aggregated map-side and merged by elementwise max, so
  * the shuffle carries one small array per group per partition).
  *
  * Register math (Flajolet et al. 2007) over a caller-supplied uniform
  * hash `h` in [0, 2^hashBits):
  *   idx = h mod 2^p                 (register index, low p bits)
  *   w   = h >> p                    (remaining hashBits - p bits)
  *   rho = w == 0 ? hashBits - p + 1 : trailingZeros(w) + 1
  *   M[idx] = max(M[idx], rho)
  *
  * `rho` uses the TRAILING-zero rank rather than the classical leading-zero
  * one — the same geometric distribution (each extra zero halves the
  * probability), chosen because it is reproducible in portable SQL with
  * pure integer ops: lowest set bit `w & -w`, then `bit_count((w&-w)-1)+1`.
  * That makes the register array itself hash-exact across engines (see the
  * q_hll_distinct oracle); nothing about the estimate depends on which rank
  * is used. Null hashes contribute nothing (SQL distinct-count semantics).
  *
  * The hash should be the first 15 hex chars of md5 read as a 60-bit int —
  * `conv(substring(md5(x),1,15),16,10)` / `('0x'||substr(md5(x),1,15))::BIGINT`
  * — the same md5-lane idiom as the portable MinHash/SimHash operators.
  */
case class HllRegistersAgg(
    child: Expression,
    p: Int,
    hashBits: Int = 60,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  require(p >= 2 && p <= 14, s"p must be in [2, 14], got $p")
  require(hashBits > p && hashBits <= 62, s"hashBits must be in (p, 62], got $hashBits")

  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_registers requires a bigint hash argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = (h & (m - 1)).toInt
      val w = h >>> p
      val rho =
        if (w == 0L) hashBits - p + 1
        else java.lang.Long.numberOfTrailingZeros(w) + 1
      if (rho > buffer(idx)) buffer(idx) = rho
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(m * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegistersAgg =
    copy(child = newChildren.head)
}

object Hll {
  /** Column API: aggregate a 60-bit bigint hash column into 2^p HLL
    * registers (array<int>). Mergeable: registers of a union are the
    * elementwise max. */
  def hll_registers(hash: Column, p: Int): Column =
    shims.columnOf(
      HllRegistersAgg(shims.expressionOf(hash), p).toAggregateExpression())

  /** The standard bias-corrected HLL cardinality estimate with the
    * linear-counting small-range correction. Driver-side helper over a
    * collected register array; relative error ≈ 1.04/sqrt(2^p).
    */
  def estimate(registers: Seq[Int]): Double = {
    val m = registers.length
    require(m >= 4 && (m & (m - 1)) == 0, s"register count must be a power of two, got $m")
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val indicator = registers.map(r => math.pow(2.0, -r)).sum
    val raw = alpha * m * m / indicator
    val zeros = registers.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}
