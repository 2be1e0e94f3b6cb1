package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most k (score, id) pairs, best-first by
  * (score desc, id asc). Insertion keeps the array sorted — k is small
  * (ANN reranking uses k <= ~100), so O(k) shifts beat heap bookkeeping.
  *
  * Score comparison is Spark-sort-exact: `Double.compare` ranks NaN above
  * every number (so NaN rows come FIRST under the descending contract,
  * exactly where `row_number ... ORDER BY score DESC` puts them — a
  * naive `>` would instead rank NaN last, ADVICE r4), and callers
  * normalize -0.0 to 0.0 on insert, mirroring Spark's
  * NormalizeFloatingNumbers pass before sorts. */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  // true when (s1, i1) ranks strictly better than (s2, i2)
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def insert(s: Double, id: Long): Unit = {
    if (n == k && !better(s, id, scores(n - 1), ids(n - 1))) return
    // find insertion point (first slot this pair beats)
    var pos = if (n == k) n - 1 else n
    while (pos > 0 && better(s, id, scores(pos - 1), ids(pos - 1))) pos -= 1
    var j = math.min(n, k - 1)
    while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    scores(pos) = s
    ids(pos) = id
    if (n < k) n += 1
  }
}

/** Top-k per group as a single hash aggregate — replaces the
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id ASC) <= k`
  * window, which sorts EVERY candidate row per partition. The aggregate
  * keeps a k-slot buffer per group (map-side partial agg included, so the
  * shuffle carries at most k pairs per group per partition instead of all
  * candidates), identical ordering contract: score descending, id
  * ascending on ties — bit-for-bit the rows the window version emits.
  * Null scores/ids are skipped (a null can't be ranked).
  */
case class TopKByAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by requires (double score, bigint id), got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sv = s.asInstanceOf[Double]
      // -0.0 → 0.0 (NaN != 0.0, unaffected): Spark normalizes floats
      // before sorts, so the window formulation never sees -0.0 either
      buffer.insert(if (sv == 0.0d) 0.0d else sv, i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var j = 0
    while (j < other.n) { buffer.insert(other.scores(j), other.ids(j)); j += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData((0 until buffer.n).map(j =>
      InternalRow(buffer.ids(j), buffer.scores(j))).toArray[Any])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.n * 16)
    bb.putInt(buffer.n)
    var j = 0
    while (j < buffer.n) { bb.putDouble(buffer.scores(j)); bb.putLong(buffer.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.insert(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByAgg {
  /** Column API: top-k (neighbor_id, cosine) structs by (score desc, id
    * asc) — drop-in for the window row_number pattern. */
  def top_k_by(score: Column, id: Column, k: Int): Column =
    shims.columnOf(TopKByAgg(
      shims.expressionOf(score), shims.expressionOf(id), k).toAggregateExpression())

  /** Column API: string-payload variant (score desc, payload asc). */
  def top_k_by_str(score: Column, payload: Column, k: Int): Column =
    shims.columnOf(TopKStrAgg(
      shims.expressionOf(score), shims.expressionOf(payload), k).toAggregateExpression())
}

/** String-payload top-k buffer: (score desc, payload asc), duplicates
  * retained in separate slots — identical to how `row_number` ranks
  * duplicate rows. */
final class TopKStrBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val payloads = new Array[org.apache.spark.unsafe.types.UTF8String](k)
  var n = 0

  @inline private def better(s1: Double, p1: org.apache.spark.unsafe.types.UTF8String,
      s2: Double, p2: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    // Double.compare: NaN ranks largest → first under DESC, matching
    // Spark's nan-safe window sort (see TopKBuffer)
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && p1.compareTo(p2) < 0)
  }

  /** Whether an insert of (s, p) would enter the buffer — lets the caller
    * skip the defensive UTF8String copy for the (vast majority of) rows
    * that never qualify. */
  def wouldAccept(s: Double, p: org.apache.spark.unsafe.types.UTF8String): Boolean =
    n < k || better(s, p, scores(n - 1), payloads(n - 1))

  def insert(s: Double, p: org.apache.spark.unsafe.types.UTF8String): Unit = {
    if (!wouldAccept(s, p)) return
    var pos = if (n == k) n - 1 else n
    while (pos > 0 && better(s, p, scores(pos - 1), payloads(pos - 1))) pos -= 1
    var j = math.min(n, k - 1)
    while (j > pos) { scores(j) = scores(j - 1); payloads(j) = payloads(j - 1); j -= 1 }
    scores(pos) = s
    payloads(pos) = p
    if (n < k) n += 1
  }
}

/** [[TopKByAgg]] with a string payload — used for the reference's top-5
  * consequent lists in association mining (confidence desc, consequent
  * asc, duplicate pairs keep their multiplicity). */
case class TopKStrAgg(
    score: Expression,
    payload: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer] {

  require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")

  override def children: Seq[Expression] = Seq(score, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("payload", StringType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && payload.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_str requires (double score, string payload), got " +
        s"(${score.dataType.simpleString}, ${payload.dataType.simpleString})")

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buffer: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      val sv0 = s.asInstanceOf[Double]
      val sv = if (sv0 == 0.0d) 0.0d else sv0 // -0.0 → 0.0, as in TopKByAgg
      val pv = p.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      // the input row's UTF8String is backed by a reused buffer — copy,
      // but only for rows that actually enter the top-k
      if (buffer.wouldAccept(sv, pv)) buffer.insert(sv, pv.clone())
    }
    buffer
  }

  override def merge(buffer: TopKStrBuffer, other: TopKStrBuffer): TopKStrBuffer = {
    var j = 0
    while (j < other.n) { buffer.insert(other.scores(j), other.payloads(j)); j += 1 }
    buffer
  }

  override def eval(buffer: TopKStrBuffer): Any =
    new GenericArrayData((0 until buffer.n).map(j =>
      InternalRow(buffer.payloads(j), buffer.scores(j))).toArray[Any])

  override def serialize(buffer: TopKStrBuffer): Array[Byte] = {
    val payloadBytes = (0 until buffer.n).map(j => buffer.payloads(j).getBytes)
    val bb = ByteBuffer.allocate(4 + buffer.n * 12 + payloadBytes.map(_.length).sum)
    bb.putInt(buffer.n)
    var j = 0
    while (j < buffer.n) {
      bb.putDouble(buffer.scores(j))
      bb.putInt(payloadBytes(j).length)
      bb.put(payloadBytes(j))
      j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKStrBuffer(k)
    var j = 0
    while (j < n) {
      val s = bb.getDouble
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.insert(s, org.apache.spark.unsafe.types.UTF8String.fromBytes(arr))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStrAgg =
    copy(score = newChildren(0), payload = newChildren(1))
}
