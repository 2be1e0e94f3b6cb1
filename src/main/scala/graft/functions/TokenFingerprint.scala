package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Loop kernel for [[TokenFingerprint]], shared by interpreted eval and the
  * generated code. Semantically identical to the column-algebra formula in
  * [[graft.ops.TextStats.fingerprint]]:
  *
  *   fp = ( Σ_i (codepoint(token_i[0])·31 + len(token_i)) · 31^(i mod 8) ) mod 1e9+7
  *
  * over tokens split on single spaces (trailing empties kept, like Spark's
  * `split(text, ' ')` with limit -1; empty token → code 0). The first
  * codepoint is decoded from UTF-8, matching `ascii()` for all valid input.
  */
object TokenFingerprintImpl {
  private val pows: Array[Long] =
    Array(1L, 31L, 961L, 29791L, 923521L, 28629151L, 887503681L, 27512614111L)

  def compute(s: UTF8String, mod: Long): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var tokIdx = 0
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val len = i - start
        // first CODEPOINT (matches ascii()/DuckDB ascii semantics, not just
        // the leading byte), decoded from UTF-8
        val first: Long =
          if (len == 0) 0L
          else {
            val b0 = bytes(start) & 0xff
            if (b0 < 0x80) b0.toLong
            else if (b0 < 0xe0 && len >= 2)
              (((b0 & 0x1f) << 6) | (bytes(start + 1) & 0x3f)).toLong
            else if (b0 < 0xf0 && len >= 3)
              (((b0 & 0x0f) << 12) | ((bytes(start + 1) & 0x3f) << 6) |
                (bytes(start + 2) & 0x3f)).toLong
            else if (len >= 4)
              (((b0 & 0x07) << 18) | ((bytes(start + 1) & 0x3f) << 12) |
                ((bytes(start + 2) & 0x3f) << 6) | (bytes(start + 3) & 0x3f)).toLong
            else b0.toLong
          }
        var chars = 0
        var j = start
        while (j < i) { if ((bytes(j) & 0xc0) != 0x80) chars += 1; j += 1 }
        val code = first * 31L + chars
        // per-term mod: keeps the running sum overflow-free for any
        // realistic document length (matches TextStats.fingerprint)
        acc += (code * pows(tokIdx & 7)) % mod
        tokIdx += 1
        start = i + 1
      }
      i += 1
    }
    acc % mod
  }
}

/** Native Catalyst expression (with real codegen, no CodegenFallback) for
  * the rolling token fingerprint — a single tight loop over the UTF8String
  * bytes instead of split + transform + aggregate (three interpreted
  * higher-order passes with per-token allocations).
  */
case class TokenFingerprint(child: Expression, mod: Long = 1000000007L)
    extends UnaryExpression {

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_fingerprint requires a string argument, got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    TokenFingerprintImpl.compute(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenFingerprintImpl.compute($c, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): TokenFingerprint =
    copy(child = newChild)
}

object functions {
  import org.apache.spark.sql.graft.shims

  /** Column API for the native fingerprint expression. */
  def token_fingerprint(c: Column): Column =
    shims.columnOf(TokenFingerprint(shims.expressionOf(c)))

  /** Column API for the native hex→long parse (≤ 15 hex chars; the fast
    * replacement for `conv(s, 16, 10).cast("long")` on md5 lanes). */
  def hex_to_long(c: Column): Column =
    shims.columnOf(HexToLong(shims.expressionOf(c)))

  private[graft] def buildTokenFingerprint(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"token_fingerprint expects exactly 1 argument, got ${exprs.length}")
    TokenFingerprint(exprs.head)
  }

  private[graft] def buildArrayDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"array_dot expects exactly 2 arguments, got ${exprs.length}")
    ArrayDot(exprs.head, exprs(1))
  }

  private[graft] def buildArrayQuantize(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"array_quantize expects exactly 2 arguments, got ${exprs.length}")
    ArrayQuantize(exprs.head, exprs(1))
  }

  private[graft] def buildHexToLong(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"hex_to_long expects exactly 1 argument, got ${exprs.length}")
    HexToLong(exprs.head)
  }

  /** Extract a compile-time integer argument (p, k, nBits …) from a SQL
    * literal — these parameterize buffer SIZES, so they cannot be
    * data-dependent. */
  private def intLiteral(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Short, _) => v.toInt
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Byte, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private[graft] def buildHllRegisters(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"hll_registers expects (hash, p), got ${exprs.length} arguments")
    HllRegistersAgg(exprs.head, intLiteral(exprs(1), "p"))
  }

  private[graft] def buildBitVotes(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"bit_votes expects (hash, nBits), got ${exprs.length} arguments")
    BitVoteAgg(exprs.head, intLiteral(exprs(1), "nBits"))
  }

  private[graft] def buildTopKBy(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"top_k_by expects (score, id, k), got ${exprs.length} arguments")
    TopKByAgg(exprs.head, exprs(1), intLiteral(exprs(2), "k"))
  }

  private[graft] def buildTopKByStr(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"top_k_by_str expects (score, payload, k), got ${exprs.length} arguments")
    TopKStrAgg(exprs.head, exprs(1), intLiteral(exprs(2), "k"))
  }

  private[graft] def buildQuantileSample(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"quantile_sample expects (hash, value, k), got ${exprs.length} arguments")
    QuantileSampleAgg(exprs.head, exprs(1), intLiteral(exprs(2), "k"))
  }

  private[graft] def buildKmvSketch(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"kmv_sketch expects (hash, k), got ${exprs.length} arguments")
    KmvSetAgg(exprs.head, intLiteral(exprs(1), "k"))
  }

  /** Register graft's native functions for SQL use
    * (`SELECT token_fingerprint(text), array_dot(a, b),
    * hll_registers(h, 6), top_k_by(score, id, 5) ...`). Aggregate
    * builders return the raw AggregateFunction — the analyzer wraps it in
    * an AggregateExpression exactly as for built-in aggregates. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("hex_to_long", buildHexToLong, "scala_udf")
    reg.createOrReplaceTempFunction("token_fingerprint", buildTokenFingerprint, "scala_udf")
    reg.createOrReplaceTempFunction("array_dot", buildArrayDot, "scala_udf")
    reg.createOrReplaceTempFunction("array_quantize", buildArrayQuantize, "scala_udf")
    reg.createOrReplaceTempFunction("hll_registers", buildHllRegisters, "scala_udf")
    reg.createOrReplaceTempFunction("bit_votes", buildBitVotes, "scala_udf")
    reg.createOrReplaceTempFunction("top_k_by", buildTopKBy, "scala_udf")
    reg.createOrReplaceTempFunction("top_k_by_str", buildTopKByStr, "scala_udf")
    reg.createOrReplaceTempFunction("quantile_sample", buildQuantileSample, "scala_udf")
    reg.createOrReplaceTempFunction("kmv_sketch", buildKmvSketch, "scala_udf")
  }
}
