package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Loop kernel shared by interpreted eval and generated code:
  * per-element `floor(x * scale)`, null slots preserved — element-wise
  * identical to `transform(vec, x -> floor(x * scale))`, which it
  * replaces (higher-order array expressions are CodegenFallback,
  * interpreted per row, and sat in the hot path of every quantized ANN
  * query). Result elements are integral-valued doubles (the form the
  * DuckDB oracles' `list_transform(v, x -> FLOOR(x * scale))` produces),
  * not longs: `math.floor` keeps NaN/±Inf semantics aligned with SQL
  * FLOOR, where Spark's long-typed `floor()` would collapse NaN to 0.
  */
object ArrayQuantizeImpl {
  def compute(a: ArrayData, scale: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) out(i) = math.floor(a.getDouble(i) * scale)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native `floor(x * scale)` quantization of an array<double> column with
  * real codegen; `scale` must be a foldable double (it's evaluated once at
  * plan time and burned into the generated code).
  */
case class ArrayQuantize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!vecOk) TypeCheckResult.TypeCheckFailure(
      s"array_quantize requires array<double>, got ${left.dataType.simpleString}")
    else if (right.dataType != DoubleType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "array_quantize requires a foldable double scale")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val scale: Double =
    right.eval(null).asInstanceOf[Double]

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = left.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })

  override def nullable: Boolean = left.nullable

  override protected def nullSafeEval(a: Any, s: Any): Any =
    ArrayQuantizeImpl.compute(a.asInstanceOf[ArrayData], s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => s"""
      |${ev.value} = graft.functions.ArrayQuantizeImpl.compute($a, ${scale}D);
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayQuantize =
    copy(left = newLeft, right = newRight)
}

object ArrayQuantize {
  def array_quantize(vec: Column, scale: Double): Column =
    shims.columnOf(ArrayQuantize(
      shims.expressionOf(vec.cast("array<double>")),
      Literal(scale)))
}
