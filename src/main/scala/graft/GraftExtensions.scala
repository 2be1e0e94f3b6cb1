package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's native Catalyst
  * functions available in any session via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`), so plain
  * SQL users get them without touching the Scala API.
  *
  * Also injects the [[graft.plans.AsOfJoinStrategy]] planner strategy so
  * sessions built with the extensions plan graft's native as-of join
  * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]]) without
  * the API-level auto-registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("token_fingerprint"),
      new ExpressionInfo(
        classOf[graft.functions.TokenFingerprint].getName, "token_fingerprint"),
      (exprs: Seq[Expression]) => graft.functions.functions.buildTokenFingerprint(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[graft.functions.ArrayDot].getName, "array_dot"),
      (exprs: Seq[Expression]) => graft.functions.functions.buildArrayDot(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("array_quantize"),
      new ExpressionInfo(
        classOf[graft.functions.ArrayQuantize].getName, "array_quantize"),
      (exprs: Seq[Expression]) => graft.functions.functions.buildArrayQuantize(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("hex_to_long"),
      new ExpressionInfo(classOf[graft.functions.HexToLong].getName, "hex_to_long"),
      (exprs: Seq[Expression]) => graft.functions.functions.buildHexToLong(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("hll_registers"),
      new ExpressionInfo(
        classOf[graft.functions.HllRegistersAgg].getName, "hll_registers"),
      (exprs: Seq[Expression]) => graft.functions.functions.buildHllRegisters(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("bit_votes"),
      new ExpressionInfo(classOf[graft.functions.BitVoteAgg].getName, "bit_votes"),
      (exprs: Seq[Expression]) => graft.functions.functions.buildBitVotes(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[graft.functions.TopKByAgg].getName, "top_k_by"),
      (exprs: Seq[Expression]) => graft.functions.functions.buildTopKBy(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("top_k_by_str"),
      new ExpressionInfo(classOf[graft.functions.TopKStrAgg].getName, "top_k_by_str"),
      (exprs: Seq[Expression]) => graft.functions.functions.buildTopKByStr(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("quantile_sample"),
      new ExpressionInfo(
        classOf[graft.functions.QuantileSampleAgg].getName, "quantile_sample"),
      (exprs: Seq[Expression]) => graft.functions.functions.buildQuantileSample(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(
        classOf[graft.functions.KmvSetAgg].getName, "kmv_sketch"),
      (exprs: Seq[Expression]) => graft.functions.functions.buildKmvSketch(exprs)))
  }
}
