package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact Gini coefficient of any non-negative value column — the
  * inequality number behind "is one hub/user/source eating the graph":
  * 0 = perfectly even, →1000‰ = one row owns everything. Computed from
  * the Lorenz rank-sum identity in pure integers:
  *
  *   G = (2·Σᵢ rankᵢ·vᵢ − (n+1)·Σv) / (n·Σv)
  *
  * with ties handled exactly by value-grouping: a value v with count c
  * occupies ranks R+1..R+c, contributing v·(c·R + c(c+1)/2) — so the
  * whole statistic reduces to one (value)-keyed count plus a cumulative
  * window over the AGGREGATED value table (value-cardinality-sized, the
  * Auc/KsTest discipline) and a 1-row rollup. `gini_permille` is the
  * floored permille; the raw sums ride along for full precision.
  *
  * Output (one row): (n, total, s1_num, gini_permille).
  */
object Inequality {

  def giniExact(df: DataFrame, valueCol: String): DataFrame = {
    val g = df.select(col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull && col("v") >= 0L)
      .groupBy("v").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.withColumn("cumIncl", sum(col("c")).over(w))
      .withColumn("rBefore", col("cumIncl") - col("c"))
    cum.agg(sum(col("c")).as("n"),
        sum(col("v") * col("c")).as("total"),
        sum(col("v") * (col("c") * col("rBefore")
          + expr("(c * (c + 1)) div 2"))).as("s1"))
      .select(col("n"), col("total"),
        (lit(2L) * col("s1") - (col("n") + 1L) * col("total"))
          .as("s1_num"))
      .withColumn("gini_permille",
        when(col("n") > 0L && col("total") > 0L,
          expr("(1000 * s1_num) div (n * total)"))
          .otherwise(lit(null)))
  }

  /** Lorenz-curve points at k/nQuantiles population cuts — the curve
    * [[giniExact]] integrates: share_permille(k) = cumulative value
    * mass of the bottom m_k = (n·k) div nQuantiles units, exactly. A
    * value block straddling a cut contributes its prorated part
    * v·(m_k − units_before) — pure integers, no interpolation error.
    *
    * Same shape as giniExact: one value-keyed aggregate, one cumulative
    * window over the AGGREGATED value table, a nQuantiles-row cut join.
    * Output: (quantile, m_units, cum_value, share_permille), quantile
    * 1..nQuantiles (the last row is always (n, total, 1000)).
    */
  def lorenzPoints(df: DataFrame, valueCol: String,
      nQuantiles: Int = 10): DataFrame = {
    require(nQuantiles >= 2 && nQuantiles <= 1000,
      s"nQuantiles must be in [2, 1000], got $nQuantiles")
    val spark = df.sparkSession
    import spark.implicits._
    val g = df.select(col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull && col("v") >= 0L)
      .groupBy("v").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blocks = g
      .withColumn("cumIncl", sum(col("c")).over(w))
      .withColumn("cumVal", sum(col("v") * col("c")).over(w))
      .withColumn("cumBefore", col("cumIncl") - col("c"))
      .withColumn("valBefore", col("cumVal") - col("v") * col("c"))
    val totals = blocks.agg(max(col("cumIncl")).as("n"),
      max(col("cumVal")).as("total"))
    val cuts = (1 to nQuantiles).toDF("quantile")
      .crossJoin(broadcast(totals))
      .withColumn("m_units", expr(s"(n * quantile) div $nQuantiles"))
      .where(col("m_units") > 0L)
    cuts.join(blocks,
        col("cumBefore") < col("m_units") &&
          col("m_units") <= col("cumIncl"))
      .select(col("quantile"), col("m_units"),
        (col("valBefore") + col("v") * (col("m_units") - col("cumBefore")))
          .as("cum_value"), col("total"))
      .withColumn("share_permille",
        when(col("total") > 0L, expr("(1000 * cum_value) div total"))
          .otherwise(lit(0L)))
      .select("quantile", "m_units", "cum_value", "share_permille")
  }
}
