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
}
