package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based dependence and trend statistics, all exact-integer and
  * oracle-portable — the robust complements of the Pearson matrix in
  * [[Correlation]]: monotone association without distribution
  * assumptions (Spearman, Kendall), and the standard nonparametric
  * trend battery (Mann–Kendall S, Theil–Sen slope) every
  * drift-monitoring pipeline runs over per-slice daily series.
  *
  * Scale discipline: [[spearman]] ranks raw rows but only inside each
  * group's partition (two group-bounded window sorts — for a global
  * single series, pre-aggregate first); [[kendallTauA]] and
  * [[mannKendall]] are O(n²)-pair statistics and are meant for
  * PRE-AGGREGATED series (the Auc/KsTest discipline): the 100-TB scan
  * is the upstream groupBy that reduces events to a days×groups table;
  * the pair self-join then touches only series-sized data.
  *
  * All divisions are floor-of-positive or explicitly sign-split
  * (Spark `div` truncates toward zero while DuckDB `//` floors — they
  * agree only on non-negative operands).
  */
object RankCorr {

  /** Spearman rank correlation of two numeric columns per group.
    *
    * Ranks are made DETERMINISTICALLY UNTIED by tie-breaking on
    * `keyCol` (rank over (value, key) — the convention both the engine
    * and the oracle share), so the classic untied identity is exact:
    *
    *   rho = 1 − 6·Σd² / (n·(n²−1)),   d = rank_x − rank_y
    *
    * Output per group: (grp, n, d2_sum, rho_ppm) where rho_ppm =
    * 10⁶ − (6·10⁶·Σd²) div (n(n²−1)) — the divided term is
    * non-negative so trunc-vs-floor cannot diverge. NULL for n < 2.
    * Both the numerator (6·10⁶·Σd², up to 2·10⁶·n³) and the denominator
    * (n³−n) are evaluated in DECIMAL(38,0): plain Long wraps silently
    * past n ≈ 16k rows per group while DuckDB BIGINT errors — the
    * decimal path keeps the engines identical up to n ≈ 10⁹ (ADVICE r8).
    */
  def spearman(df: DataFrame, grpCol: String, xCol: String,
      yCol: String, keyCol: String): DataFrame = {
    val base = df.select(col(grpCol).as("grp"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
      col(keyCol).as("k"))
      .where(col("x").isNotNull && col("y").isNotNull)
    val wx = Window.partitionBy("grp").orderBy(col("x"), col("k"))
    val wy = Window.partitionBy("grp").orderBy(col("y"), col("k"))
    base.withColumn("rx", row_number().over(wx).cast("long"))
      .withColumn("ry", row_number().over(wy).cast("long"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum((col("rx") - col("ry")) * (col("rx") - col("ry")))
          .as("d2_sum"))
      .withColumn("rho_ppm",
        when(col("n") > 1L,
          lit(1000000L) - expr(
            """(CAST(6000000 AS DECIMAL(38,0)) * d2_sum)
              | div (CAST(n AS DECIMAL(38,0)) * n * n - n)"""
              .stripMargin))
          .otherwise(lit(null)))
  }

  /** Kendall tau-a over a per-group series (one row per `tCol` value —
    * the series index must be unique within a group).
    *
    * Every unordered index pair (i < j) is classified by the product
    * sign of (x_j−x_i)(y_j−y_i): concordant, discordant, or tied
    * (either coordinate equal). tau_a_ppm = 10⁶·(C−D) / (n(n−1)/2),
    * sign-split because C−D can be negative. NULL for n < 2.
    *
    * Output per group: (grp, n, concordant, discordant, tied,
    * tau_a_ppm).
    */
  def kendallTauA(df: DataFrame, grpCol: String, tCol: String,
      xCol: String, yCol: String): DataFrame = {
    val s = df.select(col(grpCol).as("grp"), col(tCol).cast("long").as("t"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val a = s.select(col("grp"), col("t").as("ta"), col("x").as("xa"),
      col("y").as("ya"))
    val b = s.select(col("grp").as("grp_b"), col("t").as("tb"),
      col("x").as("xb"), col("y").as("yb"))
    val prod = (col("xb") - col("xa")) * (col("yb") - col("ya"))
    a.join(b, col("grp") === col("grp_b") && col("ta") < col("tb"))
      .groupBy("grp")
      .agg(sum(when(prod > 0L, 1L).otherwise(0L)).as("concordant"),
        sum(when(prod < 0L, 1L).otherwise(0L)).as("discordant"),
        sum(when(prod === 0L, 1L).otherwise(0L)).as("tied"))
      .withColumn("n_pairs",
        col("concordant") + col("discordant") + col("tied"))
      .withColumn("tau_a_ppm",
        when(col("n_pairs") > 0L, expr(
          """CASE WHEN concordant >= discordant
            |     THEN (1000000 * (concordant - discordant)) div n_pairs
            |     ELSE 0 - ((1000000 * (discordant - concordant))
            |               div n_pairs) END""".stripMargin))
          .otherwise(lit(null)))
      .select("grp", "n_pairs", "concordant", "discordant", "tied",
        "tau_a_ppm")
  }

  /** Mann–Kendall trend S plus the Theil–Sen slope over a per-group
    * series keyed by integer time `tCol` (unique within a group).
    *
    *   S = Σ_{i<j} sign(y_j − y_i)      (positive ⇒ rising trend)
    *
    * Theil–Sen is the median pairwise slope; each pair's slope is
    * quantized to ppm-per-time-unit with a sign-split trunc division
    * (identical shape both engines), and the LOWER median of the
    * quantized slopes is taken deterministically (order by slope, then
    * (t_i, t_j)). Output per group: (grp, n_pairs, s_stat,
    * sen_slope_ppm).
    */
  def mannKendall(df: DataFrame, grpCol: String, tCol: String,
      yCol: String): DataFrame = {
    val s = df.select(col(grpCol).as("grp"), col(tCol).cast("long").as("t"),
      col(yCol).cast("long").as("y"))
    val a = s.select(col("grp"), col("t").as("ta"), col("y").as("ya"))
    val b = s.select(col("grp").as("grp_b"), col("t").as("tb"),
      col("y").as("yb"))
    val pairs = a.join(b,
        col("grp") === col("grp_b") && col("ta") < col("tb"))
      .withColumn("dy", col("yb") - col("ya"))
      .withColumn("dt", col("tb") - col("ta"))
      .withColumn("slope_ppm", expr(
        """CASE WHEN dy >= 0 THEN (1000000 * dy) div dt
          |     ELSE 0 - ((1000000 * (0 - dy)) div dt) END""".stripMargin))
    val w = Window.partitionBy("grp")
      .orderBy(col("slope_ppm"), col("ta"), col("tb"))
    pairs
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("np",
        count(lit(1)).over(Window.partitionBy("grp")))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_pairs"),
        sum(signum(col("dy")).cast("long")).as("s_stat"),
        max(when(col("rn") === expr("(np + 1) div 2"),
          col("slope_ppm"))).as("sen_slope_ppm"))
  }
}
