package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares trend — "is this metric drifting?"
  * over an event stream, the monitoring primitive behind alerting on
  * slow regressions (data-drift detection for pipeline health).
  *
  * Slope of y over x per group from integer sufficient statistics in ONE
  * aggregation pass (the [[GraphStats.degreeAssortativity]] recipe):
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *
  * x is the event time RESCALED to whole days since the global minimum
  * (keeps Σx² within long range at any SF — raw microseconds overflow by
  * 10^9), y is floor(value·10⁶) micro-units. The four sums are exact
  * longs; the final ratio is computed from their double casts identically
  * in Spark and DuckDB (`try_divide`: a group with zero x-variance —
  * all events in one day — has an undefined slope and reports NULL).
  *
  * Output: (group, n, s_x, s_y, s_xy, s_x2, slope) — slope in
  * micro-units per day.
  */
object Trend {

  def groupTrends(df: DataFrame, groupCol: String, tsUsCol: String,
      valueCol: String): DataFrame = {
    val t0 = df.agg(min(col(tsUsCol))).head().getLong(0)
    val scaled = df.select(col(groupCol).as("grp"),
      ((col(tsUsCol) - lit(t0)) .cast("long") / lit(86400000000L))
        .cast("long").as("x"),
      floor(col(valueCol) * lit(1000000.0)).cast("long").as("y"))
    scaled.groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("s_x"),
        sum(col("y")).as("s_y"),
        sum(col("x") * col("y")).as("s_xy"),
        sum(col("x") * col("x")).as("s_x2"))
      .withColumn("slope",
        expr("""try_divide(
            cast(n as double) * cast(s_xy as double)
              - cast(s_x as double) * cast(s_y as double),
            cast(n as double) * cast(s_x2 as double)
              - cast(s_x as double) * cast(s_x as double))"""))
  }

  /** Per-group lag-1 autocorrelation of the daily event-count series —
    * the seasonality/burstiness probe next to [[groupTrends]]'s drift
    * slope: r ≈ +1 means yesterday predicts today (momentum / weekly
    * rhythm), r ≈ −1 means alternation (batch-then-quiet ingestion).
    *
    * Day buckets with no events are SKIPPED, not zero-filled (the
    * observed-window convention of `Anomaly.rateSpikes` — zero-filling
    * would need a generated calendar spine and makes the result depend
    * on the chosen global range). Pairs are consecutive OBSERVATIONS:
    * (count at day i, count at next observed day).
    *
    * Pearson r over the pairs from exact integer sufficient sums; the
    * final coefficient is assembled in doubles with sqrt — IEEE sqrt is
    * correctly rounded in every engine, and the products feeding it are
    * exact integers cast to double, so the result is bit-reproducible
    * (the [[GraphStats.degreeAssortativity]] precedent). NULL when a
    * group has < 2 observed days or zero variance on either side.
    *
    * Shape: one (group, day) count aggregation (map-side partials), one
    * group-keyed lag window over the TINY per-day count table, one final
    * aggregation. Events shuffle once, at day grain.
    */
  def lagAutocorr(df: DataFrame, groupCol: String,
      tsUsCol: String, lag: Int = 1): DataFrame = {
    require(lag >= 1, s"lag must be >= 1, got $lag")
    val daily = df
      .select(col(groupCol).as("grp"),
        (col(tsUsCol).cast("long") / lit(86400000000L)).cast("long")
          .as("day"))
      .groupBy("grp", "day").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("day"))
    daily
      .withColumn("c_next", lead(col("c"), lag).over(w))
      .where(col("c_next").isNotNull)
      .select(col("grp"), col("c").as("x"), col("c_next").as("y"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("s_x"), sum(col("y")).as("s_y"),
        sum(col("x") * col("y")).as("s_xy"),
        sum(col("x") * col("x")).as("s_x2"),
        sum(col("y") * col("y")).as("s_y2"))
      .withColumn("r",
        expr("""try_divide(
            cast(n_pairs as double) * cast(s_xy as double)
              - cast(s_x as double) * cast(s_y as double),
            sqrt((cast(n_pairs as double) * cast(s_x2 as double)
                   - cast(s_x as double) * cast(s_x as double))
                 * (cast(n_pairs as double) * cast(s_y2 as double)
                   - cast(s_y as double) * cast(s_y as double))))"""))
  }
}
