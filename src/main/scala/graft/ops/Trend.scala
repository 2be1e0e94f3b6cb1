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
}
