package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the second classic event-analytics question next to
  * the funnel: group users by the period of their FIRST event (the
  * cohort), then count how many are active again k periods later. Output
  * is the retention matrix (cohort_start_us, k, n_users), the input of
  * every retention curve/heatmap.
  *
  * Time arithmetic is integer µs: cohort = ts floored to `periodUs`
  * (epoch-aligned, matching [[Sessionize.tumbling]]), k = (period(ts) -
  * cohort) / periodUs — exact in any engine, so the driver query gets a
  * hash-exact DuckDB oracle.
  *
  * Plan shape at 100 TB: one user-keyed aggregation for the cohort table
  * (min is partial-aggregated map-side), one user-keyed equi-join of the
  * event stream against it (broadcastable while the USER dimension fits,
  * shuffle join beyond), a distinct on (cohort, k, user) — partial
  * map-side dedup — and a tiny count. No windows over the full stream,
  * no driver state.
  */
object Retention {

  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      periodUs: Long): DataFrame = {
    require(periodUs > 0, s"period must be positive, got $periodUs")
    val period = (c: org.apache.spark.sql.Column) => c - pmod(c, lit(periodUs))
    val cohorts = events.groupBy(col(userCol))
      .agg(period(min(col(tsCol))).as("cohort_start_us"))
    events.select(col(userCol), period(col(tsCol)).as("__p"))
      .join(cohorts, Seq(userCol))
      .select(col("cohort_start_us"),
        expr(s"(__p - cohort_start_us) div ${periodUs}L").as("k"),
        col(userCol))
      .distinct()
      .groupBy(col("cohort_start_us"), col("k"))
      .agg(count(lit(1)).as("n_users"))
  }
}
