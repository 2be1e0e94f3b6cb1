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
  /** Day-over-day top-k churn — "did the leaderboard change": per
    * period, the top-k items by count ((count desc, item asc), the
    * k-slot [[graft.functions.TopKByAgg]] string aggregate — no window
    * sort), then the Jaccard overlap between each period's set and the
    * NEXT period's, in exact permille. A stable pipeline hovers near
    * 1000; a sudden drop is the drift alarm that per-item counts bury.
    *
    * Scale shape: one (period, item) partial-aggregated count, a
    * period-keyed k-slot aggregate (≤ k strings per period cross the
    * final shuffle), and a (period, item)-keyed self-join of the
    * EXPLODED top-k table (≤ k rows per period) — period-dimension
    * output.
    *
    * Output: (period, next_period, k_a, k_b, n_common, jaccard_permille)
    * for every period with a successor present in the data.
    */
  def topKChurn(df: DataFrame, periodCol: String, itemCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val counts = df.select(col(periodCol).cast("long").as("period"),
        col(itemCol).cast("string").as("item"))
      .where(col("period").isNotNull && col("item").isNotNull)
      .groupBy("period", "item").agg(count(lit(1)).as("n"))
    val tops = counts.groupBy("period")
      .agg(graft.functions.TopKByAgg.top_k_by_str(
        col("n").cast("double"), col("item"), k).as("__top"))
      .select(col("period"), explode(col("__top")).as("t"))
      .select(col("period"), col("t.payload").as("item"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = tops.groupBy("period").agg(count(lit(1)).as("k_n"))
    val common = tops.as("a")
      .join(tops.as("b"),
        col("b.period") === col("a.period") + 1L &&
          col("b.item") === col("a.item"))
      .groupBy(col("a.period").as("period"))
      .agg(count(lit(1)).as("n_common"))
    sizes.as("sa")
      .join(sizes.as("sb"), col("sb.period") === col("sa.period") + 1L)
      .select(col("sa.period").as("period"),
        col("sb.period").as("next_period"),
        col("sa.k_n").as("k_a"), col("sb.k_n").as("k_b"))
      .join(common, Seq("period"), "left")
      .select(col("period"), col("next_period"), col("k_a"), col("k_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        expr("""(1000 * coalesce(n_common, 0))
               div (k_a + k_b - coalesce(n_common, 0))""")
          .as("jaccard_permille"))
  }

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

  /** Fano factor (index of dispersion) of the daily count series per
    * group — the burstiness number next to [[lagAutocorr]]'s memory and
    * [[Changepoint]]'s level shifts: 1 for a Poisson-steady arrival
    * process, >1 for bursty traffic, <1 for a throttled/regular one.
    *
    * F = var/mean stays exact by cross-multiplying the divisions away:
    * with S = Σc and Q = Σc² over n daily buckets,
    *
    *   fano_ppm = 10⁶·(n·Q − S²) div (n·S)
    *
    * (var = (n·Q−S²)/n², mean = S/n; both numerator and denominator are
    * non-negative so trunc-vs-floor division cannot diverge). Groups
    * with an empty series (S = 0) report NULL.
    *
    * Scale shape: one groupBy over the raw scan to (group, day) counts,
    * then a group-sized rollup — no windows, no joins.
    *
    * Output: (grp, n_days, total, sum_sq, fano_ppm).
    */
  /** Seasonal-naive forecast-error ratio (MASE-style) per group — "does
    * last week predict today better than yesterday does?": over each
    * group's OBSERVED daily count series,
    *
    *   mase_ppm = 10⁶ · (SAE_season / n_season) / (SAE_1 / n_1)
    *            = (10⁶ · SAE_season · n_1) div (SAE_1 · n_season)
    *
    * with SAE_k = Σ|y_t − y_{t−k}| over rows where the lag exists
    * (observed-series lags — gap-skipping, like every series op here).
    * < 10⁶ means the seasonal-naive beats the step-naive ⇒ real weekly
    * seasonality; NULL when either error side is empty or SAE_1 = 0.
    * The two lags come from the same group-bounded window pass.
    *
    * Output: (grp, n_1, sae_1, n_season, sae_season, mase_ppm).
    */
  def seasonalNaiveError(df: DataFrame, groupCol: String,
      tsUsCol: String, season: Int = 7): DataFrame = {
    require(season >= 2, s"season must be >= 2, got $season")
    val daily = df
      .select(col(groupCol).as("grp"),
        (col(tsUsCol).cast("long") / lit(86400000000L)).cast("long")
          .as("day"))
      .groupBy("grp", "day").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("day"))
    daily
      .withColumn("l1", lag(col("c"), 1).over(w))
      .withColumn("ls", lag(col("c"), season).over(w))
      .groupBy("grp")
      .agg(count(col("l1")).as("n_1"),
        sum(abs(col("c") - col("l1"))).as("sae_1"),
        count(col("ls")).as("n_season"),
        sum(abs(col("c") - col("ls"))).as("sae_season"))
      .withColumn("mase_ppm",
        when(col("n_1") > 0L && col("n_season") > 0L && col("sae_1") > 0L,
          expr("(1000000 * sae_season * n_1) div (sae_1 * n_season)"))
          .otherwise(lit(null)))
  }

  def fanoFactor(df: DataFrame, groupCol: String,
      tsUsCol: String): DataFrame = {
    df.select(col(groupCol).as("grp"),
        (col(tsUsCol).cast("long") / lit(86400000000L)).cast("long")
          .as("day"))
      .groupBy("grp", "day").agg(count(lit(1)).as("c"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("total"),
        sum(col("c") * col("c")).as("sum_sq"))
      .withColumn("fano_ppm",
        when(col("total") > 0L, expr(
          "(1000000 * (n_days * sum_sq - total * total)) div (n_days * total)"))
          .otherwise(lit(null)))
  }
}
