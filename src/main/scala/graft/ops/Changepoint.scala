package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM changepoint detection — where did a keyed rate SHIFT? For each
  * group's ordered count series c_1..c_n the classic cumulative-sum
  * drift against the series mean is
  *
  *     S_i = Σ_{j≤i} (c_j − mean)
  *
  * and the changepoint estimate is the bucket maximizing |S_i|. Scaling
  * by n removes the division: n·S_i = n·prefix_i − i·total is EXACT in
  * integers, the argmax is unchanged, and the DuckDB oracle replays it
  * bit for bit. Ties break to the EARLIEST bucket (first time the
  * maximal drift is reached).
  *
  * Scale contract: the input must already be an AGGREGATED series —
  * (group, ordered bucket, count) — so the windows here run over a
  * dimension-sized frame (groups × buckets), never over raw rows; the
  * raw-data pass is the caller's one scalable groupBy. |n·S_i| ≤ n·total
  * bounds the arithmetic: keep buckets·total below ~9·10¹⁸ per group
  * (a 10⁵-bucket series with 10¹³ total events overflows before the
  * data does).
  */
object Changepoint {

  /** (grp, n_buckets, total, cp_bucket, cusum_max_scaled, dir_sign):
    * the bucket after which the pre/post mean split is widest, the
    * scaled |n·S| there, and the drift direction (+1 = series ran
    * above its mean into the changepoint, −1 = below).
    */
  def cusumMaxShift(series: DataFrame, grpCol: String, bucketCol: String,
      cntCol: String): DataFrame = {
    val ordered = Window.partitionBy(col("grp")).orderBy(col("bucket"))
    val base = series.select(col(grpCol).as("grp"),
        col(bucketCol).cast("long").as("bucket"),
        col(cntCol).cast("long").as("cnt"))
      .withColumn("i", row_number().over(ordered))
      .withColumn("prefix", sum(col("cnt")).over(ordered))
    val stats = base.groupBy("grp")
      .agg(count(lit(1)).as("n_buckets"), sum(col("cnt")).as("total"))
    val dev = base
      .join(stats, Seq("grp"))
      .withColumn("dev",
        col("n_buckets") * col("prefix") - col("i") * col("total"))
      .withColumn("absdev", abs(col("dev")))
    // earliest-max argmax via one min-struct aggregate: lexicographic
    // (−absdev, bucket) puts the largest drift first, earliest bucket
    // breaking ties — no second window pass
    dev.groupBy("grp")
      .agg(max(col("n_buckets")).as("n_buckets"),
        max(col("total")).as("total"),
        min(struct((-col("absdev")).as("na"), col("bucket").as("b"),
          col("dev").as("d"))).as("w"))
      .select(col("grp"), col("n_buckets"), col("total"),
        col("w.b").as("cp_bucket"),
        (-col("w.na")).as("cusum_max_scaled"),
        when(col("w.d") >= 0L, lit(1L)).otherwise(lit(-1L)).as("dir_sign"))
  }

  /** Page–Hinkley sequential changepoint test per key — the ONLINE
    * complement of [[cusumMaxShift]]'s retrospective split: drift is
    * accumulated against a TRAINED per-key reference rate (the
    * train-batch/score-stream discipline of
    * [[graft.streaming.StreamTargetEncode]]), so each window's verdict
    * depends only on the past and [[graft.streaming.StreamChangepoint]]
    * can emit the identical rows incrementally.
    *
    * Over each key's OBSERVED tumbling windows (zero-event windows are
    * skipped — gap-skipping like [[Anomaly.rateSpikes]]) in ws order:
    *
    *   dev_i      = n_i·10⁶ − mu_ppm          (exact integer ppm)
    *   S_i        = Σ_{j≤i} dev_j
    *   drift_up   = S_i − min_{j≤i} S_j       (rate shifted UP)
    *   drift_down = max_{j≤i} S_j − S_i       (rate shifted DOWN)
    *   alarm      = max(drift)·10 > lambdaWindowTenths·mu_ppm
    *
    * The threshold is RELATIVE — lambdaWindowTenths tenths of the key's
    * own reference window rate — so one setting is meaningful for a
    * 10²- and a 10⁸-events/window key alike (an absolute ppm lambda
    * degenerates at corpus scale). Exact integers via
    * cross-multiplication.
    *
    * `baseline` is a (key, mu_ppm) table — mean events per window in
    * ppm; keys without a baseline are dropped (inner join), matching
    * the stream's behavior. Window sorts run per key over the
    * AGGREGATED (key × window) series.
    *
    * Output: (key, window_start_us, n, s_ppm, drift_up_ppm,
    * drift_down_ppm, alarm).
    */
  def pageHinkley(df: DataFrame, keyCol: String, tsUsCol: String,
      windowUs: Long, baseline: DataFrame,
      lambdaWindowTenths: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(lambdaWindowTenths > 0,
      s"lambdaWindowTenths must be positive, got $lambdaWindowTenths")
    val counts = df.select(col(keyCol).as("key"),
        (col(tsUsCol).cast("long")
          - pmod(col(tsUsCol).cast("long"), lit(windowUs)))
          .as("window_start_us"))
      .groupBy("key", "window_start_us").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("key")).orderBy(col("window_start_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .join(broadcast(baseline.select(col("key"), col("mu_ppm"))), Seq("key"))
      .withColumn("dev", col("n") * lit(1000000L) - col("mu_ppm"))
      .withColumn("s_ppm", sum(col("dev")).over(w))
      .withColumn("drift_up_ppm", col("s_ppm") - min(col("s_ppm")).over(w))
      .withColumn("drift_down_ppm", max(col("s_ppm")).over(w) - col("s_ppm"))
      .withColumn("alarm",
        greatest(col("drift_up_ppm"), col("drift_down_ppm")) * 10L
          > lit(lambdaWindowTenths) * col("mu_ppm"))
      .select("key", "window_start_us", "n", "s_ppm", "drift_up_ppm",
        "drift_down_ppm", "alarm")
  }
}
