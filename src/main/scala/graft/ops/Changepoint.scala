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
}
