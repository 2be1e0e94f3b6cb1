package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Series-shape statistics over keyed count series — the "what does
  * this curve DO" battery next to [[Trend]]'s drift and
  * [[Changepoint]]'s level shifts. Both operators run on the
  * PRE-AGGREGATED (group, bucket, count) series (the standing series
  * discipline: the corpus scan is the caller's one groupBy; windows
  * here are group-bounded over series-sized data).
  *
  * [[maxDrawdown]] — the worst peak-to-trough collapse: dd_i =
  * runmax_{j≤i}(c_j) − c_i, reported at its EARLIEST argmax with the
  * peak value alongside. The standard "how bad did it get" resilience
  * number for any monitored rate.
  *
  * [[bestMotif]] — matrix-profile-lite motif discovery: the closest
  * pair of non-overlapping length-L subsequences (by exact integer
  * squared distance over OBSERVED-series positions; |i−j| ≥ L is the
  * standard exclusion zone). A repeated low-distance motif is a
  * recurring operational pattern; distance 0 is an exact repeat. The
  * O(n²) subsequence pair join is series-sized, never data-sized.
  */
object SeriesShape {

  /** Per-bucket running-drawdown rows — the un-aggregated form of
    * [[maxDrawdown]] and the exact row contract
    * [[graft.streaming.StreamDrawdown]] emits incrementally:
    * (grp, bucket, c, runmax, dd) with runmax the prefix max and
    * dd = runmax − c. */
  def runningDrawdown(series: DataFrame, grpCol: String, bucketCol: String,
      cntCol: String): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series.select(col(grpCol).as("grp"),
        col(bucketCol).cast("long").as("bucket"),
        col(cntCol).cast("long").as("c"))
      .withColumn("runmax", max(col("c")).over(w))
      .withColumn("dd", col("runmax") - col("c"))
  }

  /** Output: (grp, n_buckets, peak_c, trough_c, max_drawdown, dd_bucket)
    * — dd_bucket the earliest bucket attaining the max drawdown; peak_c
    * the running max at that bucket. */
  def maxDrawdown(series: DataFrame, grpCol: String, bucketCol: String,
      cntCol: String): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series.select(col(grpCol).as("grp"),
        col(bucketCol).cast("long").as("bucket"),
        col(cntCol).cast("long").as("c"))
      .withColumn("runmax", max(col("c")).over(w))
      .withColumn("dd", col("runmax") - col("c"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_buckets"),
        // earliest argmax: lexicographic min over (-dd, bucket)
        min(struct((-col("dd")).as("nd"), col("bucket").as("b"),
          col("runmax").as("p"), col("c").as("t"))).as("w"))
      .select(col("grp"), col("n_buckets"), col("w.p").as("peak_c"),
        col("w.t").as("trough_c"), (-col("w.nd")).as("max_drawdown"),
        col("w.b").as("dd_bucket"))
  }

  /** Output: (grp, n_positions, i, j, dist_sq) — the minimal-distance
    * non-overlapping subsequence pair (ties broken by (i, j)); i/j are
    * 1-based OBSERVED-series positions. Groups with fewer than 2L
    * buckets emit nothing. */
  def bestMotif(series: DataFrame, grpCol: String, bucketCol: String,
      cntCol: String, motifLen: Int): DataFrame = {
    require(motifLen >= 2 && motifLen <= 16,
      s"motifLen must be in [2, 16], got $motifLen")
    val byB = Window.partitionBy(col("grp")).orderBy(col("bucket"))
    val base = series.select(col(grpCol).as("grp"),
        col(bucketCol).cast("long").as("bucket"),
        col(cntCol).cast("long").as("c"))
      .withColumn("i", row_number().over(byB).cast("long"))
    val sub = base.select(col("grp"), col("i"),
        array((0 until motifLen).map(o =>
          lead(col("c"), o).over(byB)): _*).as("v"))
      .where(!array_contains(expr("transform(v, x -> x IS NULL)"), true))
    val pairs = sub.as("a")
      .join(sub.as("b"),
        col("a.grp") === col("b.grp") &&
          col("b.i") >= col("a.i") + motifLen)
      .select(col("a.grp").as("grp"), col("a.i").as("i"),
        col("b.i").as("j"),
        expr("aggregate(zip_with(a.v, b.v, (x, y) -> (x - y) * (x - y)), " +
          "0L, (acc, d) -> acc + d)").as("dist_sq"))
    val nPos = sub.groupBy("grp").agg(count(lit(1)).as("n_positions"))
    pairs.groupBy("grp")
      .agg(min(struct(col("dist_sq"), col("i"), col("j"))).as("w"))
      .join(nPos, Seq("grp"))
      .select(col("grp"), col("n_positions"), col("w.i").as("i"),
        col("w.j").as("j"), col("w.dist_sq").as("dist_sq"))
  }

  /** Matrix-profile discord — the anomaly dual of [[bestMotif]]: the
    * subsequence whose NEAREST non-overlapping neighbor is FARTHEST
    * (max_i min_j dist², same |i−j| ≥ L exclusion zone, both directions
    * of the pair join). The discord is the series' most unusual shape —
    * the window nothing else resembles. Ties break to the earliest i.
    *
    * Output: (grp, n_positions, i, nn_dist_sq) — positions lacking any
    * valid neighbor (series shorter than 2L) emit nothing.
    */
  def topDiscord(series: DataFrame, grpCol: String, bucketCol: String,
      cntCol: String, motifLen: Int): DataFrame = {
    require(motifLen >= 2 && motifLen <= 16,
      s"motifLen must be in [2, 16], got $motifLen")
    val byB = Window.partitionBy(col("grp")).orderBy(col("bucket"))
    val base = series.select(col(grpCol).as("grp"),
        col(bucketCol).cast("long").as("bucket"),
        col(cntCol).cast("long").as("c"))
      .withColumn("i", row_number().over(byB).cast("long"))
    val sub = base.select(col("grp"), col("i"),
        array((0 until motifLen).map(o =>
          lead(col("c"), o).over(byB)): _*).as("v"))
      .where(!array_contains(expr("transform(v, x -> x IS NULL)"), true))
    val nn = sub.as("a")
      .join(sub.as("b"),
        col("a.grp") === col("b.grp") &&
          abs(col("b.i") - col("a.i")) >= motifLen)
      .select(col("a.grp").as("grp"), col("a.i").as("i"),
        expr("aggregate(zip_with(a.v, b.v, (x, y) -> (x - y) * (x - y)), " +
          "0L, (acc, d) -> acc + d)").as("dist_sq"))
      .groupBy("grp", "i").agg(min(col("dist_sq")).as("nn_dist_sq"))
    val nPos = sub.groupBy("grp").agg(count(lit(1)).as("n_positions"))
    nn.groupBy("grp")
      .agg(min(struct((-col("nn_dist_sq")).as("nd"), col("i").as("pi")))
        .as("w"))
      .join(nPos, Seq("grp"))
      .select(col("grp"), col("n_positions"), col("w.pi").as("i"),
        (-col("w.nd")).as("nn_dist_sq"))
  }

  /** Longest consecutive-bucket activity streak per key — the classic
    * gaps-and-islands pattern (bucket − row_number is constant inside a
    * run of consecutive buckets), the engagement metric behind "day
    * streaks". Per key: distinct active buckets, the longest island,
    * and the earliest bucket starting a longest island (deterministic
    * tie).
    *
    * One distinct + a key-bounded window + two aggregates — the island
    * key is derived, never iterated. Output: (key, n_active,
    * longest_streak, streak_start).
    */
  def longestStreak(df: DataFrame, keyCol: String,
      bucketCol: String): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
    df.select(col(keyCol).as("key"),
        col(bucketCol).cast("long").as("bucket"))
      .where(col("bucket").isNotNull)
      .distinct()
      .withColumn("island",
        col("bucket") - row_number().over(w).cast("long"))
      .groupBy("key", "island")
      .agg(count(lit(1)).as("len"), min(col("bucket")).as("start"))
      .groupBy("key")
      .agg(sum(col("len")).as("n_active"),
        min(struct((-col("len")).as("nl"), col("start").as("s"))).as("w"))
      .select(col("key"), col("n_active"),
        (-col("w.nl")).as("longest_streak"),
        col("w.s").as("streak_start"))
  }
}
