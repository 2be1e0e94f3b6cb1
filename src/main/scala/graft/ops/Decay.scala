package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Half-life decayed event counts — the recency-weighted activity score
  * behind trending/ranking features: each event contributes weight
  * 2^(-age) where age = whole `windowUs` periods between the event's
  * tumbling window and the GLOBAL latest observed window (the deterministic
  * "now" of a batch corpus). A half-life of one window per doubling is the
  * natural base: powers of two keep every weight an exact dyadic rational,
  * so the whole computation stays in integer arithmetic and the driver
  * query gets a hash-exact DuckDB oracle (no libm `exp`/`pow` anywhere).
  *
  *   decayed_num = Σ_windows n_w · 2^(maxAge − age_w)     (scaled by 2^maxAge)
  *   decayed_ppm = (decayed_num · 1 000 000) div 2^maxAge
  *
  * Windows older than `maxAge` half-lives are dropped (weight < 2^-maxAge
  * ≈ 1e-6 at the default 20 — a documented cutoff, and the overflow bound:
  * decayed_num ≤ total_events · 2^maxAge and the ppm multiply stays under
  * Long.MaxValue for corpora up to ~9e12 events per type at maxAge=20).
  *
  * Plan shape at 100 TB: ONE tumbling (type, window) aggregation — counts
  * partial-aggregate map-side, so the shuffled table is types × windows,
  * not events — then a 1-row global max broadcast-joined back and a tiny
  * per-type fold. Nothing driver-side; the reference time is data-derived,
  * not wall-clock, so reruns are reproducible.
  */
object Decay {

  def decayedCounts(events: DataFrame, tsCol: String, typeCol: String,
      windowUs: Long, maxAge: Int = 20): DataFrame = {
    require(maxAge >= 1 && maxAge <= 40,
      s"maxAge must be in [1, 40] (dyadic weights in Long range), got $maxAge")
    // persisted: the counts subtree feeds BOTH the decay fold and the
    // global-max reference — without it the event scan + aggregation runs
    // twice (plan audit r7). The table is types × windows, so the cache is
    // tiny however big the stream; left to LRU eviction (lazy-plan policy
    // of ConnectedComponents / Dedup).
    val counts = Sessionize.tumbling(events, tsCol, windowUs)
      .groupBy(col(typeCol), col("window_start_us"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ref = counts.agg(max(col("window_start_us")).as("ref_ws"))
    counts.crossJoin(broadcast(ref))
      .withColumn("age",
        expr(s"(ref_ws - window_start_us) div ${windowUs}L"))
      .where(col("age") <= maxAge)
      .withColumn("w_scaled",
        expr(s"shiftleft(1L, cast($maxAge - age as int))"))
      .groupBy(col(typeCol))
      .agg(
        sum(col("n")).as("n_recent"),
        sum(col("n") * col("w_scaled")).as("decayed_num"))
      .withColumn("decayed_ppm",
        expr(s"(decayed_num * 1000000) div ${1L << maxAge}L"))
  }
}
