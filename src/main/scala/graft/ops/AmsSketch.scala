package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.functions.hex_to_long

/** AMS (Alon–Matias–Szegedy) F₂ sketch — the second frequency moment
  * Σ f_k² of a key stream estimated in O(lanes) space: each lane
  * assigns every key a ±1 sign from an independent md5 lane, keeps the
  * running signed sum Z = Σ_items sign(key), and E[Z²] = F₂ exactly.
  * F₂ is the self-join size / repeat-rate statistic — the quantity that
  * prices a shuffle join or dedup pass before running it.
  *
  * The sketch state is ONE long per lane and merges by addition, so the
  * aggregation partial-combines map-side and the shuffle carries
  * `lanes` rows total regardless of stream size — the same mergeable-
  * register posture as the HLL/KMV/CMS family here.
  *
  * Portability: sign(key, lane) = 1 − 2·(md5("lane#key") lane-long
  * mod 2), the shared [[graft.functions.HexToLong]] convention; the
  * DuckDB oracle reproduces every lane sum exactly, and the exact F₂
  * rides along from the same scan for an estimator-quality check.
  */
object AmsSketch {

  /** (lane, lane_sum, f2_est, f2_exact): one row per lane; f2_est is
    * the lane's Z², f2_exact the true Σ f_k² (computed once, joined to
    * every row — a second aggregate over the same scan, not a second
    * scan of the source).
    */
  def f2Lanes(df: DataFrame, keyCol: String, lanes: Int = 16): DataFrame = {
    require(lanes >= 1 && lanes <= 64, s"lanes must be in [1, 64], got $lanes")
    val keyed = keys(df, keyCol)
    val lane = laneSums(keyed, lanes)
    val exact = keyed.groupBy("k").agg(count(lit(1)).as("f"))
      .agg(sum(col("f") * col("f")).as("f2_exact"))
    lane.crossJoin(broadcast(exact))
      .select(col("lane").cast("long").as("lane"), col("lane_sum"),
        (col("lane_sum") * col("lane_sum")).as("f2_est"), col("f2_exact"))
      .orderBy("lane")
  }

  /** AMS cross-moment join-size estimation: for two key streams A and B
    * the SAME ±1 lanes give E[Z_A·Z_B] = Σ_k f_A(k)·f_B(k) — the exact
    * row count of the equi-join A ⋈ B. This prices a join from two
    * O(lanes) sketches built in separate passes (even separate jobs:
    * the lane sums are additive, shippable summaries). Output one row
    * per lane with both sums, the product estimate, and the exact join
    * size computed alongside as the quality check.
    */
  def crossMomentLanes(a: DataFrame, aKeyCol: String, b: DataFrame,
      bKeyCol: String, lanes: Int = 16): DataFrame = {
    require(lanes >= 1 && lanes <= 64, s"lanes must be in [1, 64], got $lanes")
    val ka = keys(a, aKeyCol)
    val kb = keys(b, bKeyCol)
    val za = laneSums(ka, lanes).withColumnRenamed("lane_sum", "z_a")
    val zb = laneSums(kb, lanes).withColumnRenamed("lane_sum", "z_b")
    val exact = ka.groupBy("k").agg(count(lit(1)).as("fa"))
      .join(kb.groupBy("k").agg(count(lit(1)).as("fb")), Seq("k"))
      .agg(coalesce(sum(col("fa") * col("fb")), lit(0L))
        .as("join_size_exact"))
    za.join(zb, Seq("lane"))
      .crossJoin(broadcast(exact))
      .select(col("lane").cast("long").as("lane"), col("z_a"), col("z_b"),
        (col("z_a") * col("z_b")).as("est_prod"), col("join_size_exact"))
      .orderBy("lane")
  }

  /** The bare mergeable state: per-lane signed sums. Public because it
    * is exactly what a streaming aggregation or a cross-job shipper
    * materializes — additive under union, so `complete`-mode streaming
    * output equals the batch sketch over the same rows (spec'd).
    */
  def laneSumsOf(df: DataFrame, keyCol: String, lanes: Int): DataFrame =
    laneSums(keys(df, keyCol), lanes)

  private def keys(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).cast("string").as("k")).where(col("k").isNotNull)

  /** Per-lane signed sums under the shared md5("lane#key") convention. */
  private def laneSums(keyed: DataFrame, lanes: Int): DataFrame =
    keyed.select(col("k"),
        explode(sequence(lit(0), lit(lanes - 1))).as("lane"))
      .withColumn("sign", lit(1L) - lit(2L) *
        (hex_to_long(substring(md5(concat(col("lane").cast("string"),
          lit("#"), col("k"))), 1, 15)) % 2L))
      .groupBy("lane")
      .agg(sum(col("sign")).as("lane_sum"))
}
