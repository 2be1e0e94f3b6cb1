package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benford first-digit audit — the classic forensic data-quality probe:
  * organically-grown positive quantities (prices, populations, file
  * sizes) have first significant digits distributed as
  * log10(1 + 1/d), while fabricated, truncated, or default-filled
  * columns show flat or spiked digit histograms. One scan answers "does
  * this column look like real data?".
  *
  * Everything is exact-integer and oracle-portable: the first digit of
  * a positive long is the first character of its decimal string (no
  * log10/pow anywhere), the expected frequencies are the nine LITERAL
  * ppm constants floor(10⁶·log10(1+1/d)) baked identically into engine
  * and oracle, observed shares are floored ppm, and the deviation is
  * their signed difference. Digits with zero observations still get a
  * row (expected ppm is a property of the digit, not the data), so the
  * output is always exactly 9 rows.
  *
  * Scale shape: one hash aggregate over the raw scan to 9 digit rows +
  * a broadcast of the 1-row total — nothing data-sized survives the
  * first shuffle.
  *
  * Output: (digit, n_obs, obs_ppm, exp_ppm, dev_ppm) for digit 1..9.
  */
object Benford {

  /** CASE expression both engines share verbatim — floor ppm of
    * log10(1 + 1/digit), the Benford expectation. */
  val expectedPpmCase: String =
    """CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
      |  WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
      |  WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
      |  ELSE 45757 END""".stripMargin

  def firstDigitAudit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val obs = df
      .select(col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull && col("v") > 0L)
      .select(substring(col("v").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val digits = (1 to 9).toDF("digit")
    // ONE reference to obs: a 1-row pack carries BOTH the global total
    // and the 9-entry digit histogram — a second aggregate over obs would
    // re-derive its subtree and scan the input twice (plan-guarded
    // single-scan), and a window (even over the 9-row dimension) would be
    // an unpartitioned WindowExec (repo-wide sweep, VERDICT r8 item 1)
    val packed = obs.agg(
      coalesce(sum(col("n_obs")), lit(0L)).as("n_total"),
      collect_list(struct(col("digit"), col("n_obs"))).as("arr"))
    digits.crossJoin(broadcast(packed))
      .withColumn("n_obs",
        coalesce(expr("try_element_at(map_from_entries(arr), digit)"),
          lit(0L)))
      .withColumn("obs_ppm",
        when(col("n_total") > 0L, expr("(1000000 * n_obs) div n_total"))
          .otherwise(lit(0L)))
      .withColumn("exp_ppm", expr(expectedPpmCase))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .select("digit", "n_obs", "obs_ppm", "exp_ppm", "dev_ppm")
  }
}
