package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction audit — distribution-free interval
  * calibration, the "how wide must error bars be" primitive of model
  * eval pipelines: fit a point predictor on the TRAIN split, take the
  * ceil((n_cal+1)·(1−α))-th smallest absolute residual on the
  * CALIBRATION split as the interval half-width q̂, then measure
  * empirical coverage |y − ŷ| ≤ q̂ on the TEST split (guaranteed
  * ≥ 1−α in expectation under exchangeability).
  *
  * Everything is exact-integer: the predictor is the floored per-group
  * train mean of an integer target, residuals are integer distances,
  * the conformal rank is ((n_cal+1)·(1000−alphaPermille) + 999) div
  * 1000 capped at n_cal, the order statistic is picked by a
  * deterministic (residual, id) rank, coverage is floored permille.
  *
  * Splits are id mod 3 (0 = train, 1 = calibration, 2 = test) — a
  * replayable partition, same convention as the md5 split family.
  *
  * Scale shape: one groupBy per split for the predictor, one
  * group-bounded window sort over the CALIBRATION slice only (the
  * smallest split at scale), one broadcast join onto test. Output per
  * group: (grp, n_train, n_cal, n_test, pred, q_hat,
  * coverage_permille).
  */
object Conformal {

  def splitConformalAudit(df: DataFrame, grpCol: String, idCol: String,
      yCol: String, alphaPermille: Long): DataFrame = {
    require(alphaPermille >= 1 && alphaPermille <= 999,
      s"alphaPermille must be in [1, 999], got $alphaPermille")
    val base = df.select(col(grpCol).as("grp"),
      col(idCol).cast("long").as("id"), col(yCol).cast("long").as("y"))
      .where(col("y").isNotNull)
      .withColumn("part", pmod(col("id"), lit(3L)))

    val pred = base.where(col("part") === 0L)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_train"), sum(col("y")).as("ysum"))
      .withColumn("pred", expr("ysum div n_train"))
      .select("grp", "n_train", "pred")

    val calW = Window.partitionBy(col("grp"))
      .orderBy(col("resid"), col("id"))
    val cal = base.where(col("part") === 1L)
      .join(broadcast(pred), Seq("grp"))
      .withColumn("resid", abs(col("y") - col("pred")))
      .withColumn("rk", row_number().over(calW).cast("long"))
      .withColumn("n_cal",
        count(lit(1)).over(Window.partitionBy(col("grp"))))
      .withColumn("target_rk", least(col("n_cal"), expr(
        s"((n_cal + 1) * (1000 - $alphaPermille) + 999) div 1000")))
      .groupBy("grp")
      .agg(max(col("n_cal")).as("n_cal"),
        max(when(col("rk") === col("target_rk"), col("resid")))
          .as("q_hat"))

    base.where(col("part") === 2L)
      .join(broadcast(pred), Seq("grp"))
      .join(broadcast(cal), Seq("grp"))
      .groupBy("grp")
      .agg(max(col("n_train")).as("n_train"),
        max(col("n_cal")).as("n_cal"),
        count(lit(1)).as("n_test"),
        max(col("pred")).as("pred"),
        max(col("q_hat")).as("q_hat"),
        sum(when(abs(col("y") - col("pred")) <= col("q_hat"), 1L)
          .otherwise(0L)).as("n_covered"))
      .withColumn("coverage_permille",
        expr("(1000 * n_covered) div n_test"))
      .select("grp", "n_train", "n_cal", "n_test", "pred", "q_hat",
        "coverage_permille")
  }
}
