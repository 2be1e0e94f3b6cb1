package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KNN-Shapley data valuation (Jia et al. 2019, "Efficient Task-Specific
  * Data Valuation for Nearest Neighbor Algorithms") — the closed-form
  * Shapley value of each TRAINING point for a K-NN classifier, the
  * principled "which examples are worth keeping" signal behind data
  * curation / mislabel triage. For one test point, with training points
  * ranked 1..n by distance:
  *
  *   s_n = eq_n / n,   s_j = s_{j+1} + (eq_j − eq_{j+1}) / max(K, j)
  *
  * (eq_j = 1 if train label matches the test label). The QUANTIZED
  * variant floors each term to ppm independently (sign-split division),
  * so s_j becomes an exact suffix SUM both engines replay bit for bit —
  * term-wise flooring, not floored-recurrence, keeps the window
  * expressible as one cumulative sum.
  *
  * Distances are the portable ×10000 floor-quantized integer squared
  * Euclidean of [[KMeansEmbed]]; rank ties break on train id.
  *
  * Scale shape: the test set is SAMPLED (id mod `testModulus` = 0) and
  * the test×train pair join is the audit's cost — at corpus scale feed
  * the pairs from an ANN candidate generator (IVF/LSH) instead of the
  * full cross; the ranking window is per-test-point over its candidate
  * list. Output rolls up per training point: (train_id, n_tests,
  * shap_sum_ppm) — the summed value over all sampled test points.
  */
object DataValue {

  def knnShapley(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, testModulus: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(testModulus >= 2, s"testModulus must be >= 2, got $testModulus")
    val q = df.select(col(idCol).cast("long").as("id"),
      expr(s"transform($vecCol, x -> " +
        "CAST(FLOOR(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))").as("v"),
      col(labelCol).as("lab"))
    val test = q.where(pmod(col("id"), lit(testModulus)) === 0L)
      .select(col("id").as("test_id"), col("v").as("tv"),
        col("lab").as("tlab"))
    val train = q.where(pmod(col("id"), lit(testModulus)) =!= 0L)
      .select(col("id").as("train_id"), col("v").as("rv"),
        col("lab").as("rlab"))
    val pairs = broadcast(test).join(train)
      .select(col("test_id"), col("train_id"),
        expr("aggregate(zip_with(tv, rv, (x, y) -> (x - y) * (x - y)), " +
          "0L, (acc, d) -> acc + d)").as("dist"),
        when(col("tlab") === col("rlab"), 1L).otherwise(0L).as("eq"))
    val byRank = Window.partitionBy(col("test_id"))
      .orderBy(col("dist"), col("train_id"))
    val ranked = pairs
      .withColumn("j", row_number().over(byRank).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("test_id"))))
      .withColumn("eq_next", lead(col("eq"), 1).over(byRank))
    val deltas = ranked.withColumn("delta", expr(
      s"""CASE WHEN j = n THEN (1000000 * eq) div n
         |     WHEN eq >= eq_next
         |     THEN (1000000 * (eq - eq_next)) div GREATEST($k, j)
         |     ELSE 0 - ((1000000 * (eq_next - eq)) div GREATEST($k, j))
         |END""".stripMargin))
    val suffix = Window.partitionBy(col("test_id")).orderBy(col("j").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("shap_ppm", sum(col("delta")).over(suffix))
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_tests"),
        sum(col("shap_ppm")).as("shap_sum_ppm"))
  }
}
