package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decision-stump split finding — the supervised cousin of the quality
  * heuristics: for every integer feature, the threshold that best
  * separates a binary label by weighted Gini impurity. This is the inner
  * loop of tree induction and THE quick audit for "which cheap feature
  * predicts quality/language best" before anyone trains a model.
  *
  * All-integer: for a candidate split at value v (left = rows with
  * feature ≤ v), the weighted Gini
  *
  *   G = t_l/T·(1 − (p_l²+n_l²)/t_l²) + t_r/T·(1 − (p_r²+n_r²)/t_r²)
  *
  * is scored as exact ppm via per-side floor division
  *
  *   score_ppm = ((t_l²−p_l²−n_l²)·1_000_000) div (t_l·T)
  *             + ((t_r²−p_r²−n_r²)·1_000_000) div (t_r·T)
  *
  * — identical arithmetic in any engine (exact while T ≤ ~3·10⁶ per
  * feature; larger corpora should pre-bucket values or drop to permille).
  * Ties break to the SMALLEST split value.
  *
  * Scale shape: one (feature, value)-keyed partial-aggregating count, a
  * cumulative window over the AGGREGATED table (value-cardinality-sized,
  * not data-sized — pre-bucket continuous features to bound it), and a
  * per-feature argmin. No data-sized window, no driver state.
  *
  * Output: one row per feature —
  * (feature, split_value, score_ppm, t_left, p_left, t_right, p_right).
  */
object DecisionStump {

  def bestSplits(df: DataFrame, featureCol: String, valueCol: String,
      labelCol: String): DataFrame = {
    val g = df.select(col(featureCol).cast("string").as("feature"),
        col(valueCol).cast("long").as("value"),
        col(labelCol).cast("long").as("lab"))
      .where(col("feature").isNotNull && col("value").isNotNull &&
        col("lab").isNotNull)
      .groupBy("feature", "value")
      .agg(count(lit(1)).as("t"), sum(col("lab")).as("p"))
    val w = Window.partitionBy("feature").orderBy("value")
    val cum = g.select(col("feature"), col("value"),
      sum(col("t")).over(w).as("tl"), sum(col("p")).over(w).as("pl"))
    val tot = g.groupBy("feature")
      .agg(sum(col("t")).as("tt"), sum(col("p")).as("pp"))
    val scored = cum.join(tot, Seq("feature"))
      .where(col("tt") - col("tl") > 0L) // right side must be non-empty
      .select(col("feature"), col("value"), col("tl"), col("pl"),
        (col("tt") - col("tl")).as("tr"), (col("pp") - col("pl")).as("pr"),
        col("tt"))
      .withColumn("nl", col("tl") - col("pl"))
      .withColumn("nr", col("tr") - col("pr"))
      .withColumn("score_ppm",
        expr("""((tl * tl - pl * pl - nl * nl) * 1000000) div (tl * tt)
               + ((tr * tr - pr * pr - nr * nr) * 1000000) div (tr * tt)"""))
    scored.groupBy("feature")
      .agg(min(struct(col("score_ppm"), col("value"), col("tl"), col("pl"),
        col("tr"), col("pr"))).as("b"))
      .select(col("feature"), col("b.value").as("split_value"),
        col("b.score_ppm").as("score_ppm"), col("b.tl").as("t_left"),
        col("b.pl").as("p_left"), col("b.tr").as("t_right"),
        col("b.pr").as("p_right"))
  }
}
