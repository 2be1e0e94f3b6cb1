package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Collocation mining — token pairs that co-occur in documents far more
  * often than independence predicts (the PMI/lift signal behind phrase
  * detection and vocabulary merging): for distinct-token pairs (x < y)
  * within a document,
  *
  *   lift(x, y) = P(x,y) / (P(x)·P(y)) = (n_xy · n_docs) / (n_x · n_y)
  *
  * Emitted as integer sufficient statistics (n_xy, n_x, n_y, n_docs) plus
  * the double `lift` derived from their casts — the [[GraphStats]]
  * convention: exact integers to the last step, one identically-rounded
  * IEEE expression both engines agree on (no libm log; rank by lift
  * instead of PMI = log lift, the order is the same).
  *
  * Hot-token cap: tokens with document frequency > `maxDf` are excluded
  * BEFORE pairing — stopwords would otherwise dominate the per-document
  * token self-join quadratically while carrying lift ≈ 1 (the
  * [[LinkPrediction]] hot-center pattern; candidate volume is bounded by
  * Σ min(df, maxDf)² over tokens). `minPairCount` prunes the long tail of
  * one-off pairs.
  *
  * Plan shape at 100 TB: token-keyed df aggregation, a doc-keyed
  * self-join of the df-capped (doc, token) table, pair-keyed count —
  * every shuffle partial-aggregates, nothing driver-side.
  */
object Collocations {

  def collocations(df: DataFrame, idCol: String, textCol: String,
      maxDf: Long = 1000L, minPairCount: Long = 2L): DataFrame = {
    require(maxDf >= 1, s"maxDf must be positive, got $maxDf")
    val toks = df.select(col(idCol).as("__id"),
        explode(split(col(textCol), " ")).as("tok"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // df agg + both pair sides
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .persist(StorageLevel.MEMORY_AND_DISK) // cap filter + two stat joins
    val kept = toks.join(
      dfreq.where(col("n") <= maxDf).select("tok"), Seq("tok"), "left_semi")
    val nDocs = df.select(col(idCol)).distinct().count()
    val pairs = kept.as("a")
      .join(kept.as("b"), col("a.__id") === col("b.__id")
        && col("a.tok") < col("b.tok"))
      .select(col("a.tok").as("x"), col("b.tok").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
      .where(col("n_xy") >= minPairCount)
    pairs
      .join(dfreq.select(col("tok").as("x"), col("n").as("n_x")), "x")
      .join(dfreq.select(col("tok").as("y"), col("n").as("n_y")), "y")
      .withColumn("n_docs", lit(nDocs))
      .withColumn("lift",
        (col("n_xy").cast("double") * col("n_docs").cast("double")) /
          (col("n_x").cast("double") * col("n_y").cast("double")))
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        col("n_docs"), col("lift"))
  }
}
