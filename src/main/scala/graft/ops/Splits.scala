package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-fraction stratified train/test splitting. Pure rate-hash
  * splitting ([[Mixture]] / q_sample) gives each stratum only its
  * EXPECTED fraction — small strata can land 70/30 on an 80/20 request.
  * Here every stratum gets exactly floor(trainNum/trainDen · n) train
  * rows: rank rows inside each stratum by the md5 identity hash (a fixed
  * pseudo-random permutation, so the split is uniform AND replayable),
  * then cut at the exact count.
  *
  * One window shuffle keyed by the stratum (rank + stratum size from the
  * same partitioning — Spark computes both windows in one exchange).
  * Hash ranking means adding rows later RESHUFFLES assignments — this is
  * the "freeze a split for an experiment" primitive, not an incremental
  * one; for append-stable assignment use the rate-hash sampler instead.
  */
object Splits {

  /** @param trainNum/trainDen exact train fraction (e.g. 4/5 = 80%)
    * @return input plus a `split` column ('train' / 'test') */
  def stratifiedSplit(df: DataFrame, idCol: String, strataCols: Seq[String],
      trainNum: Int, trainDen: Int, salt: String = "split"): DataFrame = {
    require(trainNum >= 0 && trainDen > 0 && trainNum <= trainDen,
      s"need 0 <= trainNum <= trainDen, got $trainNum/$trainDen")
    val h = graft.functions.functions.hex_to_long(
      substring(md5(concat(lit(salt), col(idCol))), 1, 15))
    val w = Window.partitionBy(strataCols.map(col): _*)
    val ranked = df
      .withColumn("__rn", row_number().over(w.orderBy(h, col(idCol))))
      .withColumn("__n", count(lit(1)).over(w))
    ranked.withColumn("split",
        when(col("__rn") * trainDen <= col("__n") * trainNum, "train")
          .otherwise("test"))
      .drop("__rn", "__n")
  }
}
