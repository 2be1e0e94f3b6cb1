package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table source/sink helpers: the co-located-join building block
  * for the 100 TB posture. Writing both join sides bucketed by the join
  * key (same bucket count) lets Spark's planner join them with NO shuffle
  * exchange on either side — the saving that matters when lineitem is
  * tens of terabytes and every analytic query joins it on the same keys.
  *
  * Bucketing requires `saveAsTable` (a metastore entry); plain
  * `.parquet(path)` writes ignore bucket specs silently.
  */
object BucketedTables {

  /** Write `df` as a bucketed managed table (overwriting). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts the physical plan contains no Exchange on either side —
    * assert via [[shuffleExchangeCount]] in tests.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Number of shuffle exchanges planned for `df` (pre-AQE initial
    * physical plan — bucketing removes the Exchange at planning time, so
    * the initial tree is the right thing to assert on).
    */
  def shuffleExchangeCount(df: DataFrame): Int = {
    val top = df.queryExecution.executedPlan
    val plan = top match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
  }
}
