package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-side plan-audit helper: dump a driver query's executed plan.
  * Usage: runMain graft.tools.PlanScratch <queryName> [sfDir]
  * (The plan-shape assertions that must not regress live in
  * PlanGuardSpec; this main is for interactive .explain iteration.)
  */
object PlanScratch {
  def main(a: Array[String]): Unit = {
    val name = if (a.nonEmpty) a(0) else "q1_agg"
    val sf = if (a.length > 1) a(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sf)
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
