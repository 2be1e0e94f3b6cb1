package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the three connected-components implementations on the same edge
  * set (dev tool; results recorded in README).
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.queries.Tables.partSupplierEdges(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[ccbench] edges=${edges.count()}")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"[ccbench] $label: rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    // warm one pass each, then measure second pass
    import graft.ops.ConnectedComponents._
    time("graphx (cold)") { components(edges).count() }
    time("graphx (warm)") { components(edges).count() }
    time("alternating-star (cold)") { componentsAlternatingStar(edges).count() }
    time("alternating-star (warm)") { componentsAlternatingStar(edges).count() }
    time("union-find agg (cold)") { componentsViaAggregate(edges).count() }
    time("union-find agg (warm)") { componentsViaAggregate(edges).count() }
    spark.stop()
  }
}
