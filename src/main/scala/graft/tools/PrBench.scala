package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone PageRank timing harness (dev tool). */
object PrBench {
  def main(args: Array[String]): Unit = {
    val tol = args.headOption.map(_.toDouble).getOrElse(0.0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.queries.Tables.partSupplierDirectedEdges(spark, "/root/testdata/sf0.1")
    edges.count() // warm
    val t0 = System.nanoTime()
    val n = graft.ops.PageRank.scores(edges, 0.85, 12, tol).count()
    println(s"[prbench] tol=$tol rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}
