package graft.tools

import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timings for the link-prediction path (dev tool). */
object LpBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_quantity") <= 15)
      .select(col("l_orderkey").as("tid"),
        concat(lit("P"), col("l_partkey")).as("item"))
    val ok = li.groupBy("tid").agg(count(lit(1)).as("n"))
      .where(col("n") <= 8).select("tid")
    val r = li.join(ok, "tid")
    val pairs = r.as("a").join(r.as("b"),
        col("a.tid") === col("b.tid") && col("a.item") < col("b.item"))
      .select(col("a.item").as("src"), col("b.item").as("dst"))
    time("pairs raw count")(pairs.count())
    val e = pairs.select(least(col("src"), col("dst")).as("x"),
        greatest(col("src"), col("dst")).as("y"))
      .where(col("x") =!= col("y")).distinct().persist()
    time("canonical distinct")(e.count())
    val adj = e.select(col("x").as("w"), col("y").as("n"))
      .union(e.select(col("y").as("w"), col("x").as("n")))
    val deg = adj.groupBy("w").agg(count(lit(1)).as("d"))
    val okc = deg.where(col("d") <= 64)
    val a1 = adj.join(okc, "w").select(col("w"), col("n").as("a"), col("d"))
    val a2 = adj.select(col("w"), col("n").as("b"))
    val wedges = a1.join(a2, Seq("w")).where(col("a") < col("b"))
    time("wedge count")(wedges.count())
    val cand = wedges.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"),
        sum(expr("1000000000 div d")).as("ra_q"))
      .where(col("n_common") >= 2)
    time("cand agg count")(cand.count())
    val out = cand.join(e.select(col("x").as("a"), col("y").as("b")),
      Seq("a", "b"), "left_anti")
    time("final anti-join")(out.count())
    spark.stop()
  }
}
