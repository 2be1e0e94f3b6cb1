package graft.tools

import graft.ops.FrequencySketch
import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timings for the Count-Min path (dev tool). */
object CmsBench {
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
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val events = Tables.lineitem(spark, sfDir)
      .select(concat(lit("P"), col("l_partkey")).as("item"))
    val parts = Tables.part(spark, sfDir)
      .select(concat(lit("P"), col("p_partkey")).as("item"))
    time("events.count")(events.count())
    time("md5 only") {
      events.select(md5(col("item")).as("m")).agg(count(lit(1))).collect()
    }
    time("conv lane") {
      events.select((conv(substring(md5(col("item")), 1, 15), 16, 10)
        .cast("long") % 4096).as("l")).agg(max(col("l"))).collect()
    }
    time("hex_to_long lane") {
      events.select((graft.functions.functions.hex_to_long(
        substring(md5(col("item")), 1, 15)) % 4096).as("l"))
        .agg(max(col("l"))).collect()
    }
    val sketch = time("cmsTable build")(
      FrequencySketch.cmsTable(events, "item", 4, 4096).persist())
    time("cmsTable count")(sketch.count())
    time("estimate join") {
      FrequencySketch.estimateCounts(sketch, parts, "item", 4, 4096)
        .where(col("est") >= 40).count()
    }
    spark.stop()
  }
}
