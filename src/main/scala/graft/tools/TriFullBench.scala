package graft.tools

import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: triangle counting on the UNGUARDED co-order graph — no
  * max-quantity filter, no order-size cap — to measure that the
  * degree-ordered orientation really bounds the wedge join at full load
  * (the q_triangles guardrail rationale, measured rather than asserted;
  * VERDICT r4 item 9). Prints edge/triangle counts and wall time.
  */
object TriFullBench {
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
    // unguarded: every lineitem, every order size
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("tid"),
        concat(lit("P"), col("l_partkey")).as("item"))
    val edges = li.as("a").join(li.as("b"),
        col("a.tid") === col("b.tid") && col("a.item") < col("b.item"))
      .select(col("a.item").as("src"), col("b.item").as("dst"))
    println(s"sf dir: $sfDir")
    time("edge count (unguarded)")(println("  edges: " + edges.count()))
    val tri = time("perNodeCounts full load") {
      graft.ops.Triangles.perNodeCounts(edges, "src", "dst")
        .agg(sum(col("n_triangles")).as("t3"), count(lit(1)).as("nodes"))
        .collect()(0)
    }
    println(s"  triangle participations: ${tri.getLong(0)} over ${tri.getLong(1)} nodes")
    spark.stop()
  }
}
