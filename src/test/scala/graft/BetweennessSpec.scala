package graft

import graft.ops.Betweenness
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference betweenness shape goldens
  * (reference: tests/test_graph_solver.py:90-189).
  */
class BetweennessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def centrality(rows: Seq[(String, String)], normalized: Boolean = true,
      directed: Boolean = false): Map[String, Double] = {
    val df = rows.toDF("from", "to")
    Betweenness.betweennessCentrality(df, "from", "to", normalized, directed)
      .as[(String, Double)].collect().toMap
  }

  test("line graph A-B-C: middle node 1.0, ends 0.0 (py:90-109)") {
    val c = centrality(Seq("A" -> "B", "B" -> "C"))
    assert(math.abs(c("B") - 1.0) < 1e-9)
    assert(math.abs(c("A")) < 1e-9 && math.abs(c("C")) < 1e-9)
  }

  test("star graph: center dominates, peripherals 0 (py:112-135)") {
    val c = centrality(Seq("A" -> "B", "A" -> "C", "A" -> "D", "A" -> "E"))
    assert(c("A") > c("B"))
    Seq("B", "C", "D", "E").foreach(n => assert(math.abs(c(n)) < 1e-9))
  }

  test("directed vs undirected differ on a cycle (py:138-155)") {
    val edges = Seq("A" -> "B", "B" -> "C", "C" -> "A")
    val dir = centrality(edges, directed = true)
    val undir = centrality(edges, directed = false)
    assert(dir != undir)
  }

  test("disconnected components: B positive, ends zero (py:158-177)") {
    val c = centrality(Seq("A" -> "B", "B" -> "C", "D" -> "E"))
    assert(c("B") > 0)
    Seq("A", "C", "D", "E").foreach(n => assert(math.abs(c(n)) < 1e-9))
  }

  test("empty graph yields empty result (py:180-189)") {
    val schema = StructType(Seq(
      StructField("from", StringType), StructField("to", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    assert(Betweenness.betweennessCentrality(df, "from", "to").count() == 0)
  }

  test("normalization uses global n even across components (rs:126-137)") {
    // A-B-C line plus isolated pair D-E: n=5 → undirected norm 2/(4*3)=1/6,
    // B raw = 2 (both directions), halved = 1, normalized = 1/6
    val c = centrality(Seq("A" -> "B", "B" -> "C", "D" -> "E"))
    assert(math.abs(c("B") - 1.0 / 6.0) < 1e-9)
  }
}
