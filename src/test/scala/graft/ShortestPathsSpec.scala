package graft

import graft.ops.ShortestPaths
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference shortest-path goldens
  * (reference: tests/test_graph_solver.py:367-433). Distances are
  * fixed-point quantized (×1000 truncation) so comparisons are exact.
  */
class ShortestPathsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pathMap(rows: Seq[(String, String, Double)], directed: Boolean) = {
    val df = rows.toDF("from", "to", "weight")
    ShortestPaths.calculateShortestPath(df, "from", "to", "weight", directed)
      .as[(String, String, Double)].collect()
      .map { case (f, t, d) => (f, t) -> d }.toMap
  }

  test("undirected all-pairs golden (py:367-393)") {
    val got = pathMap(Seq(
      ("A", "B", 1.0), ("A", "C", 2.0), ("B", "C", 1.0), ("C", "D", 1.5)),
      directed = false)
    val expected = Map(
      ("A", "B") -> 1.0, ("A", "C") -> 2.0, ("A", "D") -> 3.5,
      ("B", "C") -> 1.0, ("B", "D") -> 2.5, ("C", "D") -> 1.5)
    assert(got == expected)
  }

  test("directed asymmetry (py:396-414)") {
    val got = pathMap(Seq(
      ("A", "B", 1.0), ("B", "C", 2.0), ("B", "A", 3.0), ("C", "A", 4.0)),
      directed = true)
    assert(got(("A", "B")) == 1.0)
    assert(got(("B", "A")) == 3.0)
  }

  test("cycle picks min-cost path (py:417-433)") {
    val got = pathMap(Seq(
      ("A", "B", 1.0), ("B", "C", 1.0), ("C", "A", 3.0), ("A", "C", 2.0)),
      directed = true)
    assert(got(("A", "C")) == 2.0)
  }

  test("weight quantization truncates toward zero at 3 decimals (rs:70)") {
    // 0.0005*1000 = 0.5 → cost 0; 1.0015*1000 = 1001.49... → 1001
    val got = pathMap(Seq(("A", "B", 0.0005), ("B", "C", 1.0015)), directed = true)
    assert(got(("A", "B")) == 0.0)
    assert(got(("A", "C")) == 1.001)
  }

  test("empty graph yields empty result (py:436-443 stub, implemented here)") {
    val schema = StructType(Seq(
      StructField("from", StringType), StructField("to", StringType),
      StructField("weight", DoubleType)))
    val df = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    assert(ShortestPaths.calculateShortestPath(df, "from", "to", "weight").count() == 0)
  }

  test("directedDoubleEmit replicates the reference's duplicate rows (rs:164-196)") {
    val df = Seq(("A", "B", 1.0), ("B", "C", 2.0), ("C", "A", 4.0))
      .toDF("from", "to", "weight")
    val once = ShortestPaths.calculateShortestPath(df, "from", "to", "weight",
        directed = true)
      .as[(String, String, Double)].collect()
    val twice = ShortestPaths.calculateShortestPath(df, "from", "to", "weight",
        directed = true, directedDoubleEmit = true)
      .as[(String, String, Double)].collect()
    assert(twice.length == 2 * once.length)
    val counts = twice.groupBy(identity).view.mapValues(_.length).toMap
    assert(once.forall(r => counts(r) == 2), "every ordered pair exactly twice")
    // undirected mode is untouched by the flag
    val und = ShortestPaths.calculateShortestPath(df, "from", "to", "weight",
        directed = false, directedDoubleEmit = true)
      .as[(String, String, Double)].collect()
    assert(und.length == und.distinct.length)
  }

  test("above the gate, allPairs auto-falls back to Pregel with equal output") {
    // force the gate to 0: every call takes the distributed path, and the
    // result must match the broadcast Dijkstra path exactly (same ×1000
    // quantization, same pair-emission rules) — VERDICT r7 item 2
    val rows = Seq(
      ("A", "B", 1.0), ("A", "C", 2.0), ("B", "C", 1.0), ("C", "D", 1.5),
      ("D", "E", 0.25), ("E", "F", 4.0), ("X", "Y", 7.0))
    for (directed <- Seq(false, true)) {
      val df = rows.toDF("from", "to", "weight")
      val local = ShortestPaths.calculateShortestPath(
          df, "from", "to", "weight", directed)
        .as[(String, String, Double)].collect().toSet
      val fallback = ShortestPaths.calculateShortestPath(
          df, "from", "to", "weight", directed, maxLocalEdges = 0L)
        .as[(String, String, Double)].collect().toSet
      assert(fallback == local, s"directed=$directed")
    }
  }
}
