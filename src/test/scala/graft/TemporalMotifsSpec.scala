package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalMotifsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def motifs(edges: Seq[(String, String, Long)], window: Long) = {
    val r = graft.ops.TemporalMotifs.cyclicTriangles(
      edges.toDF("src", "dst", "t"), "src", "dst", "t", window).collect()(0)
    (r.getAs[Long]("n_edges"), r.getAs[Long]("n_wedges"),
      r.getAs[Long]("n_triangles"))
  }

  test("an in-order cycle inside the window is one triangle") {
    val g = Seq(("a", "b", 10L), ("b", "c", 20L), ("c", "a", 30L))
    assert(motifs(g, 100L) == (3L, 2L, 1L))
  }

  test("the window excludes a cycle that takes too long to close") {
    val g = Seq(("a", "b", 10L), ("b", "c", 20L), ("c", "a", 30L))
    // both hops fit the 15-window, but the closing span 30-10=20 doesn't
    assert(motifs(g, 15L) == (3L, 2L, 0L))
  }

  test("out-of-order edges form no temporal triangle") {
    // structurally a cycle, but NO rotation of (10, 30, 20) is
    // increasing — unlike (20, 30, 10), which closes via c→a first
    val g = Seq(("a", "b", 10L), ("b", "c", 30L), ("c", "a", 20L))
    assert(motifs(g, 100L) == (3L, 1L, 0L))
  }

  test("simultaneous timestamps are dropped by the strict ordering") {
    val g = Seq(("a", "b", 10L), ("b", "c", 10L), ("c", "a", 30L))
    assert(motifs(g, 100L) == (3L, 1L, 0L)) // only b->c .. c->a wedge
  }

  test("a back-and-forth pair is not a wedge") {
    val g = Seq(("a", "b", 10L), ("b", "a", 20L))
    assert(motifs(g, 100L) == (2L, 0L, 0L))
  }

  test("repeat edges at different times multiply the motif count") {
    val g = Seq(("a", "b", 10L), ("a", "b", 11L),
      ("b", "c", 20L), ("c", "a", 30L))
    // both a->b copies start a valid triangle
    assert(motifs(g, 100L)._3 == 2L)
  }
}

class StreamingAmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming lane sums equal the batch sketch (additive state)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val q = graft.ops.AmsSketch.laneSumsOf(input.toDF().toDF("k"), "k", 8)
      .writeStream.outputMode("complete")
      .format("memory").queryName("ams_stream").start()
    val b1 = Seq("a", "b", "a", "c")
    val b2 = Seq("c", "c", "d", "a")
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    val streamed = spark.table("ams_stream").collect()
      .map(r => r.getAs[Int]("lane") -> r.getAs[Long]("lane_sum")).toMap
    val batch = graft.ops.AmsSketch
      .laneSumsOf((b1 ++ b2).toDF("k"), "k", 8).collect()
      .map(r => r.getAs[Int]("lane") -> r.getAs[Long]("lane_sum")).toMap
    q.stop()
    assert(streamed == batch)
  }

  test("streaming CMS table equals the batch sketch (counter addition)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val q = graft.ops.FrequencySketch
      .cmsTable(input.toDF().toDF("item"), "item", 4, 64)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream").start()
    val b1 = Seq("x", "y", "x", "z")
    val b2 = Seq("z", "z", "w", "x")
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Int]("j"), r.getAs[Long]("idx")) ->
        r.getAs[Long]("cnt")).toMap
    val streamed = toMap(spark.table("cms_stream").collect())
    val batch = toMap(graft.ops.FrequencySketch
      .cmsTable((b1 ++ b2).toDF("item"), "item", 4, 64).collect())
    q.stop()
    assert(streamed == batch)
  }
}
