package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DiversityEmbedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def simpson(rows: Seq[(String, String)]) =
    graft.ops.Diversity.simpsonIndex(rows.toDF("grp", "cat"), "grp", "cat")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap

  test("a single dominating category scores lambda = 1") {
    val m = simpson(Seq(("g", "a"), ("g", "a"), ("g", "a")))
    assert(m("g") == (3L, 1L, 1000000L))
  }

  test("all-distinct categories score lambda = 0") {
    val m = simpson(Seq(("g", "a"), ("g", "b"), ("g", "c")))
    assert(m("g") == (3L, 3L, 0L))
  }

  test("hand-computed mix: two pairs among four members") {
    // counts 2,2: pairs_same = 2+2 = 4; N(N-1) = 12 -> 333333 ppm
    val m = simpson(Seq(("g", "a"), ("g", "a"), ("g", "b"), ("g", "b")))
    assert(m("g") == (4L, 2L, 333333L))
  }

  test("singleton groups are dropped, groups stay independent") {
    val m = simpson(Seq(("solo", "a"), ("g", "x"), ("g", "x")))
    assert(!m.contains("solo"))
    assert(m("g")._3 == 1000000L)
  }

  private def shift(rows: Seq[(Int, Seq[Float])]) =
    graft.ops.EmbedStats.centroidShift(
        rows.toDF("label", "embedding"), "label", "embedding")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("dot"), r.getAs[Double]("cosine"))).toMap

  test("identical groups have cosine 1, opposite groups -1") {
    val m = shift(Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(1.0f, 0.0f)),
      (1, Seq(1.0f, 0.0f)),
      (2, Seq(-1.0f, 0.0f))))
    assert(math.abs(m(("0", "1"))._2 - 1.0) < 1e-12)
    assert(math.abs(m(("0", "2"))._2 + 1.0) < 1e-12)
  }

  test("orthogonal centroids have dot 0") {
    val m = shift(Seq(
      (0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))))
    assert(m(("0", "1"))._1 == 0L)
    assert(m(("0", "1"))._2 == 0.0)
  }

  test("centroid sums are exact: dot matches hand arithmetic") {
    // label 0 sum = (30000, 10000); label 1 sum = (10000, 20000)
    // dot = 3e8 + 2e8 = 5e8
    val m = shift(Seq(
      (0, Seq(1.0f, 0.5f)), (0, Seq(2.0f, 0.5f)),
      (1, Seq(1.0f, 2.0f))))
    assert(m(("0", "1"))._1 == 500000000L)
  }
}
