package graft

import graft.ops.Similarity
import org.scalatest.funsuite.AnyFunSuite

class HardNegativesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("same-label neighbors are excluded however similar") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0), "A"),
      (2L, Seq(0.99, 0.01), "A"),  // near-identical but same label
      (3L, Seq(1.0, 1.0), "B"),
      (4L, Seq(0.0, 1.0), "B"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(vecs, "vec_id", "embedding", "label",
        vecs.where($"vec_id" === 1L), k = 2)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == Seq((1L, 1, 3L), (1L, 2, 4L)))
    assert(math.abs(got(0)._4 - 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(got(1)._4 == 0.0)
  }

  test("cosine ties break by neighbor id ascending") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0), "A"),
      (5L, Seq(2.0, 0.0), "B"),    // both cosine 1.0 with the query
      (3L, Seq(3.0, 0.0), "B"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(vecs, "vec_id", "embedding", "label",
        vecs.where($"vec_id" === 1L), k = 2)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toSeq
    assert(got.map(_._3) == Seq(3L, 5L))
  }
}
