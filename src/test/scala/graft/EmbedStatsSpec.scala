package graft

import graft.ops.EmbedStats
import org.scalatest.funsuite.AnyFunSuite

class EmbedStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gram matrix is the exact sum of outer products") {
    val vecs = Seq(Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))
    val got = EmbedStats.gramMatrix(vecs.toDF("v"), "v", dim = 3)
      .as[(Int, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // e.g. G[0][0] = 1+16 = 17, G[0][2] = 3+24 = 27, G[2][2] = 9+36 = 45
    assert(got((0, 0)) == ((2L, 17L)) && got((0, 1)) == ((2L, 22L)))
    assert(got((0, 2)) == ((2L, 27L)) && got((1, 1)) == ((2L, 29L)))
    assert(got((1, 2)) == ((2L, 36L)) && got((2, 2)) == ((2L, 45L)))
    assert(got.size == 6) // upper triangle only
  }

  test("partials merge identically under any partitioning") {
    val vecs = (1 to 200).map(i =>
      Array.tabulate(4)(j => ((i * 31 + j * 7) % 100).toDouble))
    val df = vecs.toDF("v")
    val a = EmbedStats.gramMatrix(df.repartition(1), "v", 4)
      .as[(Int, Int, Long, Long)].collect().toSet
    val b = EmbedStats.gramMatrix(df.repartition(13), "v", 4)
      .as[(Int, Int, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("wrong vector length fails loudly") {
    val vecs = Seq(Array(1.0, 2.0), Array(1.0, 2.0, 3.0))
    val ex = intercept[Exception] {
      EmbedStats.gramMatrix(vecs.toDF("v"), "v", dim = 2).collect()
    }
    assert(ex.getMessage != null)
  }

  test("pcaFromGram recovers the dominant axis of an anisotropic cloud") {
    // integer points spread along (3,4)/5 with small off-axis jitter
    val pts = (-20 to 20).map(t =>
      Array((3 * t + (t % 2)).toDouble, (4 * t - (t % 2)).toDouble))
    val df = pts.toDF("v")
    val gram = EmbedStats.gramMatrix(df, "v", 2)
      .as[(Int, Int, Long, Long)].collect()
      .map(r => ((r._1, r._2), r._4))
    val colSums = Array(
      pts.map(_(0).toLong).sum, pts.map(_(1).toLong).sum)
    val top = EmbedStats.pcaFromGram(gram, colSums, n = pts.length,
      dim = 2, k = 2)
    val (ev1, vec1) = top.head
    assert(ev1 > top(1)._1)                       // ordered descending
    assert(math.abs(vec1(0) / vec1(1) - 0.75) < 0.05) // direction ~ (3,4)
    val norm = math.sqrt(vec1(0) * vec1(0) + vec1(1) * vec1(1))
    assert(math.abs(norm - 1.0) < 1e-9)           // orthonormal rotations
    // trace preservation: eigenvalue sum == covariance trace
    val n = pts.length.toDouble
    val cxx = gram.toMap.apply((0, 0)).toDouble / n -
      math.pow(colSums(0) / n, 2)
    val cyy = gram.toMap.apply((1, 1)).toDouble / n -
      math.pow(colSums(1) / n, 2)
    assert(math.abs(top.map(_._1).sum - (cxx + cyy)) < 1e-6)
  }
}
