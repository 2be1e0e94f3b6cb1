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
}
