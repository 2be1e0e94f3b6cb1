package graft

import org.scalatest.funsuite.AnyFunSuite

class InequalitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gini(vals: Seq[Long]) =
    graft.ops.Inequality.giniExact(vals.toDF("v"), "v").collect()(0)

  test("equal values score 0, total concentration approaches 1000") {
    assert(gini(Seq.fill(10)(7L)).getLong(3) == 0L)
    // one owner of everything among n=10: G = (n-1)/n = 900 exactly
    assert(gini(Seq.fill(9)(0L) :+ 1000L).getLong(3) == 900L)
  }

  test("matches the O(n^2) mean-absolute-difference definition") {
    val rnd = new scala.util.Random(71)
    for (seed <- 0 until 3) {
      val vals = Seq.fill(60)(rnd.nextInt(50).toLong)
      val n = vals.length.toLong
      val total = vals.sum
      // G = sum_ij |vi - vj| / (2 n sum) — exact permille via floor
      val mad = (for (a <- vals; b <- vals) yield math.abs(a - b)).sum
      val expected = 1000L * mad / (2L * n * total)
      assert(gini(vals).getLong(3) == expected, s"seed run $seed")
    }
  }

  test("lorenzPoints emits zero rows for cuts before the first unit") {
    // n = 3 units, deciles: cuts 1..3 have m_units = 0 and must appear
    // as (quantile, 0, 0, 0) — the 1..nQuantiles output contract
    // (ADVICE r8); the last cut is always (n, total, 1000)
    val pts = graft.ops.Inequality
      .lorenzPoints(Seq(1L, 2L, 7L).toDF("v"), "v", nQuantiles = 10)
      .orderBy("quantile")
      .as[(Int, Long, Long, Long)].collect()
    assert(pts.length == 10)
    assert(pts.take(3).toSeq == Seq((1, 0L, 0L, 0L), (2, 0L, 0L, 0L),
      (3, 0L, 0L, 0L)))
    assert(pts.last == ((10, 3L, 10L, 1000L)))
    // bottom 2 of 3 units hold 1+2=3 of 10 -> 300 permille at cuts 7-9
    assert(pts(6) == ((7, 2L, 3L, 300L)))
  }

  test("ties are exact: grouped ranks equal the sorted-list identity") {
    val vals = Seq(5L, 5L, 5L, 1L, 1L, 9L)
    val sorted = vals.sorted
    val s1 = sorted.zipWithIndex.map { case (v, i) => (i + 1).toLong * v }.sum
    val r = gini(vals)
    assert(r.getLong(2) == 2 * s1 - (vals.length + 1).toLong * vals.sum)
  }
}
