package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RankCorr

class RankCorrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spearmanOf(rows: Seq[(String, Long, Long, Long)]) =
    RankCorr.spearman(rows.toDF("g", "x", "y", "k"), "g", "x", "y", "k")
      .collect().map(r => r.getString(0) -> r).toMap

  test("spearman: perfect monotone = 1e6, perfect reverse = -1e6") {
    val up = (1L to 10L).map(i => ("up", i, i * 7, i))
    val down = (1L to 10L).map(i => ("down", i, 100L - i, i))
    val m = spearmanOf(up ++ down)
    assert(m("up").getLong(3) == 1000000L)
    // reverse: sum d^2 = sum (2i - n - 1)^2, rho = 1 - 2 = -1 exactly
    assert(m("down").getLong(3) == -1000000L)
  }

  test("spearman matches a brute-force ranked Pearson-on-ranks") {
    val rnd = new scala.util.Random(19)
    val xs = Seq.fill(40)(rnd.nextInt(30).toLong)
    val ys = Seq.fill(40)(rnd.nextInt(30).toLong)
    val rows = xs.zip(ys).zipWithIndex.map { case ((x, y), i) =>
      ("g", x, y, i.toLong)
    }
    // untied ranks with the same (value, key) tiebreak convention
    def ranks(vs: Seq[Long]) = {
      val order = vs.zipWithIndex.sortBy { case (v, i) => (v, i) }
      val r = new Array[Long](vs.length)
      order.zipWithIndex.foreach { case ((_, i), pos) => r(i) = pos + 1L }
      r.toSeq
    }
    val d2 = ranks(xs).zip(ranks(ys)).map { case (a, b) =>
      (a - b) * (a - b)
    }.sum
    val n = 40L
    val expected = 1000000L - math.floorDiv(6000000L * d2, n * (n * n - 1))
    val got = spearmanOf(rows)("g")
    assert(got.getLong(2) == d2)
    assert(got.getLong(3) == expected)
  }

  test("kendall tau-a: pair classification and sign-split quotient") {
    // series: x rises with t, y = (3, 1, 2, 2) → hand-counted pairs
    val rows = Seq(("g", 1L, 10L, 3L), ("g", 2L, 20L, 1L),
      ("g", 3L, 30L, 2L), ("g", 4L, 40L, 2L))
    val r = RankCorr.kendallTauA(rows.toDF("g", "t", "x", "y"),
      "g", "t", "x", "y").collect()(0)
    // pairs (i<j by t): dy signs = -,-,-,+,+,0 → C=2 D=3 T=1
    assert(r.getLong(1) == 6L)
    assert(r.getLong(2) == 2L)
    assert(r.getLong(3) == 3L)
    assert(r.getLong(4) == 1L)
    // tau = 1e6*(2-3)/6 sign-split = -(1000000/6 trunc) = -166666
    assert(r.getLong(5) == -166666L)
  }

  test("kendall tau-a is +1e6 on a strictly co-monotone series") {
    val rows = (1L to 12L).map(i => ("g", i, i, i * i))
    val r = RankCorr.kendallTauA(rows.toDF("g", "t", "x", "y"),
      "g", "t", "x", "y").collect()(0)
    assert(r.getLong(5) == 1000000L)
  }

  test("mann-kendall: S counts sign agreements, sen slope is the median") {
    // y = 2t exactly → every pair slope = 2e6 ppm, S = n_pairs
    val lin = (0L to 9L).map(t => ("lin", t, 2 * t))
    // alternating series → S near 0
    val alt = (0L to 9L).map(t => ("alt", t, if (t % 2 == 0) 0L else 10L))
    val out = RankCorr.mannKendall((lin ++ alt).toDF("g", "t", "y"),
        "g", "t", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("lin").getLong(1) == 45L)
    assert(out("lin").getLong(2) == 45L)
    assert(out("lin").getLong(3) == 2000000L)
    // alt: 25 up-pairs (even→odd), 20 down (odd→even at larger gap? no:
    // odd t -> even t' pairs) — verify by brute force instead
    val s = (for (i <- 0 until 10; j <- i + 1 until 10)
      yield java.lang.Long.signum(alt(j)._3 - alt(i)._3).toLong).sum
    assert(out("alt").getLong(2) == s)
  }

  test("mann-kendall sen slope uses sign-split trunc division") {
    // two points, falling by 1 over 3 units: slope = -333333 (trunc),
    // not -333334 (floor)
    val rows = Seq(("g", 0L, 1L), ("g", 3L, 0L))
    val r = RankCorr.mannKendall(rows.toDF("g", "t", "y"), "g", "t", "y")
      .collect()(0)
    assert(r.getLong(3) == -333333L)
  }
}
