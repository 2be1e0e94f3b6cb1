package graft

import org.scalatest.funsuite.AnyFunSuite

class TopkChurnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def churn(rows: Seq[(Long, String)], k: Int) =
    graft.ops.Trend.topKChurn(rows.toDF("period", "item"), "period",
        "item", k)
      .orderBy("period").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("identical leaderboards score 1000, disjoint ones 0") {
    val p0 = Seq("a", "a", "b").map(0L -> _)
    val p1same = Seq("a", "b", "b").map(1L -> _)
    val p2other = Seq("x", "y", "y").map(2L -> _)
    val rows = churn(p0 ++ p1same ++ p2other, k = 2)
    assert(rows(0) == ((0L, 1L, 2L, 2L, 2L, 1000L)))
    assert(rows(1) == ((1L, 2L, 2L, 2L, 0L, 0L)))
  }

  test("ranking is count desc then item asc; only top-k items count") {
    // period 0 top-2: b (3), a (2); c (1) excluded. period 1 top-2: a, c.
    val p0 = Seq("a", "a", "b", "b", "b", "c").map(0L -> _)
    val p1 = Seq("a", "a", "c", "c", "d").map(1L -> _)
    val rows = churn(p0 ++ p1, k = 2)
    // common = {a}: jaccard = 1000 // (2 + 2 - 1) = 333
    assert(rows(0) == ((0L, 1L, 2L, 2L, 1L, 333L)))
  }

  test("gaps in periods emit no row; short periods use their true k") {
    val rows = churn(Seq(0L -> "a", 2L -> "a", 3L -> "a", 3L -> "b"),
      k = 5)
    // 0 -> 1 missing (period 1 absent); 2 -> 3 present with k_a=1, k_b=2
    assert(rows.length == 1)
    assert(rows(0) == ((2L, 3L, 1L, 2L, 1L, 500L)))
  }
}
