package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DataValue

class DataValueSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("knn-shapley matches the hand-unrolled recurrence") {
    // one test point (id 0) at the origin; train points at increasing
    // distance with labels A, B, A -> eq by rank = [1, 0, 1], K = 1
    val rows = Seq(
      (0L, Array(0.0f, 0.0f), 7),
      (1L, Array(0.1f, 0.0f), 7),  // rank 1, eq
      (2L, Array(0.2f, 0.0f), 8),  // rank 2, diff
      (3L, Array(0.3f, 0.0f), 7))  // rank 3, eq
    val out = DataValue.knnShapley(rows.toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", k = 1, testModulus = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // delta_3 = 1e6/3 = 333333; delta_2 = -1e6/2 = -500000;
    // delta_1 = +1e6/1; suffix sums: s1 = 833333, s2 = -166667, s3 = 333333
    assert(out(1L) == 833333L)
    assert(out(2L) == -166667L)
    assert(out(3L) == 333333L)
  }

  test("values sum across sampled test points; matching labels score higher") {
    val rnd = new scala.util.Random(41)
    val rows = (0L until 60L).map { i =>
      (i, Array(rnd.nextFloat(), rnd.nextFloat(), rnd.nextFloat()),
        (i % 2).toInt)
    }
    val out = DataValue.knnShapley(rows.toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", k = 3, testModulus = 10L)
      .collect()
    // 6 test points (ids 0,10,..50), 54 train points, each scored once
    // per test point
    assert(out.length == 54)
    assert(out.forall(_.getLong(1) == 6L))
  }
}
