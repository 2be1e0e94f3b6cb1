package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChangepointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cusum(rows: Seq[(String, Long, Long)]) =
    graft.ops.Changepoint.cusumMaxShift(
        rows.toDF("grp", "bucket", "cnt"), "grp", "bucket", "cnt")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap

  test("a step change is located at the last low bucket") {
    // 2,2,2,10,10,10: mean 6; S_i peaks (negatively) right before the jump
    val m = cusum((1L to 6L).map(b =>
      ("a", b, if (b <= 3) 2L else 10L)))
    val (n, total, cp, mx, dir) = m("a")
    assert(n == 6L && total == 36L)
    assert(cp == 3L, "drift is widest after the last low bucket")
    // n*S_3 = 6*6 - 3*36 = -72
    assert(mx == 72L && dir == -1L)
  }

  test("an upward-then-down series flags the peak with dir +1") {
    // 10,10,2,2: S peaks after bucket 2, above the mean
    val m = cusum(Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 2L),
      ("a", 4L, 2L)))
    val (_, _, cp, mx, dir) = m("a")
    assert(cp == 2L && dir == 1L)
    // n*S_2 = 4*20 - 2*24 = 32
    assert(mx == 32L)
  }

  test("ties break to the earliest bucket") {
    // symmetric 4,0,4: |nS| = 4 at buckets 1 and 2; earliest wins
    val m = cusum(Seq(("a", 1L, 4L), ("a", 2L, 0L), ("a", 3L, 4L)))
    assert(m("a")._3 == 1L)
  }

  test("a flat series has zero drift everywhere") {
    val m = cusum((1L to 5L).map(b => ("a", b, 7L)))
    assert(m("a")._4 == 0L)
  }

  test("groups are independent") {
    val m = cusum(
      (1L to 4L).map(b => ("flat", b, 5L)) ++
        (1L to 4L).map(b => ("step", b, if (b <= 2) 0L else 8L)))
    assert(m("flat")._4 == 0L)
    assert(m("step")._3 == 2L)
  }
}
