package graft

import graft.ops.Quantiles
import org.scalatest.funsuite.AnyFunSuite

class PercentileContSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def p50p90(vals: Seq[Long]): (Double, Double) = {
    val row = Quantiles.interpolatedPercentiles(
        vals.map(("g", _)).toDF("g", "v"), "v", Seq("g"), Seq(50, 90))
      .select("p50", "p90").as[(Double, Double)].collect().head
    row
  }

  test("interpolation matches PERCENTILE_CONT on 1..10") {
    // numpy type-7 over 1..10: p50 = 5.5, p90 = 9.1
    val (p50, p90) = p50p90(1L to 10L)
    assert(p50 == 5.5)
    assert(math.abs(p90 - 9.1) < 1e-12)
  }

  test("exact-position percentiles fall on the order statistic") {
    // 1..11: p50 position = 5.0 exactly -> value 6, frac = 0
    val (p50, _) = p50p90(1L to 11L)
    assert(p50 == 6.0)
  }

  test("single-value group degenerates to that value") {
    val (p50, p90) = p50p90(Seq(42L))
    assert(p50 == 42.0 && p90 == 42.0)
  }

  test("groups are computed independently") {
    val df = ((1L to 10L).map(("a", _)) ++ (100L to 109L).map(("b", _)))
      .toDF("g", "v")
    val got = Quantiles.interpolatedPercentiles(df, "v", Seq("g"), Seq(50))
      .select("g", "p50").as[(String, Double)].collect().toMap
    assert(got("a") == 5.5 && got("b") == 104.5)
  }
}
