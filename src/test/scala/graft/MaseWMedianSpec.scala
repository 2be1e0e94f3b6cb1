package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Quantiles, Trend}

class MaseWMedianSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000000L

  test("seasonal-naive beats step-naive on a period-7 series") {
    // 21 days of a strict weekly pattern: count = (day mod 7) + 1 events
    val rows = for {
      d <- 0 until 21
      k <- 0 until (d % 7) + 1
    } yield ("w", d * day + k + 1L)
    val out = Trend.seasonalNaiveError(rows.toDF("g", "ts_us"), "g",
      "ts_us", season = 7).collect().head
    assert(out.getLong(1) == 20L) // n_1
    assert(out.getLong(3) == 14L) // n_season
    assert(out.getLong(4) == 0L)  // perfect weekly repeat
    assert(out.getLong(5) == 0L)  // mase 0: season predicts exactly
  }

  test("mase NULL when the step-naive error is zero (constant series)") {
    val rows = (0 until 10).flatMap(d => Seq(("c", d * day + 1L),
      ("c", d * day + 2L)))
    val out = Trend.seasonalNaiveError(rows.toDF("g", "ts_us"), "g",
      "ts_us", season = 7).collect().head
    assert(out.isNullAt(5))
  }

  test("weighted median: lower median by cumulative weight") {
    // values 10 (w 1), 20 (w 1), 30 (w 10): total 12, half 6 -> 30
    val df = Seq(("g", 10L, 1L), ("g", 20L, 1L), ("g", 30L, 10L),
      // group h: 5 (w 3), 7 (w 3): 2*3 >= 6 at v=5 -> lower median 5
      ("h", 7L, 3L), ("h", 5L, 3L),
      // zero/negative weights dropped
      ("h", 1L, 0L), ("h", 1L, -2L)).toDF("g", "v", "w")
    val out = Quantiles.weightedMedian(df, "g", "v", "w")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getLong(1) == 12L && out("g").getLong(2) == 30L)
    assert(out("h").getLong(1) == 6L && out("h").getLong(2) == 5L)
  }
}
