package graft

import graft.ops.{Normalize, Trend}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrendWinsorizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000000L

  test("trend recovers a clean positive slope") {
    // y = 2.5 * day + 1 exactly: slope in micro-units/day = 2.5e6
    val rows = (0 until 10).map(i => ("m", i * day, 2.5 * i + 1.0))
    val got = Trend.groupTrends(rows.toDF("g", "ts_us", "v"), "g", "ts_us", "v")
      .select("grp", "slope").as[(String, Double)].collect().head
    assert(got._1 == "m")
    assert(math.abs(got._2 - 2500000.0) < 1e-6)
  }

  test("zero x-variance yields a NULL slope, not a crash") {
    val rows = Seq(("a", 5L * day, 1.0), ("a", 5L * day + 1000L, 9.0))
    val got = Trend.groupTrends(rows.toDF("g", "ts_us", "v"), "g", "ts_us", "v")
      .select(col("slope").isNull).as[Boolean].collect()
    assert(got.toSeq == Seq(true)) // both events land in day 0 after scaling
  }

  test("groups are fit independently") {
    val up = (0 until 5).map(i => ("up", i * day, i.toDouble))
    val down = (0 until 5).map(i => ("down", i * day, -2.0 * i))
    val got = Trend.groupTrends((up ++ down).toDF("g", "ts_us", "v"),
        "g", "ts_us", "v")
      .select("grp", "slope").as[(String, Double)].collect().toMap
    assert(math.abs(got("up") - 1000000.0) < 1e-6)
    assert(math.abs(got("down") + 2000000.0) < 1e-6)
  }

  test("winsorize cuts are exact order statistics and clipping is counted") {
    // 1..100 in one group: P05 rank = ceil(5) = 5 -> value 5;
    // P95 rank = ceil(95) = 95 -> value 95; 4 below, 5 above
    val rows = (1L to 100L).map(v => ("g", v))
    val got = Normalize.winsorizeStats(rows.toDF("flag", "v"), "v", Seq("flag"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    val (_, n, pLo, pHi, nLo, nHi, wsum) = got
    assert(n == 100L && pLo == 5L && pHi == 95L)
    assert(nLo == 4L && nHi == 5L)
    // wsum = 4 clipped-up to 5, untouched 5..95, 5 clipped-down to 95
    val expected = 4L * 5L + (5L to 95L).sum + 5L * 95L
    assert(wsum == expected)
  }

  test("robust scale: exact quartile cuts, signed magnitude division") {
    // 1..100: p25=25, med=50, p75=75, iqr=50
    // v=100 -> +(1000*50) div 50 = +1000; v=1 -> -(1000*49) div 50 = -980
    val rows = (1L to 100L).map(("g", _))
    val got = graft.ops.Quantiles.robustScale(rows.toDF("grp", "v"), "v", Seq("grp"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    assert(got(50L) == (("g", 50L, 50L, 50L, 0L)))
    assert(got(100L)._5 == 1000L && got(1L)._5 == -980L)
  }

  test("robust scale: zero IQR yields NULL scaled values") {
    val rows = (Seq.fill(10)(7L) :+ 99L).map(("g", _))
    val nulls = graft.ops.Quantiles.robustScale(rows.toDF("grp", "v"), "v", Seq("grp"))
      .where(org.apache.spark.sql.functions.col("scaled_permille").isNull).count()
    assert(nulls == 11L) // p25 = med = p75 = 7 -> iqr 0 for every row
  }

  test("winsorize handles ties deterministically") {
    val rows = (Seq.fill(50)(10L) ++ Seq.fill(50)(20L)).map(("g", _))
    val got = Normalize.winsorizeStats(rows.toDF("flag", "v"), "v", Seq("flag"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got._3 == 10L && got._4 == 20L) // cuts fall on the tied values
    assert(got._5 == 0L && got._6 == 0L)   // nothing strictly outside
  }
}
