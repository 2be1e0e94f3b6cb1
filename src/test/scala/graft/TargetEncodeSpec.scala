package graft

import graft.ops.{TargetEncode, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TargetEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("smoothed encoding: hand-computed shrinkage toward the global rate") {
    // A: 3 rows 2 pos; B: 1 row 1 pos; global = 3/4 = 750000 ppm, m = 2
    val df = Seq(("A", 1L), ("A", 1L), ("A", 0L), ("B", 1L)).toDF("cat", "t")
    val got = TargetEncode.encoderTable(df, "cat", col("t") === 1L, smoothing = 2L)
      .as[(String, Long, Long, Long)].collect()
      .map { case (c, n, p, e) => c -> ((n, p, e)) }.toMap
    // A: (1e6·2 + 2·750000) div 5 = 3500000 div 5 = 700000
    assert(got("A") == ((3L, 2L, 700000L)))
    // B: (1e6·1 + 2·750000) div 3 = 2500000 div 3 = 833333 (truncating)
    assert(got("B") == ((1L, 1L, 833333L)))
  }

  test("smoothing 0 degenerates to the raw per-category rate") {
    val df = Seq(("A", 1L), ("A", 0L), ("B", 0L)).toDF("cat", "t")
    val got = TargetEncode.encoderTable(df, "cat", col("t") === 1L, smoothing = 0L)
      .as[(String, Long, Long, Long)].collect()
      .map { case (c, _, _, e) => c -> e }.toMap
    assert(got("A") == 500000L && got("B") == 0L)
  }

  test("token concentration: hand-computed HHI/Gini, empty tokens dropped") {
    // k1: "a a b"   → counts {a:2, b:1}, n=3, sq=5,  hhi = 5e6 div 9 = 555555
    // k2: "x  x"    → double space yields an empty token, dropped: {x:2},
    //                 n=2, sq=4, hhi = 4e6 div 4 = 1000000, gini 0
    val df = Seq((1L, "k1", "a a b"), (2L, "k2", "x  x")).toDF("id", "k", "text")
    val got = TextStats.tokenConcentration(df, "k", "text")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("k1") == (("k1", 3L, 2L, 2L, 555555L, 444445L)))
    assert(got("k2") == (("k2", 2L, 1L, 2L, 1000000L, 0L)))
  }

  test("concentration orders boilerplate above diverse text") {
    val df = Seq((1L, "spam", "buy buy buy buy now"),
      (2L, "prose", "the quick brown fox jumps over dogs")).toDF("id", "k", "text")
    val got = TextStats.tokenConcentration(df, "k", "text")
      .select("key", "hhi_ppm").as[(String, Long)].collect().toMap
    assert(got("spam") > got("prose"))
  }
}
