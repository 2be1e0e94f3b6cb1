package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SeriesShape, Skyline}

class SkylineDiscordSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pareto frontier: dominated dropped, ties and duplicates kept") {
    val pts = Seq(
      ("g", 1L, 10L, 1L),  // frontier (best x)
      ("g", 2L, 5L, 5L),   // frontier
      ("g", 3L, 5L, 5L),   // exact duplicate of 2 -> kept
      ("g", 4L, 5L, 3L),   // dominated by 2 (same x, lower y)
      ("g", 5L, 1L, 9L),   // frontier (best y)
      ("g", 6L, 1L, 1L),   // dominated by everyone
      ("g", 7L, 3L, 9L),   // frontier? x=3 > 1 with y=9 -> dominates 5
      ("h", 8L, 1L, 1L))   // singleton group: frontier
    val out = Skyline.paretoFront2D(pts.toDF("g", "id", "x", "y"),
      "g", "id", "x", "y").collect().map(_.getLong(1)).toSet
    // 5 is dominated by 7 (x 3>1, y equal 9); 7 on the frontier
    assert(out == Set(1L, 2L, 3L, 7L, 8L))
  }

  test("pareto matches brute-force dominance on random points") {
    val rnd = new scala.util.Random(31)
    val pts = (0L until 200L).map(i =>
      ("g", i, rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val out = Skyline.paretoFront2D(pts.toDF("g", "id", "x", "y"),
      "g", "id", "x", "y").collect().map(_.getLong(1)).toSet
    val brute = pts.filter { p =>
      !pts.exists(q => q._3 >= p._3 && q._4 >= p._4 &&
        (q._3 > p._3 || q._4 > p._4))
    }.map(_._2).toSet
    assert(out == brute)
  }

  test("streaks: islands found, longest wins, earliest tie-break") {
    val rows = Seq(
      // user a: days 1,2,3 then 7,8 -> longest 3 starting day 1
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 7L), ("a", 8L), ("a", 2L),
      // user b: two 2-day islands -> earliest (day 4) wins the tie
      ("b", 9L), ("b", 10L), ("b", 4L), ("b", 5L))
    val out = SeriesShape.longestStreak(rows.toDF("u", "day"), "u", "day")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 5L)
    assert(out("a").getLong(2) == 3L && out("a").getLong(3) == 1L)
    assert(out("b").getLong(2) == 2L && out("b").getLong(3) == 4L)
  }

  test("discord: the injected spike window is the farthest-from-anything") {
    // flat series with one spike at position 6: windows covering the
    // spike are unusual; the most unusual is the max-min position
    val cs = Seq(5L, 5L, 5L, 5L, 5L, 50L, 5L, 5L, 5L, 5L, 5L, 5L)
    val s = cs.zipWithIndex.map { case (c, i) => ("g", (i + 1).toLong, c) }
    val out = SeriesShape.topDiscord(s.toDF("g", "b", "c"), "g", "b", "c",
      motifLen = 3).collect().head
    assert(out.getLong(1) == 10L)
    // winning position's window must contain the spike (positions 4..6)
    assert(out.getLong(2) >= 4L && out.getLong(2) <= 6L)
    assert(out.getLong(3) == (50L - 5L) * (50L - 5L))
  }
}
