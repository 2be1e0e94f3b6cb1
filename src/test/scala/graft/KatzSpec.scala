package graft

import graft.ops.Katz
import org.scalatest.funsuite.AnyFunSuite

class KatzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Katz on a chain: each hop adds a geometrically shrinking walk") {
    // a -> b -> c, alpha = 1/2, scale 1000, 3 iters: the fixpoint is
    // x(a) = 1000, x(b) = 1000 + x(a)/2 = 1500,
    // x(c) = 1000 + x(b)/2 = 1750 (reached at iter 2, stable after)
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val got = Katz.centralityFixedPoint(e, iters = 3, alphaNum = 1L,
        alphaDen = 2L, scale = 1000L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1000L, "b" -> 1500L, "c" -> 1750L))
  }

  test("parallel edges count as multiplicity (walk counts, not reach)") {
    val e = Seq(("a", "b"), ("a", "b")).toDF("src", "dst")
    val got = Katz.centralityFixedPoint(e, iters = 1, alphaNum = 1L,
        alphaDen = 2L, scale = 1000L)
      .as[(String, Long)].collect().toMap
    assert(got("b") == 2000L) // 1000 + (2 * 1000) / 2
  }

  test("in-prestige is NOT out-normalized: a hub source boosts all targets fully") {
    // hub h -> {x, y, z}: PageRank would split h's mass; Katz must not
    val e = Seq(("h", "x"), ("h", "y"), ("h", "z")).toDF("src", "dst")
    val got = Katz.centralityFixedPoint(e, iters = 2, alphaNum = 1L,
        alphaDen = 4L, scale = 1000L)
      .as[(String, Long)].collect().toMap
    assert(got("x") == 1250L && got("y") == 1250L && got("z") == 1250L)
  }

  test("result is partition-invariant (exact integer truncation)") {
    val e = (1 to 300).map(i => (s"u${i % 40}", s"u${(i * 7) % 40}"))
      .filter(p => p._1 != p._2).toDF("src", "dst")
    val a = Katz.centralityFixedPoint(e.repartition(1))
      .as[(String, Long)].collect().toSet
    val b = Katz.centralityFixedPoint(e.repartition(13))
      .as[(String, Long)].collect().toSet
    assert(a == b)
  }
}
