package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SeqMiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mine(rows: Seq[(String, String, Long)], minSupport: Long = 1L) =
    graft.ops.SeqMining.frequentSequences(
        rows.toDF("u", "it", "t"), "u", "it", "t", minSupport)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  test("gapped containment: a>c found across an intervening b") {
    val m = mine(Seq(("u1", "a", 1L), ("u1", "b", 2L), ("u1", "c", 3L)))
    assert(m("a>c") == 1L)
    assert(m("a>b>c") == 1L)
    assert(!m.contains("c>a"))
  }

  test("support counts users, not occurrences") {
    val m = mine(Seq(
      ("u1", "a", 1L), ("u1", "b", 2L), ("u1", "a", 3L), ("u1", "b", 4L),
      ("u2", "a", 1L), ("u2", "b", 2L)))
    assert(m("a>b") == 2L)
    assert(m("a") == 2L)
  }

  test("greedy-earliest is complete: late witness still matches") {
    // first b is BEFORE the first a; a>b must still be found via the
    // second b
    val m = mine(Seq(("u1", "b", 1L), ("u1", "a", 2L), ("u1", "b", 9L)))
    assert(m("a>b") == 1L)
    assert(m("b>a") == 1L)
  }

  test("repeat patterns: a>a needs two occurrences") {
    val m1 = mine(Seq(("u1", "a", 1L)))
    assert(!m1.contains("a>a"))
    val m2 = mine(Seq(("u1", "a", 1L), ("u1", "a", 5L)))
    assert(m2("a>a") == 1L)
    assert(!m2.contains("a>a>a"))
  }

  test("min support prunes the tail") {
    val m = mine(Seq(
      ("u1", "a", 1L), ("u2", "a", 1L), ("u1", "b", 2L)), minSupport = 2L)
    assert(m.keySet == Set("a"))
  }

  test("alphabet gate is loud") {
    val big = (1 to 70).map(i => ("u1", s"i$i", i.toLong))
    intercept[IllegalArgumentException] {
      graft.ops.SeqMining.frequentSequences(
        big.toDF("u", "it", "t"), "u", "it", "t", 1L).collect()
    }
  }
}
