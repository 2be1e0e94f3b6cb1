package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.RecordLinkage
import graft.ops.RecordLinkage.Comparator

class RecordLinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val left = Seq(
    (1L, "b1", "x", "p"), // agrees with right 10 on both fields
    (2L, "b1", "x", "q"), // field 1 only
    (3L, "b1", "y", "r"), // nothing
    (4L, "b2", "x", "p")) // right block: no partner in b2
    .toDF("id", "blk", "f1", "f2")
  private val right = Seq(
    (10L, "b1", "x", "p"),
    (20L, "b2", "z", "z"))
    .toDF("id", "blk", "g1", "g2")

  private def run(link: Long, possible: Long) =
    RecordLinkage.scorePairs(left, "id", right, "id",
      col("blk"), col("blk"),
      Seq(Comparator(col("f1"), col("g1"), 10L, -5L),
        Comparator(col("f2"), col("g2"), 20L, -4L)),
      link, possible)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap

  test("scores sum per-field weights; classes split on thresholds") {
    val out = run(link = 25L, possible = 5L)
    // (1,10): 10+20 = 30 -> link; (2,10): 10-4 = 6 -> possible
    assert(out((1L, 10L)).getLong(2) == 30L)
    assert(out((1L, 10L)).getString(3) == "link")
    assert(out((2L, 10L)).getLong(2) == 6L)
    assert(out((2L, 10L)).getString(3) == "possible")
    // (3,10): -5-4 = -9 dropped; cross-block pairs never scored
    assert(!out.contains((3L, 10L)) && !out.contains((1L, 20L)))
    assert(out.contains((4L, 20L)) == false) // -9, dropped
  }

  test("NULL never agrees (even NULL vs NULL)") {
    val l = Seq((1L, "b", Option.empty[String])).toDF("id", "blk", "f1")
    val r = Seq((2L, "b", Option.empty[String])).toDF("id", "blk", "g1")
    val out = RecordLinkage.scorePairs(l, "id", r, "id",
      col("blk"), col("blk"),
      Seq(Comparator(col("f1"), col("g1"), 10L, -5L)), 10L, -100L)
      .collect()
    assert(out.length == 1 && out.head.getLong(2) == -5L)
  }

  test("bad thresholds rejected") {
    intercept[IllegalArgumentException] {
      RecordLinkage.scorePairs(left, "id", right, "id", col("blk"),
        col("blk"), Seq(Comparator(col("f1"), col("g1"), 1L, 0L)), 5L, 10L)
    }
  }
}
