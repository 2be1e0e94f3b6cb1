package graft

import graft.ops.Packing
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // rows: (doc_id, len) -> doc_id -> (len, rnk, pack_id, n_members, pack_len, fill_ppm)
  private def run(rows: Seq[(Long, Long)], cap: Long)
      : Map[Long, (Long, Long, Long, Long, Long, Long)] =
    Packing.packPairs(rows.toDF("doc_id", "n_tok"), "doc_id", "n_tok", cap)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap

  test("longest pairs shortest when they fit; pack named by the longer member") {
    // lens desc: 10(a) 7(b) 3(c) 2(d) -> pairs (a,d), (b,c)
    val got = run(Seq((1L, 10L), (2L, 7L), (3L, 3L), (4L, 2L)), 12L)
    assert(got(1L) == ((10L, 1L, 1L, 2L, 12L, 1000000L)))
    assert(got(4L) == ((2L, 4L, 1L, 2L, 12L, 1000000L)))
    assert(got(2L) == ((7L, 2L, 2L, 2L, 10L, 833333L)))
    assert(got(3L) == ((3L, 3L, 2L, 2L, 10L, 833333L)))
  }

  test("a pair that does not fit leaves BOTH as singletons") {
    val got = run(Seq((1L, 10L), (2L, 9L)), 12L)
    assert(got(1L) == ((10L, 1L, 1L, 1L, 10L, 833333L)))
    assert(got(2L) == ((9L, 2L, 2L, 1L, 9L, 750000L)))
  }

  test("odd corpus: the middle rank is a singleton") {
    val got = run(Seq((1L, 9L), (2L, 5L), (3L, 1L)), 10L)
    assert(got(1L) == ((9L, 1L, 1L, 2L, 10L, 1000000L)))
    assert(got(3L) == ((1L, 3L, 1L, 2L, 10L, 1000000L)))
    assert(got(2L) == ((5L, 2L, 2L, 1L, 5L, 500000L)))
  }

  test("oversized doc stays a singleton with fill_ppm > 1e6, not clipped") {
    val got = run(Seq((1L, 15L), (2L, 1L)), 10L)
    assert(got(1L) == ((15L, 1L, 1L, 1L, 15L, 1500000L)))
    assert(got(2L) == ((1L, 2L, 2L, 1L, 1L, 100000L)))
  }

  test("length ties rank by doc_id ascending — fully deterministic") {
    val got = run(Seq((7L, 5L), (3L, 5L), (9L, 2L), (8L, 2L)), 7L)
    // desc order: (5,3) r1, (5,7) r2, (2,8) r3, (2,9) r4 -> pairs (3,9),(7,8)
    assert(got(3L)._3 == 3L && got(9L)._3 == 3L)
    assert(got(7L)._3 == 7L && got(8L)._3 == 7L)
  }

  test("every doc appears exactly once and pack_len sums preserve token mass") {
    val rows = (1L to 101L).map(i => (i, (i * 37 % 90) + 5))
    val got = run(rows, 100L)
    assert(got.size == 101)
    // each pack's pack_len equals the sum of its members' lens
    val byPack = got.toSeq.groupBy(_._2._3)
    byPack.foreach { case (_, members) =>
      val lens = members.map(_._2._1).sum
      assert(members.forall(_._2._5 == lens))
      assert(members.forall(_._2._4 == members.size.toLong))
      assert(members.size <= 2)
    }
  }

  test("negative length raises loudly") {
    val boom = intercept[Exception] { run(Seq((1L, -3L), (2L, 1L)), 10L) }
    assert(boom.getMessage.contains("negative or null length"))
  }
}
