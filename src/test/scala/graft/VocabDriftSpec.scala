package graft

import graft.ops.VocabDrift
import org.scalatest.funsuite.AnyFunSuite

class VocabDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical slices have zero drift; disjoint ones near-maximal") {
    val docs = Seq(
      ("a", "apple banana cherry apple"),
      ("b", "apple banana cherry apple"),   // same distribution as a
      ("c", "xylophone quartz jigsaw vex")) // disjoint vocabulary
      .toDF("source", "text")
    val got = VocabDrift.drift(docs, "source", "text", buckets = 1024)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got(("a", "b")) == 0L)
    // truncating per-mille loses at most 1 per bucket; disjoint slices
    // sit within a few permille of the 2000 maximum
    assert(got(("a", "c")) > 1950L && got(("a", "c")) <= 2000L)
  }

  test("drift is symmetric in content, ordered by key") {
    val docs = Seq(("a", "x y z"), ("b", "x y q")).toDF("source", "text")
    val rows = VocabDrift.drift(docs, "source", "text", buckets = 64)
      .as[(String, String, Long, Long)].collect()
    assert(rows.length == 1 && rows.head._1 == "a" && rows.head._2 == "b")
    // 1 of 3 tokens differs on each side: L1 = |333-333|*2 + 333 + 333
    assert(rows.head._4 == 666L)
  }

  test("bucket hashing only MERGES mass: L1 lower-bounds the exact L1") {
    // with 1 bucket everything collides -> drift collapses to 0
    val docs = Seq(("a", "p q"), ("b", "r s")).toDF("source", "text")
    val one = VocabDrift.drift(docs, "source", "text", buckets = 1)
      .as[(String, String, Long, Long)].collect().head
    assert(one._4 == 0L)
  }
}
