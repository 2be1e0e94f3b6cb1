package graft

import graft.ops.Skipgrams
import org.scalatest.funsuite.AnyFunSuite

class SkipgramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], window: Int = 2,
      minCount: Long = 1L): Map[(String, String), Long] =
    Skipgrams.skipgramCounts(docs.toDF("id", "text"), "id", "text",
        window, minCount)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("window 2 emits distance-1 and distance-2 forward pairs") {
    val got = run(Seq((1L, "a b c")))
    assert(got == Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("a", "c") -> 1L))
  }

  test("window 1 is plain bigram counts") {
    val got = run(Seq((1L, "x y x y")), window = 1)
    assert(got == Map(("x", "y") -> 2L, ("y", "x") -> 1L))
  }

  test("pairs never cross document boundaries") {
    val got = run(Seq((1L, "a b"), (2L, "c d")))
    assert(got == Map(("a", "b") -> 1L, ("c", "d") -> 1L))
  }

  test("counts aggregate across documents and minCount filters") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a z"))
    assert(run(docs, minCount = 2L) == Map(("a", "b") -> 2L))
  }

  test("repeated token pairs count with multiplicity") {
    val got = run(Seq((1L, "a a a")), window = 1)
    assert(got == Map(("a", "a") -> 2L))
  }

  test("single-token document emits nothing") {
    assert(run(Seq((1L, "lonely"))) == Map.empty)
  }
}
