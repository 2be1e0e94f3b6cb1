package graft

import graft.ops.TextStats
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case pins for TextStats.noveltyScores beyond CurationSpec's
  * golden (added with the r10 join-free rework: novel counts are a
  * re-aggregation of the shingle→min(doc) table, never a join back onto
  * the full shingle axis — these cases pin that the rework preserved the
  * exact contract).
  */
class NoveltySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], n: Int = 3)
      : Map[Long, (Long, Long, Long)] =
    TextStats.noveltyScores(rows.toDF("doc_id", "text"), "doc_id", "text", n)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("first appearance is the corpus-wide MIN doc id, not input order") {
    val got = run(Seq(
      (5L, "a b c d"),   // "a b c" owned by doc 2 below, "b c d" first here
      (2L, "a b c q")))  // both its grams first here (id 2 < 5)
    assert(got(2L) == ((2L, 2L, 1000L)))
    assert(got(5L) == ((2L, 1L, 500L)))
  }

  test("repeated grams inside one doc count once (distinct shingle set)") {
    val got = run(Seq((1L, "a b a b a b"))) // collapses to {"a b a","b a b"}
    assert(got(1L) == ((2L, 2L, 1000L)))
  }

  test("novelty floors (integer div); zero-novel docs still emit a row") {
    val got = run(Seq(
      (1L, "a b c d"),      // owns "a b c","b c d"
      (2L, "a b c x y"),    // "a b c"(old),"b c x","c x y" -> 2/3 -> 666
      (3L, "a b c d")))     // exact copy -> 0 of 2
    assert(got(2L) == ((3L, 2L, 666L)))
    assert(got(3L) == ((2L, 0L, 0L)))
    assert(got.size == 3)
  }
}
