package graft

import graft.ops.TextStats
import org.scalatest.funsuite.AnyFunSuite

class KeywordsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana cherry cherry dog"))

  test("hand-computed rarity-weighted ranks with token tie-break") {
    // df: apple 1, banana 2, cherry 2, dog 1 -> weights 1e6, 5e5, 5e5, 1e6
    val got = TextStats.keywords(docs.toDF("doc_id", "text"), "doc_id", "text", k = 3)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 1L, "apple", 2000000L),          // tf 2 x 1e6
      (1L, 2L, "banana", 500000L),          // 5e5 tie -> banana < cherry
      (1L, 3L, "cherry", 500000L),
      (2L, 1L, "cherry", 1000000L),         // 1e6 tie -> cherry < dog
      (2L, 2L, "dog", 1000000L),
      (2L, 3L, "banana", 500000L)))
  }

  test("k truncates the ranking") {
    val got = TextStats.keywords(docs.toDF("doc_id", "text"), "doc_id", "text", k = 1)
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, "apple", 2000000L), (2L, 1L, "cherry", 1000000L)))
  }
}
