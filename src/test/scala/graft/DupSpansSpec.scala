package graft

import graft.ops.DupSpans
import org.scalatest.funsuite.AnyFunSuite

class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], n: Int = 2, minDocs: Int = 2)
      : Set[(Long, Long, Long, Long)] =
    DupSpans.dupSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        n, minDocs)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("cross-doc duplicated bigram runs merge into maximal spans") {
    val got = run(Seq(
      (1L, "a b c d e"),   // "a b","b c" dup -> span [0, 2 grams]
      (2L, "x a b c y"),   // same grams at pos 1,2
      (3L, "p q r s t")))  // all unique
    assert(got == Set(
      (1L, 0L, 2L, 3L),
      (2L, 1L, 2L, 3L)))
  }

  test("within-one-doc repetition is not a duplicated span (minDocs=2)") {
    // "m n" occurs twice but only in doc 4 -> 1 distinct doc
    assert(run(Seq((4L, "m n z m n"), (5L, "u v w"))).isEmpty)
  }

  test("non-adjacent duplicated grams split into separate islands") {
    val got = run(Seq(
      (1L, "a b z c d"),  // dup at pos 0 ("a b") and pos 3 ("c d")
      (2L, "a b q c d")))
    assert(got == Set(
      (1L, 0L, 1L, 2L), (1L, 3L, 1L, 2L),
      (2L, 0L, 1L, 2L), (2L, 3L, 1L, 2L)))
  }

  test("span_tokens = n_grams + n - 1 for trigram spans") {
    val got = run(Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d q r")), n = 3)
    // shared trigrams: "a b c"(0), "b c d"(1) -> span of 2 grams = 4 tokens
    assert(got == Set((1L, 0L, 2L, 4L), (2L, 0L, 2L, 4L)))
  }

  test("docs shorter than n produce no grams and no spans") {
    assert(run(Seq((1L, "a b"), (2L, "a b")), n = 3).isEmpty)
  }

  test("parameter guards are loud") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      DupSpans.dupSpans(df, "doc_id", "text", n = 1)
    }
    intercept[IllegalArgumentException] {
      DupSpans.dupSpans(df, "doc_id", "text", n = 2, minDocs = 1)
    }
  }
}
