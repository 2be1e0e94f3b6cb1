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

  private def runMulti(docs: Seq[(Long, String)], res: Seq[(Int, Int)])
      : Set[(Long, Long, Long)] =
    DupSpans.dupSpansMulti(docs.toDF("doc_id", "text"), "doc_id", "text", res)
      .as[(Long, Long, Long)].collect().toSet

  test("multi at one resolution covers exactly dupSpans' token set") {
    // the two views agree on COVERED TOKENS; span boundaries may differ —
    // dupSpans islands consecutive GRAM positions, the multi merge unions
    // token INTERVALS, so two gram-islands whose token coverage is
    // adjacent ([0,2] and [3,5]) legitimately fuse into one multi span
    val docs = Seq(
      (1L, "a b c d e f g"), (2L, "x a b c y d e f"), (3L, "p q r s"))
    def tokens(spans: Set[(Long, Long, Long)]): Set[(Long, Long)] =
      spans.flatMap { case (id, s, tk) => (s until s + tk).map(id -> _) }
    val single = tokens(run(docs, n = 2, minDocs = 2)
      .map { case (id, s, _, tk) => (id, s, tk) })
    val multi = runMulti(docs, Seq((2, 2)))
    assert(tokens(multi) == single && single.nonEmpty)
    // and the fusion actually happens on this fixture: doc 1's adjacent
    // gram-islands [0,2]+[3,5] arrive as ONE maximal token span
    assert(multi.contains((1L, 0L, 6L)))
  }

  test("containment theorem: longer grams at EQUAL minDocs add no coverage") {
    // an 8-gram in >= 2 docs implies each constituent 4-gram is in >= 2
    // docs, so (4,2) ∪ (8,2) ≡ (4,2) — the degenerate case the Scaladoc
    // warns about, pinned so the thresholds stay per-resolution
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "zz one two three four five six seven eight nine ten qq"),
      (3L, "unrelated words only here nothing shared at all today"))
    assert(runMulti(docs, Seq((4, 2), (8, 2))) == runMulti(docs, Seq((4, 2))))
  }

  test("every base-resolution span is contained in a multi span (superset)") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten gap alpha beta gamma delta"),
      (2L, "one two three four five six seven eight nine ten xx alpha beta gamma delta"),
      (3L, "pad one two three four pad2 alpha beta gamma delta end"),
      (4L, "pad3 one two three four pad4 more filler words here now"))
    val multi = runMulti(docs, Seq((4, 4), (8, 3), (16, 2)))
    for ((n, m) <- Seq((4, 4), (8, 3), (16, 2))) {
      val base = run(docs, n, m).map { case (id, s, _, tk) => (id, s, s + tk - 1) }
      base.foreach { case (id, s, e) =>
        assert(multi.exists { case (mid, ms, mtk) =>
          mid == id && ms <= s && ms + mtk - 1 >= e
        }, s"base ($n,$m) span ($id,$s,$e) not covered by $multi")
      }
    }
    assert(multi.nonEmpty)
  }

  test("low-support long match + high-support short boilerplate both survive") {
    // docs 1,2 share a 16-token verbatim run (only 2 docs: caught by
    // (16,2), invisible to (4,4)); docs 1-4 share a 4-token boilerplate
    // (caught by (4,4))
    val long16 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val docs = Seq(
      (1L, s"$long16 boiler plate text now"),
      (2L, s"head $long16 boiler plate text now"),
      (3L, s"other stuff boiler plate text now"),
      (4L, s"more words boiler plate text now"))
    val multi = runMulti(docs, Seq((4, 4), (16, 2)))
    // doc 1 gets the 16-token span at pos 0
    assert(multi.exists { case (id, s, tk) => id == 1L && s == 0L && tk >= 16L })
    // doc 3 gets only the boilerplate span ("stuff boiler plate text"
    // region via the shared 4-gram "boiler plate text here"? -> at least
    // one span, and none longer than its doc)
    assert(multi.exists(_._1 == 3L))
    // (4,4) alone would miss the 16-token run entirely
    val shortOnly = runMulti(docs, Seq((4, 4)))
    assert(!shortOnly.exists { case (id, s, tk) => id == 1L && tk >= 16L })
  }
}
