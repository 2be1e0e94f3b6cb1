package graft

import graft.ops.ImportanceWeights
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImportanceWeightsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // rows: (doc_id, text, lang)
  private def run(rows: Seq[(Long, String, String)], buckets: Int = 4096)
      : Map[Long, (Long, Long)] =
    ImportanceWeights.hashedRatioScores(
        rows.toDF("doc_id", "text", "lang"), "doc_id", "text",
        isTarget = col("lang") === "en", buckets)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("target-only vocabulary scores above raw-only vocabulary") {
    val got = run(Seq(
      (1L, "good clean prose here", "en"),
      (2L, "good clean prose here", "en"),
      (3L, "spam junk noise mess", "xx"),
      (4L, "good clean junk mess", "xx")))
    // doc 4 mixes both vocabularies; strictly between the pure docs
    assert(got(1L)._2 > got(4L)._2 && got(4L)._2 > got(3L)._2)
    assert(got(1L) == got(2L)) // identical text, identical score
    assert(got.values.forall(_._1 == 4L)) // n_toks counts occurrences
  }

  test("score is the sum over OCCURRENCES — repeating a target word raises it") {
    val got = run(Seq(
      (1L, "alpha alpha alpha", "en"),
      (2L, "alpha beta beta", "xx"),
      (3L, "alpha alpha beta", "xx")))
    assert(got(3L)._2 > got(2L)._2)
    assert(got(3L)._1 == 3L)
  }

  test("matches the hand-computed ppm arithmetic in a tiny bucket space") {
    // one target doc "a", one raw doc "b"; with collision-free buckets:
    // tot_t=1 tot_s=2; w(a)=1e6-5e5=5e5, w(b)=0-5e5=-5e5
    val got = run(Seq((1L, "a", "en"), (2L, "b", "fr")), buckets = 4096)
    assert(got(1L) == ((1L, 500000L)))
    assert(got(2L) == ((1L, -500000L)))
  }

  test("empty target slice raises loudly") {
    val boom = intercept[Exception] {
      run(Seq((1L, "a b", "fr"), (2L, "c", "de")))
    }
    assert(boom.getMessage.contains("zero token mass"))
  }

  test("bucket-count bounds are enforced") {
    val boom = intercept[IllegalArgumentException] {
      run(Seq((1L, "a", "en")), buckets = 1)
    }
    assert(boom.getMessage.contains("buckets"))
  }
}
