package graft

import graft.ops.LmScore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigram model scores are exact ppm conditional probabilities") {
    // model corpus: "a b", "a b", "a c" -> c(a b)=2, c(a c)=1, c1(a)=3
    val docs = Seq(
      (1L, "a b", "en"), (2L, "a b", "en"), (3L, "a c", "en"),
      (10L, "a b a c", "xx")).toDF("doc_id", "text", "lang")
    val got = LmScore.score(docs, "doc_id", "text", col("lang") === "en")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 10 bigrams: (a,b)=666666, (b,a) unseen=0, (a,c)=333333
    assert(got(10L) == ((10L, 3L, 999999L, 333333L)))
    // in-model docs score their own bigram: (a,b) -> 666666
    assert(got(1L) == ((1L, 1L, 666666L, 666666L)))
    assert(got(3L) == ((3L, 1L, 333333L, 333333L)))
  }

  test("documents shorter than 2 tokens keep a zero row") {
    val docs = Seq((1L, "a b", "en"), (2L, "solo", "en"))
      .toDF("doc_id", "text", "lang")
    val got = LmScore.score(docs, "doc_id", "text", col("lang") === "en")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(2L) == ((2L, 0L, 0L, 0L)))
    assert(got.size == 2)
  }

  test("model is trained ONLY on the reference slice") {
    // "x y" appears only outside the ref slice -> unseen, scores 0
    val docs = Seq((1L, "a b", "en"), (2L, "x y", "de"))
      .toDF("doc_id", "text", "lang")
    val got = LmScore.score(docs, "doc_id", "text", col("lang") === "en")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(2L) == ((2L, 1L, 0L, 0L)))
    assert(got(1L)._4 == 1000000L) // the only 'a'-bigram in the model
  }
}
