package graft

import graft.ops.Collocations
import org.scalatest.funsuite.AnyFunSuite

class CollocationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c"), (2L, "a b"), (3L, "a c"), (4L, "d")).toDF("doc_id", "text")

  test("lift from integer sufficient statistics") {
    val got = Collocations.collocations(docs, "doc_id", "text",
        maxDf = 1000L, minPairCount = 2L)
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c")))
    assert(got(("a", "b")) == (("a", "b", 2L, 3L, 2L, 4L, 2.0 * 4 / (3 * 2))))
    assert(got(("a", "c")) == (("a", "c", 2L, 3L, 2L, 4L, 2.0 * 4 / (3 * 2))))
  }

  test("hot tokens above maxDf are excluded before pairing") {
    val got = Collocations.collocations(docs, "doc_id", "text",
        maxDf = 2L, minPairCount = 1L)
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._7).toMap
    assert(got == Map(("b", "c") -> 1.0)) // 1*4/(2*2); all 'a' pairs gone
  }

  test("duplicate tokens in one document count once") {
    val rep = Seq((1L, "x x y"), (2L, "x y")).toDF("doc_id", "text")
    val got = Collocations.collocations(rep, "doc_id", "text",
        maxDf = 10L, minPairCount = 1L)
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
    assert(got.length == 1 && got.head._3 == 2L && got.head._4 == 2L)
  }
}
